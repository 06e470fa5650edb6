"""Randomized model-based test of the snapshot table layer.

A seeded random sequence of table operations (append / overwrite /
MOR merge / row-level delete / compact / partition-spec evolution /
branch write / fast-forward publish) runs against BOTH the real
`SnapshotTable` and a trivial pure-Python model of the expected row
multiset. After every operation the real `scan()` must equal the model;
at the end, time travel must reproduce each recorded intermediate state,
and expiration must not disturb the current state.

This is the state-machine complement to the example-based tests: it
exercises operation INTERLEAVINGS (merge after overwrite after branch
write after spec evolution ...) no hand-written test enumerates.
"""

from __future__ import annotations

import random
import time

from emr_apache_iceberg_workshop_spark.tables import SnapshotTable

DDL = "id bigint, v string, part string"


def _rows(rng, n, id_hi=30):
    return [
        (rng.randrange(id_hi), rng.choice("abcde"), rng.choice(["x", "y", "z"]))
        for _ in range(n)
    ]


def _multiset(rows):
    return sorted(tuple(r) for r in rows)


def _scan_rows(df):
    # POSITIONAL extraction: column renames interleave into the sequence,
    # so historical reads may surface the v-column under either name —
    # field order is stable (renames preserve it), names are not
    return _multiset(tuple(r)[:3] for r in df.collect())


def _dsv2_rows(spark, root, **options):
    from emr_apache_iceberg_workshop_spark.sources import dsv2

    dsv2.register(spark)
    r = spark.read.format(dsv2.FORMAT_NAME).option("table", root)
    for k, v in options.items():
        r = r.option(k.replace("_", "-"), str(v))
    return _scan_rows(r.load())


def _run_model(spark, tmp_path, seed: int, steps: int = 18):
    rng = random.Random(seed)
    t = SnapshotTable.create(
        spark,
        str(tmp_path / f"m{seed}"),
        DDL,
        partition_by=["part"],
        properties={"write.merge.mode": "merge-on-read"},
    )
    vname = "v"  # current name of the middle column (renames toggle it)
    df = lambda rows: spark.createDataFrame(  # noqa: E731
        rows, f"id bigint, {vname} string, part string"
    )

    main: list[tuple] = []
    branch: list[tuple] | None = None  # state of branch "b" when it exists
    branch_commits: list[tuple[int, list[tuple]]] = []  # (sid, rows) staged on b
    states: dict[int, list[tuple]] = {}  # main-lineage sid -> expected rows

    def commit_main(sid):
        states[sid] = list(main)

    for _step in range(steps):
        op = rng.choice(
            ["append", "append", "merge", "overwrite", "delete", "compact",
             "evolve", "branch_write", "publish", "update", "maintain",
             "cherry", "posdelete", "expire_age", "rename", "rename"]
        )
        if op == "append":
            rows = _rows(rng, rng.randrange(1, 5))
            main = main + rows
            if rng.random() < 0.4:
                # route through the DSv2 format writer: pyarrow staging +
                # the shared commit_staged protocol, interleaved with
                # native ops — the two write paths must be committed-state
                # indistinguishable
                from emr_apache_iceberg_workshop_spark.sources import dsv2

                dsv2.register(spark)
                df(rows).write.format(dsv2.FORMAT_NAME).mode("append").option(
                    "table", t.root
                ).save()
                commit_main(t.latest_snapshot_id())
            else:
                commit_main(t.write(df(rows)))
        elif op == "overwrite":
            rows = _rows(rng, rng.randrange(1, 4))
            main = list(rows)
            commit_main(t.write(df(rows), mode="overwrite"))
        elif op == "merge":
            # unique ids per batch (MERGE cardinality rule)
            batch = {r[0]: r for r in _rows(rng, rng.randrange(1, 5))}
            rows = list(batch.values())
            main = [r for r in main if r[0] not in batch] + rows
            commit_main(t.merge(df(rows), keys=["id"]))
        elif op == "delete":
            lo = rng.randrange(0, 30)
            main = [r for r in main if not (lo <= r[0] < lo + 6)]
            commit_main(t.delete_where(f"id >= {lo} AND id < {lo + 6}"))
        elif op == "compact":
            # alternate plain squash and range-clustered (sorted) rewrite
            if rng.random() < 0.5:
                commit_main(t.compact(target_partitions=2))
            else:
                commit_main(t.compact(target_partitions=2, sort_by=["id"]))
        elif op == "update":
            lo = rng.randrange(0, 30)
            main = [
                (i, "z", p) if lo <= i < lo + 4 else (i, v, p)
                for (i, v, p) in main
            ]
            sid = t.update_where(f"id >= {lo} AND id < {lo + 4}", {vname: "'z'"})
            if sid is not None:
                commit_main(sid)
        elif op == "maintain":
            # logical no-op: targeted small-file compaction (or nothing)
            sid = t.maintain(max_files_per_partition=2)
            if sid is not None:
                commit_main(sid)
        elif op == "posdelete":
            # positional MOR delete (v2 style): flip the write properties
            # for one statement, restore after — property changes are
            # metadata-only versioning, no snapshot
            lo = rng.randrange(0, 30)
            t.set_properties(
                {"write.delete.mode": "merge-on-read",
                 "write.delete.style": "position"}
            )
            main = [r for r in main if not (lo <= r[0] < lo + 4)]
            commit_main(t.delete_where(f"id >= {lo} AND id < {lo + 4}"))
            t.set_properties(
                {"write.delete.mode": "copy-on-write",
                 "write.delete.style": "equality"}
            )
        elif op == "expire_age":
            # timestamp retention mid-sequence: a cutoff in the past is a
            # no-op, one in the future expires all but keep_last +
            # protected refs; the CURRENT state must never change
            cutoff = time.time() + (1.0 if rng.random() < 0.5 else -3600.0)
            t.expire_snapshots(keep_last=3, older_than=cutoff)
        elif op == "rename":
            # toggle the v column between "v" and "vv": a METADATA-ONLY
            # commit; every subsequent scan (native AND dsv2 — whose
            # per-dir historical-name translation is the subtlest reader
            # path, sources/dsv2.py) must read old dirs under old names.
            # Refused when v is currently a partition source (a prior
            # evolve put it in the spec) — refusal changes nothing.
            other = "vv" if vname == "v" else "v"
            try:
                sid = t.rename_column(vname, other)
            except ValueError:
                pass
            else:
                vname = other
                commit_main(sid)
        elif op == "evolve":
            commit_main(t.evolve_partition_spec(rng.choice([["part"], [vname]])))
        elif op == "branch_write":
            rows = _rows(rng, rng.randrange(1, 4))
            if branch is None:
                branch = list(main)  # auto-created from main
            bsid = t.write(df(rows), branch="b")
            branch += rows
            branch_commits.append((bsid, rows))
        elif op == "publish":
            if branch is None:
                continue
            try:
                t.fast_forward("b")
            except ValueError:
                continue  # diverged — refusal is the correct behavior
            # publish succeeded: branch state IS the new main state, and
            # the publish commit belongs to the main lineage now
            main = list(branch)
            branch_commits = []  # everything staged is now on main
            states[t.latest_snapshot_id()] = list(main)
        elif op == "cherry":
            # re-apply the oldest staged append onto main; the table may
            # refuse (already applied, or newer MOR delete files would
            # retroactively hit the incoming rows) — refusal means no
            # state change, which the post-op scan assert still checks
            if not branch_commits:
                continue
            sid_staged, rows = branch_commits[0]
            try:
                picked = t.cherry_pick_snapshot(sid_staged)
            except ValueError:
                continue
            main = main + rows
            branch_commits.pop(0)
            states[picked] = list(main)

        assert _scan_rows(t.scan()) == _multiset(main), f"seed={seed} after {op}"
        if branch is not None:
            assert _scan_rows(t.scan(branch="b")) == _multiset(branch)
        if _step % 3 == 0:
            # the INDEPENDENT pyarrow read path must agree with the model
            # at arbitrary interleaved states (MOR deletes, exclusions,
            # spec evolution, branch forks) — cross-implementation fuzz
            # of the format itself, not just of one reader
            assert _dsv2_rows(spark, t.root) == _multiset(main), (
                f"seed={seed} dsv2 after {op}"
            )
            if branch is not None:
                assert _dsv2_rows(spark, t.root, branch="b") == _multiset(branch)
        if _step % 5 == 0:
            # manifest-consistency invariant: the non-tombstone entries of
            # `.entries` are exactly the live data files of `.files`
            ent = {
                r.file_path
                for r in t.entries_table().collect()
                if r.status != 2 and r.content == 0
            }
            files = {
                r.file_path for r in t.files_table().collect() if r.content == 0
            }
            assert ent == files, f"seed={seed} entries/files diverge after {op}"

    # time travel reproduces every recorded main-lineage state that is
    # still on the current lineage (overwrite/publish may have forked)
    meta = t._load()
    lineage = {s["snapshot_id"] for s in t._lineage(meta, t.latest_snapshot_id())}
    checked = 0
    for sid in sorted(set(states) & lineage):
        assert _scan_rows(t.scan_at(sid)) == _multiset(states[sid]), (
            f"seed={seed} time travel to {sid}"
        )
        # the format reader's VERSION AS OF must replay the same history
        assert _dsv2_rows(spark, t.root, snapshot_id=sid) == _multiset(
            states[sid]
        ), f"seed={seed} dsv2 time travel to {sid}"
        checked += 1
    # a mid-sequence aggressive expire_age may have trimmed history to
    # keep_last; at least the head must still replay
    assert checked >= 1  # the walk actually exercised history

    # READ-PATH UNIFICATION parity: with spark.eiws.scan.via-format set,
    # the library entry points (scan / scan_at — and therefore every
    # SqlCatalog name read) route through the registered `eiws` Python
    # DataSource; the fuzz's final state and a historical state must be
    # identical through both implementations, and the routed plan must
    # genuinely be the Python data source (not silently the native scan)
    spark.conf.set(SnapshotTable.VIA_FORMAT_CONF, "true")
    try:
        routed = t.scan()
        assert "BatchScan eiws" in routed._jdf.queryExecution().executedPlan().toString(), (
            "via-format flag did not route through the Python data source"
        )
        assert _scan_rows(routed) == _multiset(main), f"seed={seed} format scan"
        for sid in sorted(set(states) & lineage)[-2:]:
            assert _scan_rows(t.scan_at(sid)) == _multiset(states[sid]), (
                f"seed={seed} format time travel to {sid}"
            )
    finally:
        spark.conf.unset(SnapshotTable.VIA_FORMAT_CONF)

    # expiration keeps the current state intact
    t.expire_snapshots(keep_last=2)
    assert _scan_rows(t.scan()) == _multiset(main)


def test_random_op_sequences_match_model(spark, tmp_path):
    for seed in (7, 23, 41, 104):
        _run_model(spark, tmp_path, seed)
