"""Snapshot-table metadata queries (Iceberg `.history` / `.snapshots` /
`.files` analogues — reference `bronze-silver.py:116-138` queries
`.history`; `.snapshots` and `.files` are the next metadata tables an
Iceberg user reaches for).

The queries run against DETERMINISTIC fixture tables (fixed rows,
injected commit clocks) rebuilt from literals on first use per process:
- `fixtures/tablemeta_demo` — append → append → merge-on-read merge with
  an update + insert + delete, plus an `audit` tag (metadata tables,
  time travel, changelog, refs);
- `fixtures/iceberg_demo` — append-only partitioned table with native
  Iceberg v1 metadata emitted (the external-reader chain query);
- `fixtures/iceberg_v2_demo` — merge-on-read state (equality +
  positional delete files, uncompacted) with format-version-2 metadata
  emitted (delete manifests + sequence numbers);
- `fixtures/bucket_demo` — bucket(4, id)-partitioned table with native
  bucket[N] metadata emitted (Iceberg-parity bucket hash);
- `fixtures/dml_demo` — append → row-level DELETE → row-level UPDATE
  (copy-on-write partition-scoped DML);
- `fixtures/wap_demo` — write-audit-publish frozen mid-flight (staged
  `audit` branch, unpublished);
- `fixtures/spec_demo` — partition-spec evolution with live mixed
  layouts (+ multi-spec native metadata emission);
- `fixtures/rename_demo` — column rename mid-history with native
  metadata + the Iceberg name-mapping property;
- `fixtures/expire_age_demo` — timestamp-based snapshot expiry;
- `fixtures/bucket_demo` / `fixtures/iceberg_v2_demo` — see above;
- `fixtures/rollback_demo` — rollback past a retained snapshot + fork.
The DuckDB oracle reads the SAME `_meta.json` the engine commits — the
cross-engine-agreement idea the reference applies to table data
(`read_iceberg_duckdb.py:22-44`), applied to table METADATA.
Oracle-checked columns avoid file counts/bytes (file splits vary with
write parallelism); per-partition/snapshot ROW totals are
layout-independent.
"""

from __future__ import annotations

import itertools
import os
import shutil

from pyspark.sql import DataFrame, functions as F

from .registry import query

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
DEMO_ROOT = os.path.join(_REPO_ROOT, "fixtures", "tablemeta_demo")
_DEMO_META = os.path.join(DEMO_ROOT, "_meta.json")

_validated_this_process = False


def _fixture_valid() -> bool:
    """True when the committed fixture on disk is the expected 3-commit
    table (append, append, MOR merge). The build is deterministic, so a
    valid fixture is byte-for-byte equivalent to a rebuild — reusing it
    saves ~20 s of write-committer overhead per process (bench/driver)."""
    import json

    try:
        with open(_DEMO_META) as f:
            doc = json.load(f)
        snaps = doc["snapshots"]
        return (
            [s["snapshot_id"] for s in snaps] == [1, 2, 3]
            and any(s.get("delete_file") for s in snaps)
            and doc.get("tags") == {"audit": 2}
            # manifest paths must exist on disk: a drifted fixture (meta
            # from one build, data dirs from another) reads fine through
            # the dir-level Spark scan but breaks every manifest consumer
            # (.files, iceberg emission, the dsv2 file-level reader)
            and all(
                os.path.exists(os.path.join(DEMO_ROOT, f["path"]))
                for s in snaps
                for f in s.get("files", [])
            )
        )
    except Exception:
        return False


def _demo_table(spark):
    """Reuse (or build, deterministically) the metadata demo table:
    epoch clock fixed at 2023-11-14T22:14+ (60 s per commit), literal rows,
    merge-on-read merge so the manifest contains an equality-delete file."""
    global _validated_this_process
    from ..tables import SnapshotTable

    if _validated_this_process or _fixture_valid():
        _validated_this_process = True
        return SnapshotTable(spark, DEMO_ROOT)
    shutil.rmtree(DEMO_ROOT, ignore_errors=True)
    counter = itertools.count()
    t = SnapshotTable.create(
        spark,
        DEMO_ROOT,
        "id bigint, category string, qty bigint",
        partition_by=["category"],
        properties={"write.merge.mode": "merge-on-read"},
        clock=lambda: 1_700_000_000.0 + 60.0 * next(counter),
    )
    rows1 = [(1, "a", 10), (2, "a", 20), (3, "b", 30), (4, "b", 40), (5, "c", 50), (6, "c", 60)]
    rows2 = [(7, "a", 70), (8, "b", 80), (9, "c", 90)]
    ddl = "id bigint, category string, qty bigint"
    t.write(spark.createDataFrame(rows1, ddl).coalesce(1).sortWithinPartitions("id"))
    t.write(spark.createDataFrame(rows2, ddl).coalesce(1).sortWithinPartitions("id"))
    src = spark.createDataFrame(
        [("U", 2, "a", 21), ("I", 10, "d", 100), ("D", 5, "c", None)],
        "Op string, id bigint, category string, qty bigint",
    ).coalesce(1).sortWithinPartitions("id")
    t.merge(src, keys=["id"], op_col="Op")
    t.create_tag("audit", 2)  # named ref for .refs + tag-resolved time travel
    _validated_this_process = True
    return t


# --------------------------------------------------------------------------
@query(
    "q_meta_snapshots",
    oracle=f"""
    WITH m AS (SELECT snapshots FROM read_json_auto('{_DEMO_META}')),
         s AS (SELECT unnest(snapshots) AS snap FROM m)
    SELECT snap.snapshot_id AS snapshot_id,
           CAST(snap.made_current_at AS DOUBLE) AS committed_at_sec,
           lag(snap.snapshot_id) OVER (ORDER BY snap.snapshot_id) AS parent_id,
           snap.operation AS operation,
           CAST(coalesce(list_sum(list_transform(snap.files, f -> f."rows")), 0)
                AS BIGINT) AS added_rows
    FROM s
    """,
    tags=("meta:snapshots", "tablemeta"),
)
def q_meta_snapshots(spark, sf_dir) -> DataFrame:
    """`.snapshots` over the demo table; the oracle derives the same rows
    from the committed _meta.json (cross-engine metadata agreement)."""
    t = _demo_table(spark)
    return t.snapshots_table().select(
        "snapshot_id",
        F.col("committed_at").cast("double").alias("committed_at_sec"),
        "parent_id",
        "operation",
        "added_rows",
    )


@query(
    "q_meta_files",
    oracle=f"""
    WITH m AS (SELECT snapshots FROM read_json_auto('{_DEMO_META}')),
         s AS (SELECT unnest(snapshots) AS snap FROM m),
         f0 AS (SELECT snap.snapshot_id AS snapshot_id, unnest(snap.files) AS fl FROM s),
         f2 AS (SELECT snap.snapshot_id AS snapshot_id,
                       unnest(snap.delete_file_stats) AS fl FROM s),
         allf AS (
           SELECT snapshot_id, 0 AS content,
                  coalesce('category=' || fl."partition".category, '') AS part,
                  fl."rows" AS r
           FROM f0
           UNION ALL
           SELECT snapshot_id, 2 AS content, '' AS part, fl."rows" AS r FROM f2)
    SELECT snapshot_id, content, part, CAST(SUM(r) AS BIGINT) AS n_rows
    FROM allf GROUP BY snapshot_id, content, part
    """,
    tags=("meta:files", "tablemeta"),
)
def q_meta_files(spark, sf_dir) -> DataFrame:
    """`.all_files` over the demo table, aggregated per (snapshot,
    content-type, partition): data files (content=0) and the MOR
    equality-delete file (content=2). Row totals only — file split counts
    depend on write parallelism and are covered by pytest instead."""
    t = _demo_table(spark)
    return (
        t.all_files_table()
        .groupBy("snapshot_id", "content", "part")
        .agg(F.sum("record_count").alias("n_rows"))
    )


@query(
    "q_meta_time_travel",
    # snapshot 2 predates the MOR merge: state = s1 ∪ s2 data files, no
    # masks, no deletes — the oracle reads those files directly (vanilla
    # parquet + hive partitioning), proving the time-travel read against
    # an independent reconstruction of the same snapshot.
    oracle=f"""
    SELECT id, category, qty
    FROM read_parquet(['{DEMO_ROOT}/data/s1/*/*.parquet',
                       '{DEMO_ROOT}/data/s2/*/*.parquet'],
                      hive_partitioning = true)
    """,
    tags=("meta:time-travel", "tablemeta"),
)
def q_meta_time_travel(spark, sf_dir) -> DataFrame:
    """Time-travel read (Iceberg `VERSION AS OF`): table state AS OF
    snapshot 2 — before the merge updated/deleted/inserted rows."""
    t = _demo_table(spark)
    return t.scan_at(2).select("id", "category", "qty")


@query(
    "q_meta_incremental",
    # appends in (1, 2] = exactly snapshot 2's data files
    oracle=f"""
    SELECT id, category, qty
    FROM read_parquet('{DEMO_ROOT}/data/s2/*/*.parquet', hive_partitioning = true)
    """,
    tags=("meta:incremental", "tablemeta"),
)
def q_meta_incremental(spark, sf_dir) -> DataFrame:
    """Incremental snapshot-range scan (S6, reference
    `bronze-silver.py:146-149`): rows appended in (start, end]."""
    t = _demo_table(spark)
    return t.scan_incremental(1, 2).select("id", "category", "qty")


@query(
    "q_meta_history",
    oracle=f"""
    WITH m AS (SELECT snapshots FROM read_json_auto('{_DEMO_META}')),
         s AS (SELECT unnest(snapshots) AS snap FROM m)
    SELECT snap.snapshot_id AS snapshot_id,
           CAST(snap.made_current_at AS DOUBLE) AS made_current_at_sec,
           snap.operation AS operation,
           TRUE AS is_current_ancestor
    FROM s
    """,
    tags=("meta:history", "tablemeta"),
)
def q_meta_history(spark, sf_dir) -> DataFrame:
    """`.history` (reference `bronze-silver.py:116-138`) over the demo
    table — timestamp-typed API, epoch-seconds projection for the oracle."""
    t = _demo_table(spark)
    return t.history().select(
        "snapshot_id",
        F.col("made_current_at").cast("double").alias("made_current_at_sec"),
        "operation",
        "is_current_ancestor",
    )


# --------------------------------------------------------------------------
# Maintenance fixture: the same deterministic 3-commit table, then
# `compact()` (Iceberg rewrite_data_files) and `expire_snapshots(keep=1)`
# (Iceberg expire_snapshots). End state: ONE snapshot whose data dirs are
# the compacted files; every pre-compaction dir and the MOR delete file
# are deleted from disk. Built once per process under
# `fixtures/tablemeta_maint`; reused when the committed artifact matches.
MAINT_ROOT = os.path.join(_REPO_ROOT, "fixtures", "tablemeta_maint")
_MAINT_META = os.path.join(MAINT_ROOT, "_meta.json")

_maint_validated = False


def _maint_valid() -> bool:
    import json

    try:
        with open(_MAINT_META) as f:
            snaps = json.load(f)["snapshots"]
        files = snaps[0].get("files", [])
        return (
            [s["snapshot_id"] for s in snaps] == [4]
            and snaps[0]["operation"] == "compact"
            and not os.path.exists(os.path.join(MAINT_ROOT, "data", "s1"))
            # round-4 layout: range-clustered compaction with manifest bounds
            and len(files) >= 4
            and all("bounds" in f and "id" in f["bounds"] for f in files)
        )
    except Exception:
        return False


def _maint_table(spark):
    """Build (or reuse) the post-maintenance table: append, append, MOR
    merge, compact to one file per partition, expire all but the last
    snapshot. Same injected clock/rows as the demo table so the build is
    byte-deterministic."""
    global _maint_validated
    from ..tables import SnapshotTable

    if _maint_validated or _maint_valid():
        _maint_validated = True
        return SnapshotTable(spark, MAINT_ROOT)
    shutil.rmtree(MAINT_ROOT, ignore_errors=True)
    counter = itertools.count()
    t = SnapshotTable.create(
        spark,
        MAINT_ROOT,
        "id bigint, category string, qty bigint",
        partition_by=["category"],
        properties={"write.merge.mode": "merge-on-read"},
        clock=lambda: 1_700_000_000.0 + 60.0 * next(counter),
    )
    ddl = "id bigint, category string, qty bigint"
    rows1 = [(1, "a", 10), (2, "a", 20), (3, "b", 30), (4, "b", 40), (5, "c", 50), (6, "c", 60)]
    rows2 = [(7, "a", 70), (8, "b", 80), (9, "c", 90)]
    t.write(spark.createDataFrame(rows1, ddl).coalesce(1).sortWithinPartitions("id"))
    t.write(spark.createDataFrame(rows2, ddl).coalesce(1).sortWithinPartitions("id"))
    src = spark.createDataFrame(
        [("U", 2, "a", 21), ("I", 10, "d", 100), ("D", 5, "c", None)],
        "Op string, id bigint, category string, qty bigint",
    ).coalesce(1).sortWithinPartitions("id")
    t.merge(src, keys=["id"], op_col="Op")
    # snapshot 4: MOR deletes folded into data, files RANGE-CLUSTERED on id
    # so the manifest's min/max bounds are tight (sort-order rewrite)
    t.compact(target_partitions=4, sort_by=["id"])
    t.expire_snapshots(keep_last=1)  # drops s1-s3 metadata AND their files
    _maint_validated = True
    return t


@query(
    "q_meta_compaction",
    # the compacted state must be readable by an EXTERNAL engine as plain
    # hive-partitioned parquet, with the MOR update/insert/delete already
    # folded in — the reference's interop promise (read_iceberg_duckdb.py:
    # 22-44) applied to the maintenance path.
    oracle=f"""
    SELECT id, category, qty
    FROM read_parquet('{MAINT_ROOT}/data/s4/*/*.parquet', hive_partitioning = true)
    """,
    tags=("meta:compaction", "tablemeta"),
)
def q_meta_compaction(spark, sf_dir) -> DataFrame:
    """Post-compaction scan (Iceberg `rewrite_data_files`): the engine's
    scan of the compacted table vs DuckDB reading the compacted files
    directly — proves compaction preserved the merged state (update
    applied, insert present, delete gone) and needs no delete-file logic
    to read."""
    t = _maint_table(spark)
    return t.scan().select("id", "category", "qty")


@query(
    "q_meta_expire",
    oracle=f"""
    WITH m AS (SELECT snapshots FROM read_json_auto('{_MAINT_META}')),
         s AS (SELECT unnest(snapshots) AS snap FROM m)
    SELECT snap.snapshot_id AS snapshot_id,
           CAST(snap.made_current_at AS DOUBLE) AS committed_at_sec,
           snap.operation AS operation,
           CAST(coalesce(list_sum(list_transform(snap.files, f -> f."rows")), 0)
                AS BIGINT) AS live_rows
    FROM s
    """,
    tags=("meta:expire", "tablemeta"),
)
def q_meta_expire(spark, sf_dir) -> DataFrame:
    """Snapshot expiration (Iceberg `expire_snapshots`): after keeping only
    the compaction snapshot, `.snapshots` has exactly one row and the
    expired snapshots' files are physically gone (pytest asserts the
    deletion; this query proves the surviving metadata cross-engine)."""
    t = _maint_table(spark)
    return t.snapshots_table().select(
        "snapshot_id",
        F.col("committed_at").cast("double").alias("committed_at_sec"),
        "operation",
        F.col("added_rows").alias("live_rows"),
    )


AGE_ROOT = os.path.join(_REPO_ROOT, "fixtures", "expire_age_demo")
_AGE_META = os.path.join(AGE_ROOT, "_meta.json")


def _age_table(spark):
    """Deterministic age-based-expiry fixture: 4 hourly appends (injected
    clock), then expire_snapshots(older_than = t0+1.5h, keep_last=1) —
    snapshots 1 (t0) and 2 (t0+1h) expire, 3 and 4 survive. The final
    metadata is a constant; the oracle reads it straight off disk."""
    import json as _json

    from ..tables import SnapshotTable

    try:
        with open(_AGE_META) as f:
            doc = _json.load(f)
        if [s["snapshot_id"] for s in doc["snapshots"]] == [3, 4] and set(
            doc.get("dir_manifests", {})
        ) == {"data/s1", "data/s2"}:
            # the dir_manifests check rejects fixtures built before the
            # expiry manifest-relocation fix (a stale one read fine via
            # the dir-level Spark scan but lost .files/dsv2 manifests)
            return SnapshotTable(spark, AGE_ROOT)
    except Exception:
        pass
    shutil.rmtree(AGE_ROOT, ignore_errors=True)
    counter = itertools.count()
    ddl = "id bigint, qty bigint"
    t = SnapshotTable.create(
        spark, AGE_ROOT, ddl,
        clock=lambda: 1_700_000_000.0 + 3600.0 * next(counter),
    )
    for i in range(1, 5):
        t.write(spark.createDataFrame([(i, 10 * i)], ddl).coalesce(1))
    t.expire_snapshots(keep_last=1, older_than=1_700_000_000.0 + 1.5 * 3600)
    return t


@query(
    "q_meta_expire_age",
    # the oracle reads the COMMITTED metadata: exactly snapshots 3 and 4
    # survive the timestamp cutoff (1,2 older than t0+1.5h; keep_last
    # floors 4) and the current state still holds all 4 rows
    oracle=f"""
    WITH m AS (SELECT snapshots FROM read_json_auto('{_AGE_META}')),
         s AS (SELECT unnest(snapshots) AS snap FROM m)
    SELECT snap.snapshot_id AS snapshot_id,
           CAST(snap.made_current_at AS DOUBLE) AS committed_at_sec,
           (SELECT CAST(COUNT(*) AS BIGINT)
            FROM read_parquet('{AGE_ROOT}/data/*/*.parquet')) AS live_rows
    FROM s
    """,
    tags=("meta:expire", "tablemeta", "age-retention"),
)
def q_meta_expire_age(spark, sf_dir) -> DataFrame:
    """Timestamp-based snapshot retention (Iceberg `expire_snapshots
    older_than`): after the age cutoff only the post-cutoff snapshots
    remain in `.snapshots`, and the live data files on disk are exactly
    the surviving state's."""
    t = _age_table(spark)
    live = t.scan().count()
    return t.snapshots_table().select(
        "snapshot_id",
        F.col("committed_at").cast("double").alias("committed_at_sec"),
        F.lit(live).cast("bigint").alias("live_rows"),
    )


@query(
    "q_meta_pruning",
    # correctness contract: manifest pruning must be INVISIBLE in results —
    # the pruned scan + row filter equals filtering the full compacted
    # state. The pruning EFFECT (files actually skipped thanks to the
    # range-clustered rewrite) is pinned by tests/test_tables.py.
    oracle=f"""
    SELECT id, category, qty
    FROM read_parquet('{MAINT_ROOT}/data/s4/*/*.parquet', hive_partitioning = true)
    WHERE id BETWEEN 7 AND 9
    """,
    tags=("meta:pruning", "tablemeta"),
)
def q_meta_pruning(spark, sf_dir) -> DataFrame:
    """Manifest-level file skipping (Iceberg scan planning): plan the scan
    from per-file min/max bounds recorded at write time — only files whose
    id range overlaps [7, 9] are opened — then apply the row predicate."""
    t = _maint_table(spark)
    return (
        t.scan_pruned("id", 7, 9)
        .filter(F.col("id").between(7, 9))
        .select("id", "category", "qty")
    )


@query(
    "q_meta_changes",
    # the oracle reconstructs the changelog from the committed dirs alone:
    # appends are inserts; the MOR merge's new dir is inserts and each
    # delete-file key ALIVE in the prior state (s1 ∪ s2) is a pre-image
    # delete (updates = delete + insert, so replaying the changelog
    # reproduces the table; never-existing keys emit no delete).
    oracle=f"""
    WITH s1 AS (SELECT id, category, qty, 'insert' AS _change_type, CAST(1 AS BIGINT) AS _snapshot_id
                FROM read_parquet('{DEMO_ROOT}/data/s1/*/*.parquet', hive_partitioning = true)),
         s2 AS (SELECT id, category, qty, CAST('insert' AS VARCHAR), CAST(2 AS BIGINT)
                FROM read_parquet('{DEMO_ROOT}/data/s2/*/*.parquet', hive_partitioning = true)),
         s3 AS (SELECT id, category, qty FROM
                read_parquet('{DEMO_ROOT}/data/s3/*/*.parquet', hive_partitioning = true)),
         s3i AS (SELECT id, category, qty, CAST('insert' AS VARCHAR), CAST(3 AS BIGINT) FROM s3),
         prior AS (SELECT id FROM s1 UNION SELECT id FROM s2),
         d3 AS (SELECT d.id, CAST(NULL AS VARCHAR) AS category, CAST(NULL AS BIGINT) AS qty,
                       CAST('delete' AS VARCHAR), CAST(3 AS BIGINT)
                FROM read_parquet('{DEMO_ROOT}/deletes/s3/*.parquet') d
                SEMI JOIN prior USING (id))
    SELECT * FROM s1 UNION ALL SELECT * FROM s2
    UNION ALL SELECT * FROM s3i UNION ALL SELECT * FROM d3
    """,
    tags=("meta:changes", "tablemeta", "cdc"),
)
def q_meta_changes(spark, sf_dir) -> DataFrame:
    """Changelog scan (Iceberg `.changes`): every logical change across the
    demo table's three commits — 9 inserts from the appends, the merge's
    upserts as inserts, and a pre-image delete per delete-file key that was
    alive in the prior snapshot (updates appear as delete + insert, making
    the changelog replayable; the brand-new key emits no delete)."""
    t = _demo_table(spark)
    return t.changes(None, 3)


@query(
    "q_meta_entries",
    # the DML fixture's lifecycle is deterministic, so the entry statuses
    # are a constant relation: the append's category=c file is carried
    # forward (EXISTING), the UPDATE's partition-scoped rewrite ADDED a
    # new category=b file and left a DELETED tombstone for the b file it
    # masked out; category=a died in snapshot 2 (an older commit), so its
    # tombstone has already aged out of the one-commit window.
    oracle="""
    SELECT * FROM (VALUES (CAST(0 AS INT), CAST(1 AS BIGINT), 'category=c', CAST(2 AS BIGINT)),
                          (1, 3, 'category=b', 2),
                          (2, 3, 'category=b', 2))
    AS t(status, snapshot_id, part, record_count)
    """,
    tags=("meta:entries", "tablemeta"),
)
def q_meta_entries(spark, sf_dir) -> DataFrame:
    """`.entries` over the DML fixture: per manifest entry of the current
    snapshot, the lifecycle status (1=ADDED / 0=EXISTING / 2=DELETED) plus
    the commit that did it — all from the manifest, zero data I/O."""
    t = _dml_table(spark)
    return t.entries_table().select(
        "status",
        "snapshot_id",
        F.col("partition").alias("part"),
        "record_count",
    )


@query(
    "q_meta_incr_agg",
    # the oracle is a FULL RECOMPUTE of the final state from the committed
    # raw files alone (MOR resolution: s1 ∪ s2 minus delete-file keys,
    # plus the merge's upsert dir) — fully independent of the changelog
    # path the Spark side uses, so a wrong/missing/extra change row (or a
    # broken pre-image) breaks the value hash.
    oracle=f"""
    WITH base AS (
      SELECT id, category, qty
      FROM read_parquet('{DEMO_ROOT}/data/s1/*/*.parquet', hive_partitioning = true)
      UNION ALL
      SELECT id, category, qty
      FROM read_parquet('{DEMO_ROOT}/data/s2/*/*.parquet', hive_partitioning = true)),
    dels AS (SELECT id FROM read_parquet('{DEMO_ROOT}/deletes/s3/*.parquet')),
    live AS (
      SELECT * FROM base ANTI JOIN dels USING (id)
      UNION ALL
      SELECT id, category, qty
      FROM read_parquet('{DEMO_ROOT}/data/s3/*/*.parquet', hive_partitioning = true))
    SELECT category,
           CAST(SUM(qty) AS BIGINT) AS sum_qty,
           CAST(COUNT(*) AS BIGINT) AS cnt
    FROM live GROUP BY category
    """,
    tags=("meta:incr-agg", "tablemeta", "cdc"),
)
def q_meta_incr_agg(spark, sf_dir) -> DataFrame:
    """Incremental aggregate maintenance off the changelog (the
    materialized-view refresh an Iceberg CDC consumer runs instead of a
    full recompute): seed the aggregate at snapshot 1, then fold the
    `.changes` stream of snapshots 2..3 into it — inserts add, pre-image
    deletes retract (`full_preimages=True` supplies the complete old row
    so its measure can be subtracted). At 100 TB this touches only the
    changed rows per refresh — O(delta), not O(table) — which is the
    entire point of a replayable changelog; the oracle recomputes the
    same aggregate from scratch off the raw committed files."""
    t = _demo_table(spark)
    base = t.scan_at(1).select("category", "qty", F.lit(1).alias("w"))
    delta = t.changes(1, 3, full_preimages=True).select(
        "category",
        "qty",
        F.when(F.col("_change_type") == "delete", F.lit(-1))
        .otherwise(F.lit(1))
        .alias("w"),
    )
    return (
        base.unionByName(delta)
        .groupBy("category")
        .agg(
            F.sum(F.col("qty") * F.col("w")).cast("bigint").alias("sum_qty"),
            F.sum("w").cast("bigint").alias("cnt"),
        )
        .filter(F.col("cnt") > 0)
    )


@query(
    "q_meta_partitions",
    # live data files = every data file of the 3 commits (MOR: no masks);
    # record counts are data-file totals, deletes not netted (Iceberg
    # .partitions semantics). File counts are layout-stable here because
    # the fixture writes coalesce(1) per commit.
    oracle=f"""
    WITH m AS (SELECT snapshots FROM read_json_auto('{_DEMO_META}')),
         s AS (SELECT unnest(snapshots) AS snap FROM m),
         f AS (SELECT unnest(snap.files) AS fl FROM s)
    SELECT 'category=' || fl."partition".category AS part,
           COUNT(*) AS file_count,
           CAST(SUM(fl."rows") AS BIGINT) AS record_count
    FROM f
    GROUP BY 1
    """,
    tags=("meta:partitions", "tablemeta"),
)
def q_meta_partitions(spark, sf_dir) -> DataFrame:
    """`.partitions` over the demo table: per-partition live file/record
    totals from the manifest, cross-checked against the committed
    _meta.json."""
    t = _demo_table(spark)
    return t.partitions_table().select("part", "file_count", "record_count")


# --------------------------------------------------------------------------
# Native Iceberg v1 metadata emission (S17): the fixture table's CURRENT
# snapshot is published as metadata/vN.metadata.json + Avro manifest list +
# manifest, and the QUERY consumes the table exclusively THROUGH that chain
# (metadata json → manifest list → manifest → listed parquet files). The
# oracle reads the same data by directory glob with no metadata knowledge —
# a wrong, missing, or extra file in the emitted manifests breaks the
# file-count/row/value match. This is the reference's external-read
# contract (`read_iceberg_duckdb.py:22-44,61`) made driver-checkable in a
# sandbox whose DuckDB cannot network-install the iceberg extension.

ICE_ROOT = os.path.join(_REPO_ROOT, "fixtures", "iceberg_demo")
_ice_md_path: str | None = None


def _has_summary_totals(md_path: str) -> bool:
    """True when the emission carries the standard snapshot summary
    counters (`total-records` etc.) — a fixture emitted by older code
    lacks them and must rebuild."""
    import json

    try:
        with open(md_path) as f:
            doc = json.load(f)
        return all("total-records" in s.get("summary", {}) for s in doc["snapshots"])
    except Exception:
        return False


def _iceberg_demo(spark) -> str:
    """Deterministic append-only partitioned table (2 commits, coalesce(1)
    per partition) with Iceberg metadata emitted; returns the
    vN.metadata.json path. Rebuilt per process only when absent/invalid."""
    global _ice_md_path
    from ..iceberg_meta import write_iceberg_metadata
    from ..tables import SnapshotTable

    if _ice_md_path and os.path.exists(_ice_md_path):
        return _ice_md_path
    hint = os.path.join(ICE_ROOT, "metadata", "version-hint.text")
    if os.path.exists(hint):
        with open(hint) as f:
            n = f.read().strip()
        cand = os.path.join(ICE_ROOT, "metadata", f"v{n}.metadata.json")
        if os.path.exists(cand) and _has_summary_totals(cand):
            _ice_md_path = cand
            return cand
    shutil.rmtree(ICE_ROOT, ignore_errors=True)
    counter = itertools.count()
    ddl = "id bigint, category string, qty bigint"
    t = SnapshotTable.create(
        spark,
        ICE_ROOT,
        ddl,
        partition_by=["category"],
        clock=lambda: 1_700_000_000.0 + 60.0 * next(counter),
    )
    rows1 = [(1, "a", 10), (2, "a", 20), (3, "b", 30), (4, "b", 40)]
    rows2 = [(5, "a", 50), (6, "c", 60), (7, "c", 70)]
    t.write(spark.createDataFrame(rows1, ddl).coalesce(1).sortWithinPartitions("id"))
    t.write(spark.createDataFrame(rows2, ddl).coalesce(1).sortWithinPartitions("id"))
    _ice_md_path = write_iceberg_metadata(t)
    return _ice_md_path


@query(
    "q_meta_iceberg",
    # oracle: no metadata — plain recursive glob over the data dirs; agrees
    # with the metadata-chain read only if the manifests list exactly the
    # live files with correct partitions and row counts
    oracle=f"""
    SELECT category,
           COUNT(DISTINCT filename) AS n_files,
           COUNT(*) AS n_rows,
           CAST(SUM(qty) AS BIGINT) AS qty_total
    FROM read_parquet('{ICE_ROOT}/data/*/*/*.parquet',
                      hive_partitioning = true, filename = true)
    GROUP BY category
    """,
    tags=("meta:iceberg", "tablemeta", "interop"),
)
def q_meta_iceberg(spark, sf_dir) -> DataFrame:
    """Scan the fixture table exclusively through its emitted Iceberg v1
    metadata chain and aggregate per partition (file/row/value totals)."""
    from ..iceberg_meta import read_data_files

    md = _iceberg_demo(spark)
    files = read_data_files(md)
    dfs = [
        spark.read.schema("id bigint, qty bigint")
        .parquet(f["file_path"])
        .select(
            F.lit(f["partition"]["category"]).alias("category"),
            F.lit(f["file_path"]).alias("fpath"),
            "qty",
        )
        for f in files
    ]
    u = dfs[0]
    for d in dfs[1:]:
        u = u.unionByName(d)
    return u.groupBy("category").agg(
        F.countDistinct("fpath").alias("n_files"),
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("qty").cast("bigint").alias("qty_total"),
    )


# --------------------------------------------------------------------------
# Format-version-2 emission for a MERGE-ON-READ state (the reference's
# silver table shape: MOR config at `bronze-silver.py:184-189`, read
# externally in that state at `read_iceberg_duckdb.py:61`). The fixture is
# frozen mid-MOR — an equality-delete file from a CDC-style merge AND a
# positional delete file, neither compacted — and the QUERY reconstructs
# the table exclusively from the emitted v2 chain: metadata.json →
# manifest lists → data + delete manifests → parquet files, applying
# equality deletes to strictly-smaller sequence numbers and positional
# deletes by (file_path, pos), exactly as the Iceberg spec prescribes. The
# oracle is the literal expected post-delete state: any error in sequence
# numbers, delete-file references, equality_ids, partition values, or the
# conforming positional-delete emission breaks the match.

V2_ROOT = os.path.join(_REPO_ROOT, "fixtures", "iceberg_v2_demo")
_v2_md_path: str | None = None


def _v2_demo(spark) -> str:
    """Deterministic MOR fixture: append 6 rows (3 category partitions) →
    MOR merge (update id 2, insert id 7, CDC-delete id 3 → equality-delete
    file) → positional delete of qty >= 60 (ids 6 and 7, spanning both
    data dirs). Emits v2 metadata; returns the vN.metadata.json path."""
    global _v2_md_path
    from ..iceberg_meta import write_iceberg_metadata
    from ..tables import SnapshotTable

    if _v2_md_path and os.path.exists(_v2_md_path):
        return _v2_md_path
    hint = os.path.join(V2_ROOT, "metadata", "version-hint.text")
    if os.path.exists(hint):
        with open(hint) as f:
            n = f.read().strip()
        cand = os.path.join(V2_ROOT, "metadata", f"v{n}.metadata.json")
        if os.path.exists(cand):
            _v2_md_path = cand
            return cand
    shutil.rmtree(V2_ROOT, ignore_errors=True)
    counter = itertools.count()
    ddl = "id bigint, category string, qty bigint"
    t = SnapshotTable.create(
        spark,
        V2_ROOT,
        ddl,
        partition_by=["category"],
        properties={"write.merge.mode": "merge-on-read"},
        clock=lambda: 1_700_000_000.0 + 60.0 * next(counter),
    )
    rows1 = [(1, "a", 10), (2, "a", 20), (3, "b", 30), (4, "b", 40), (5, "c", 50), (6, "c", 60)]
    t.write(spark.createDataFrame(rows1, ddl).coalesce(1).sortWithinPartitions("id"))
    src = spark.createDataFrame(
        [(2, "a", 25, "U"), (7, "c", 70, "I"), (3, "b", 30, "D")],
        ddl + ", op string",
    ).coalesce(1).sortWithinPartitions("id")
    t.merge(src, keys=["id"], op_col="op", delete_value="D")
    t.set_properties(
        {"write.delete.mode": "merge-on-read", "write.delete.style": "position"}
    )
    t.delete_where("qty >= 60")
    _v2_md_path = write_iceberg_metadata(t)
    return _v2_md_path


@query(
    "q_meta_iceberg_v2",
    # literal expected state after: append 1..6 → MOR upsert(2→25, +7) +
    # equality-delete {2,3,7} on the older files → positional delete of
    # qty>=60 (ids 6, 7)
    oracle="""
    SELECT * FROM (VALUES
      (CAST(1 AS BIGINT), 'a', CAST(10 AS BIGINT)),
      (CAST(2 AS BIGINT), 'a', CAST(25 AS BIGINT)),
      (CAST(4 AS BIGINT), 'b', CAST(40 AS BIGINT)),
      (CAST(5 AS BIGINT), 'c', CAST(50 AS BIGINT))
    ) AS t(id, category, qty)
    """,
    tags=("meta:iceberg", "tablemeta", "interop", "mor", "v2"),
)
def q_meta_iceberg_v2(spark, sf_dir) -> DataFrame:
    """External v2 reader simulation: reconstruct the MOR table state
    EXCLUSIVELY from the emitted format-version-2 metadata chain — no
    engine scan(), no _meta.json — applying delete files per the Iceberg
    spec's sequence-number rules."""
    from ..iceberg_meta import read_table_chain

    md = _v2_demo(spark)
    chain = read_table_chain(md)
    name_of = {f["id"]: f["name"] for f in chain["schema"]["fields"]}
    legs = []
    for e in chain["data"]:
        df_ = e["data_file"]
        legs.append(
            spark.read.schema("id bigint, qty bigint")
            .parquet(df_["file_path"])
            .select(
                "id",
                F.lit(df_["partition"]["category"]).alias("category"),
                "qty",
                F.lit(int(e["sequence_number"])).cast("long").alias("__seq"),
                F.lit(df_["file_path"]).alias("__path"),
                F.col("_metadata.row_index").alias("__pos"),
            )
        )
    data = legs[0]
    for d in legs[1:]:
        data = data.unionByName(d)
    # positional deletes: bind by (file_path, pos)
    for de in chain["deletes"]:
        if de["content"] != 1:
            continue
        pairs = spark.read.parquet(de["data_file"]["file_path"]).select(
            F.col("file_path").alias("__del_path"), F.col("pos").alias("__del_pos")
        )
        data = data.join(
            pairs,
            (F.col("__path") == F.col("__del_path"))
            & (F.col("__pos") == F.col("__del_pos")),
            "left_anti",
        )
    # equality deletes: key match, strictly smaller data sequence number
    for de in chain["deletes"]:
        if de["content"] != 2:
            continue
        keys = [name_of[i] for i in de["equality_ids"]]
        dels = spark.read.parquet(de["data_file"]["file_path"]).select(
            *[F.col(k).alias(f"__del_{k}") for k in keys]
        )
        cond = F.lit(int(de["sequence_number"])) > F.col("__seq")
        for k in keys:
            cond = cond & (F.col(k) == F.col(f"__del_{k}"))
        data = data.join(dels, cond, "left_anti")
    return data.select("id", "category", "qty")


@query(
    "q_meta_v2_travel",
    # literal state at the MOR-merge snapshot (sequence 2): append 1..6,
    # upsert 2→25, insert 7, equality-delete {2,3,7} over seq-1 files —
    # the positional delete (sequence 3) must NOT apply yet
    oracle="""
    SELECT * FROM (VALUES
      (CAST(1 AS BIGINT), 'a', CAST(10 AS BIGINT)),
      (CAST(2 AS BIGINT), 'a', CAST(25 AS BIGINT)),
      (CAST(4 AS BIGINT), 'b', CAST(40 AS BIGINT)),
      (CAST(5 AS BIGINT), 'c', CAST(50 AS BIGINT)),
      (CAST(6 AS BIGINT), 'c', CAST(60 AS BIGINT)),
      (CAST(7 AS BIGINT), 'c', CAST(70 AS BIGINT))
    ) AS t(id, category, qty)
    """,
    tags=("meta:iceberg", "tablemeta", "interop", "mor", "v2", "time-travel"),
)
def q_meta_v2_travel(spark, sf_dir) -> DataFrame:
    """External FOR VERSION AS OF through the v2 chain: reconstruct the
    MID-HISTORY MOR snapshot (the merge commit) from its own manifest
    list — its equality delete applies, the LATER positional delete does
    not exist there. Proves per-snapshot v2 chains are independently
    correct, not just the head's."""
    from ..iceberg_meta import read_table_chain

    md = _v2_demo(spark)
    chain = read_table_chain(md, snapshot_id=2)
    name_of = {f["id"]: f["name"] for f in chain["schema"]["fields"]}
    legs = []
    for e in chain["data"]:
        df_ = e["data_file"]
        legs.append(
            spark.read.schema("id bigint, qty bigint")
            .parquet(df_["file_path"])
            .select(
                "id",
                F.lit(df_["partition"]["category"]).alias("category"),
                "qty",
                F.lit(int(e["sequence_number"])).cast("long").alias("__seq"),
            )
        )
    data = legs[0]
    for d in legs[1:]:
        data = data.unionByName(d)
    assert all(de["content"] == 2 for de in chain["deletes"]), (
        "the positional delete belongs to snapshot 3, not 2"
    )
    for de in chain["deletes"]:
        keys = [name_of[i] for i in de["equality_ids"]]
        dels = spark.read.parquet(de["data_file"]["file_path"]).select(
            *[F.col(k).alias(f"__del_{k}") for k in keys]
        )
        cond = F.lit(int(de["sequence_number"])) > F.col("__seq")
        for k in keys:
            cond = cond & (F.col(k) == F.col(f"__del_{k}"))
        data = data.join(dels, cond, "left_anti")
    return data.select("id", "category", "qty")


# --------------------------------------------------------------------------
# Native metadata emission for a BUCKET-partitioned table: the spec is
# declared as Iceberg's `bucket[N]` (legal now that the write-path bucket
# hash is the spec's seed-0 murmur3 — partitioning.murmur3_32, pinned to
# the published Appendix-B vectors in tests), and the query consumes the
# table exclusively through the emitted chain. The oracle is the literal
# per-bucket expectation computed from the spec-pinned hash: if the
# engine's vectorized write-path hash, the directory layout, or the
# manifest partition values disagree with the Iceberg bucket function,
# the per-bucket totals break.

BUCKET_ROOT = os.path.join(_REPO_ROOT, "fixtures", "bucket_demo")
_bucket_md_path: str | None = None


def _bucket_demo(spark) -> str:
    """Deterministic bucket(4, id)-partitioned table, 2 append commits
    (ids 1-6, then 7-10; qty = 10*id), native Iceberg metadata emitted;
    returns the vN.metadata.json path."""
    global _bucket_md_path
    from ..iceberg_meta import write_iceberg_metadata
    from ..tables import SnapshotTable

    if _bucket_md_path and os.path.exists(_bucket_md_path):
        return _bucket_md_path
    hint = os.path.join(BUCKET_ROOT, "metadata", "version-hint.text")
    if os.path.exists(hint):
        with open(hint) as f:
            n = f.read().strip()
        cand = os.path.join(BUCKET_ROOT, "metadata", f"v{n}.metadata.json")
        if os.path.exists(cand):
            _bucket_md_path = cand
            return cand
    shutil.rmtree(BUCKET_ROOT, ignore_errors=True)
    counter = itertools.count()
    ddl = "id bigint, qty bigint"
    t = SnapshotTable.create(
        spark,
        BUCKET_ROOT,
        ddl,
        partition_by=["bucket(4, id)"],
        clock=lambda: 1_700_000_000.0 + 60.0 * next(counter),
    )
    t.write(
        spark.createDataFrame([(i, 10 * i) for i in range(1, 7)], ddl)
        .coalesce(1).sortWithinPartitions("id")
    )
    t.write(
        spark.createDataFrame([(i, 10 * i) for i in range(7, 11)], ddl)
        .coalesce(1).sortWithinPartitions("id")
    )
    _bucket_md_path = write_iceberg_metadata(t)
    return _bucket_md_path


@query(
    "q_meta_bucket",
    # literal expectation: iceberg_bucket(id, 4) over ids 1..10 —
    # {0: [1,2,10], 1: [6], 2: [4], 3: [3,5,7,8,9]} per the spec's
    # seed-0 murmur3 of the 8-byte little-endian long (Appendix B)
    oracle="""
    SELECT * FROM (VALUES
      (0, CAST(3 AS BIGINT), CAST(13 AS BIGINT), CAST(130 AS BIGINT)),
      (1, CAST(1 AS BIGINT), CAST(6  AS BIGINT), CAST(60  AS BIGINT)),
      (2, CAST(1 AS BIGINT), CAST(4  AS BIGINT), CAST(40  AS BIGINT)),
      (3, CAST(5 AS BIGINT), CAST(32 AS BIGINT), CAST(320 AS BIGINT))
    ) AS t(bucket, n_rows, id_total, qty_total)
    """,
    tags=("meta:iceberg", "tablemeta", "interop", "bucket"),
)
def q_meta_bucket(spark, sf_dir) -> DataFrame:
    """Scan the bucket-partitioned fixture exclusively through its
    emitted Iceberg metadata chain (manifest partition values carry the
    bucket numbers) and aggregate per bucket."""
    from ..iceberg_meta import read_data_files

    md = _bucket_demo(spark)
    files = read_data_files(md)
    dfs = [
        spark.read.schema("id bigint, qty bigint")
        .parquet(f["file_path"])
        .select(
            F.lit(int(f["partition"]["id_bucket"])).cast("int").alias("bucket"),
            "id",
            "qty",
        )
        for f in files
    ]
    u = dfs[0]
    for d in dfs[1:]:
        u = u.unionByName(d)
    return u.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("id").cast("bigint").alias("id_total"),
        F.sum("qty").cast("bigint").alias("qty_total"),
    )


@query(
    "q_meta_bounds",
    # literal expectation over the bucket_demo layout (coalesce(1) per
    # bucket per commit → 6 files with id bounds [1,2],[6],[4],[3,5],
    # [10],[7,9]): predicate 3<=id<=5 overlaps exactly 2 files; ids
    # 3,4,5 sum to qty 120. A too-narrow emitted bound would drop a
    # matching file and break n/qty; a too-wide one breaks files_kept.
    oracle="""
    SELECT CAST(6 AS INT) AS files_total, CAST(2 AS INT) AS files_kept,
           CAST(3 AS BIGINT) AS n, CAST(120 AS BIGINT) AS qty_total
    """,
    tags=("meta:iceberg", "tablemeta", "interop", "bounds"),
)
def q_meta_bounds(spark, sf_dir) -> DataFrame:
    """External file pruning off the EMITTED manifest bounds: decode each
    data file's lower/upper bound for the `id` field (Iceberg
    single-value serialization), skip files the predicate cannot match,
    and aggregate only the kept files — the manifest-only planning an
    external engine does before opening any file."""
    import struct as _struct

    from ..iceberg_meta import read_table_chain

    md = _bucket_demo(spark)
    chain = read_table_chain(md)
    id_fid = next(
        f["id"] for f in chain["schema"]["fields"] if f["name"] == "id"
    )
    lo, hi = 3, 5
    kept = []
    for e in chain["data"]:
        df_ = e["data_file"]
        lb = {m["key"]: m["value"] for m in df_["lower_bounds"] or []}
        ub = {m["key"]: m["value"] for m in df_["upper_bounds"] or []}
        flo = _struct.unpack("<q", lb[id_fid])[0]
        fhi = _struct.unpack("<q", ub[id_fid])[0]
        if fhi < lo or flo > hi:
            continue
        kept.append(df_["file_path"])
    dfs = [
        spark.read.schema("id bigint, qty bigint").parquet(p) for p in kept
    ]
    u = dfs[0]
    for d in dfs[1:]:
        u = u.unionByName(d)
    return (
        u.filter(F.col("id").between(lo, hi))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum("qty").cast("bigint").alias("qty_total"),
        )
        .select(
            F.lit(len(chain["data"])).cast("int").alias("files_total"),
            F.lit(len(kept)).cast("int").alias("files_kept"),
            "n",
            "qty_total",
        )
    )


@query(
    "q_meta_refs",
    # oracle: the main branch is the max committed snapshot id; tags come
    # straight from the committed _meta.json
    oracle=f"""
    WITH m AS (SELECT snapshots, tags FROM read_json_auto('{_DEMO_META}')),
         mx AS (SELECT list_max(list_transform(snapshots, s -> s.snapshot_id)) AS cur,
                       tags FROM m)
    SELECT 'main' AS ref_name, 'branch' AS ref_type, CAST(cur AS BIGINT) AS snapshot_id
    FROM mx
    UNION ALL
    SELECT 'audit', 'tag', CAST(tags.audit AS BIGINT) FROM mx
    """,
    tags=("meta:refs", "tablemeta"),
)
def q_meta_refs(spark, sf_dir) -> DataFrame:
    """`.refs` over the demo table: the main branch plus the audit tag
    (Iceberg's named-ref listing), cross-checked against _meta.json."""
    t = _demo_table(spark)
    return t.refs_table()


DML_ROOT = os.path.join(_REPO_ROOT, "fixtures", "dml_demo")


def _dml_table(spark):
    """Deterministic row-level-DML fixture: append 6 rows across 3
    partitions, DELETE WHERE qty < 25 (kills ids 1,2 in a; b,c untouched
    dirs), then UPDATE id=4 SET qty=qty*10. Final state is a literal
    constant — the oracle states it as VALUES."""
    from ..tables import SnapshotTable

    import json as _json

    try:
        with open(os.path.join(DML_ROOT, "_meta.json")) as f:
            ops = [s["operation"] for s in _json.load(f)["snapshots"]]
        if ops == ["append", "delete", "update"]:
            return SnapshotTable(spark, DML_ROOT)
    except Exception:
        pass
    shutil.rmtree(DML_ROOT, ignore_errors=True)
    counter = itertools.count()
    ddl = "id bigint, category string, qty bigint"
    t = SnapshotTable.create(
        spark, DML_ROOT, ddl, partition_by=["category"],
        clock=lambda: 1_700_000_000.0 + 60.0 * next(counter),
    )
    rows = [(1, "a", 10), (2, "a", 20), (3, "b", 30), (4, "b", 40),
            (5, "c", 50), (6, "c", 60)]
    t.write(spark.createDataFrame(rows, ddl).coalesce(1).sortWithinPartitions("id"))
    t.delete_where("qty < 25")
    t.update_where("id = 4", {"qty": "qty * 10"})
    return t


@query(
    "q_meta_dml",
    # the fixture's DML sequence is deterministic, so the expected final
    # state is a constant relation
    oracle="""
    SELECT * FROM (VALUES (CAST(3 AS BIGINT), 'b', CAST(30 AS BIGINT)),
                          (4, 'b', 400), (5, 'c', 50), (6, 'c', 60))
    AS t(id, category, qty)
    """,
    tags=("meta:dml", "tablemeta", "reference:S13"),
)
def q_meta_dml(spark, sf_dir) -> DataFrame:
    """Row-level DELETE + UPDATE executed copy-on-write partition-scoped
    (Iceberg `DELETE FROM` / `UPDATE`): the table state after the fixture's
    DML sequence must equal the constant expected relation."""
    t = _dml_table(spark)
    return t.scan().select("id", "category", "qty")


# --------------------------------------------------------------------------
WAP_ROOT = os.path.join(_REPO_ROOT, "fixtures", "wap_demo")
_WAP_META = os.path.join(WAP_ROOT, "_meta.json")


def _wap_table(spark):
    """Deterministic write-audit-publish fixture, frozen MID-FLIGHT:
    2 rows appended to main (sid 1), then 2 + 1 rows staged on an `audit`
    branch (sids 2, 3) that is NOT yet published — main still reads the
    pre-branch state. Exercises branch refs, lineage isolation, and
    per-branch scans (Iceberg `spark.wap.branch` workflow)."""
    from ..tables import SnapshotTable

    import json as _json

    try:
        with open(_WAP_META) as f:
            doc = _json.load(f)
        if doc.get("branches") == {"main": 1, "audit": 3}:
            return SnapshotTable(spark, WAP_ROOT)
    except Exception:
        pass
    shutil.rmtree(WAP_ROOT, ignore_errors=True)
    counter = itertools.count()
    ddl = "id bigint, v string"
    t = SnapshotTable.create(
        spark, WAP_ROOT, ddl, clock=lambda: 1_700_000_000.0 + 60.0 * next(counter)
    )
    mk = lambda rows: spark.createDataFrame(rows, ddl).coalesce(1)  # noqa: E731
    t.write(mk([(1, "a"), (2, "b")]))
    t.write(mk([(3, "c"), (4, "d")]), branch="audit")
    t.write(mk([(5, "e")]), branch="audit")
    return t


@query(
    "q_meta_wap",
    # oracle: branch refs come straight from the committed _meta.json;
    # the fixture's row counts are deterministic constants
    oracle=f"""
    WITH m AS (SELECT branches FROM read_json_auto('{_WAP_META}'))
    SELECT 'main' AS ref_name, CAST(m.branches.main AS BIGINT) AS snapshot_id,
           CAST(2 AS BIGINT) AS n_rows
    FROM m
    UNION ALL
    SELECT 'audit', CAST(m.branches.audit AS BIGINT), 5 FROM m
    """,
    tags=("meta:wap", "tablemeta", "branch"),
)
def q_meta_wap(spark, sf_dir) -> DataFrame:
    """Unpublished-branch isolation: `main` still counts 2 rows while the
    staged `audit` branch counts 5; ref snapshot ids cross-checked against
    the committed metadata."""
    t = _wap_table(spark)
    refs = t.refs_table().filter(F.col("ref_type") == "branch").select(
        "ref_name", "snapshot_id"
    )
    labeled = t.scan().select(F.lit("main").alias("ref_name")).unionByName(
        t.scan(branch="audit").select(F.lit("audit").alias("ref_name"))
    )
    counts = labeled.groupBy("ref_name").agg(F.count(F.lit(1)).alias("n_rows"))
    return refs.join(counts, "ref_name")


# --------------------------------------------------------------------------
CP_ROOT = os.path.join(_REPO_ROOT, "fixtures", "cherrypick_demo")
_CP_META = os.path.join(CP_ROOT, "_meta.json")


def _cp_table(spark):
    """Deterministic cherry-pick fixture: 2 rows on main (sid 1), 2 rows
    staged on an `audit` branch (sid 2), main advances independently
    (sid 3, 1 row) so fast-forward publish is impossible, then the
    staged append is cherry-picked onto the moved head (sid 4)."""
    from ..tables import SnapshotTable

    import json as _json

    try:
        with open(_CP_META) as f:
            doc = _json.load(f)
        snaps = doc["snapshots"]
        if [s["operation"] for s in snaps] == [
            "append", "append", "append", "cherrypick"
        ] and doc.get("branches", {}).get("main") == 4:
            return SnapshotTable(spark, CP_ROOT)
    except Exception:
        pass
    shutil.rmtree(CP_ROOT, ignore_errors=True)
    counter = itertools.count()
    ddl = "id bigint, v string"
    t = SnapshotTable.create(
        spark, CP_ROOT, ddl, clock=lambda: 1_700_000_000.0 + 60.0 * next(counter)
    )
    mk = lambda rows: spark.createDataFrame(rows, ddl).coalesce(1)  # noqa: E731
    t.write(mk([(1, "a"), (2, "b")]))
    staged = t.write(mk([(3, "c"), (4, "d")]), branch="audit")
    t.write(mk([(5, "e")]))  # main moves: audit is no longer fast-forwardable
    t.cherry_pick_snapshot(staged)
    return t


@query(
    "q_meta_cherrypick",
    # the fixture lifecycle is deterministic: final main state is the
    # union of both lineages' appends, the cherry-pick commit re-uses the
    # staged dir (snapshot 2's manifest) rather than rewriting it, and
    # time travel to the pre-pick head excludes the staged rows
    oracle="""
    SELECT * FROM (VALUES (CAST(1 AS BIGINT), 'a', CAST(5 AS BIGINT), CAST(3 AS BIGINT)),
                          (2, 'b', 5, 3), (3, 'c', 5, 3), (4, 'd', 5, 3), (5, 'e', 5, 3))
    AS t(id, v, n_now, n_before_pick)
    """,
    tags=("meta:cherrypick", "tablemeta", "branch"),
)
def q_meta_cherrypick(spark, sf_dir) -> DataFrame:
    """Cherry-pick publish (Iceberg `cherrypick_snapshot`): the staged
    audit append lands on a main head that moved past the staging point
    — final state is both lineages' rows, while time travel to the
    pre-pick head still excludes the staged batch (the commit added the
    staged DIR to the active set; no data was rewritten)."""
    t = _cp_table(spark)
    now = t.scan().select("id", "v")
    n_now = now.agg(F.count(F.lit(1)).cast("bigint").alias("n_now"))
    n_before = (
        t.scan_at(3)
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_before_pick"))
    )
    return now.crossJoin(F.broadcast(n_now)).crossJoin(F.broadcast(n_before))


# --------------------------------------------------------------------------
SPEC_ROOT = os.path.join(_REPO_ROOT, "fixtures", "spec_demo")
_SPEC_META = os.path.join(SPEC_ROOT, "_meta.json")


def _spec_table(spark):
    """Deterministic partition-spec-evolution fixture: 4 rows written
    under `partition_by=[part]`, spec evolved to `[category]`
    (metadata-only), 4 more rows written under the new spec — the live
    files mix two physical layouts."""
    from ..tables import SnapshotTable

    import json as _json

    try:
        with open(_SPEC_META) as f:
            doc = _json.load(f)
        ops = [s["operation"] for s in doc["snapshots"]]
        if ops == ["append", "evolve-partition", "append"]:
            return SnapshotTable(spark, SPEC_ROOT)
    except Exception:
        pass
    shutil.rmtree(SPEC_ROOT, ignore_errors=True)
    counter = itertools.count()
    ddl = "id bigint, category string, part string"
    t = SnapshotTable.create(
        spark, SPEC_ROOT, ddl, partition_by=["part"],
        clock=lambda: 1_700_000_000.0 + 60.0 * next(counter),
    )
    mk = lambda rows: spark.createDataFrame(rows, ddl).coalesce(1)  # noqa: E731
    t.write(mk([(1, "a", "x"), (2, "a", "y"), (3, "b", "x"), (4, "b", "y")]))
    t.evolve_partition_spec(["category"])
    t.write(mk([(5, "a", "x"), (6, "b", "y"), (7, "b", "x"), (8, "b", "y")]))
    return t


@query(
    "q_meta_evolution",
    # live files span both specs: the first commit's files are keyed by
    # `part`, the post-evolution commit's by `category` — read straight
    # from the committed manifest, like Iceberg's partitions table
    # reporting rows per (spec, partition)
    oracle=f"""
    WITH m AS (SELECT snapshots FROM read_json_auto('{_SPEC_META}')),
         s AS (SELECT unnest(snapshots) AS snap FROM m),
         f AS (SELECT unnest(snap.files) AS fl FROM s)
    SELECT CASE WHEN fl."partition".part IS NOT NULL
                THEN 'part=' || fl."partition".part
                ELSE 'category=' || fl."partition".category END AS part,
           CAST(SUM(fl."rows") AS BIGINT) AS record_count
    FROM f
    GROUP BY 1
    """,
    tags=("meta:evolution", "tablemeta", "spec"),
)
def q_meta_evolution(spark, sf_dir) -> DataFrame:
    """`.partitions` across a partition-spec change: old-layout and
    new-layout partitions coexist, each with correct record counts."""
    t = _spec_table(spark)
    return t.partitions_table().select("part", "record_count")


_spec_md_path: str | None = None


def _spec_md(spark) -> str:
    """Native metadata for the spec-evolution fixture (multi-spec
    manifests), emitted once per fixture build and reused by hint."""
    global _spec_md_path
    from ..iceberg_meta import write_iceberg_metadata

    t = _spec_table(spark)
    if _spec_md_path and os.path.exists(_spec_md_path):
        return _spec_md_path
    hint = os.path.join(SPEC_ROOT, "metadata", "version-hint.text")
    if os.path.exists(hint):
        with open(hint) as f:
            n = f.read().strip()
        cand = os.path.join(SPEC_ROOT, "metadata", f"v{n}.metadata.json")
        if os.path.exists(cand):
            _spec_md_path = cand
            return cand
    _spec_md_path = write_iceberg_metadata(t)
    return _spec_md_path


@query(
    "q_meta_multispec",
    # the fixture's 8 literal rows: any error in the per-spec manifests
    # (wrong spec for a dir, wrong partition value, missing file) loses
    # or mislabels rows
    oracle="""
    SELECT * FROM (VALUES
      (CAST(1 AS BIGINT), 'a', 'x'), (CAST(2 AS BIGINT), 'a', 'y'),
      (CAST(3 AS BIGINT), 'b', 'x'), (CAST(4 AS BIGINT), 'b', 'y'),
      (CAST(5 AS BIGINT), 'a', 'x'), (CAST(6 AS BIGINT), 'b', 'y'),
      (CAST(7 AS BIGINT), 'b', 'x'), (CAST(8 AS BIGINT), 'b', 'y')
    ) AS t(id, category, part)
    """,
    tags=("meta:iceberg", "tablemeta", "interop", "spec"),
)
def q_meta_multispec(spark, sf_dir) -> DataFrame:
    """Multi-spec external read: reconstruct the spec-evolved table
    EXCLUSIVELY from the emitted metadata — every live file resolves its
    partition column through ITS OWN spec's manifest (first commit keyed
    by `part`, post-evolution commit by `category`)."""
    from ..iceberg_meta import read_table_chain

    md = _spec_md(spark)
    chain = read_table_chain(md)
    legs = []
    for e in chain["data"]:
        df_ = e["data_file"]
        ((pcol, pval),) = df_["partition"].items()
        other = {"part": "category", "category": "part"}[pcol]
        legs.append(
            spark.read.schema(f"id bigint, {other} string")
            .parquet(df_["file_path"])
            .select("id", F.lit(pval).alias(pcol), F.col(other))
        )
    u = legs[0]
    for d in legs[1:]:
        u = u.unionByName(d)
    return u.select("id", "category", "part")


RENAME_ROOT = os.path.join(_REPO_ROOT, "fixtures", "rename_demo")
_rename_md_path: str | None = None


def _rename_md(spark) -> str:
    """Rename fixture + native metadata: append 4 rows under columns
    (id, amount), rename amount→qty (metadata-only), append 4 more —
    live files MIX column names; emission publishes the Iceberg
    name-mapping property instead of refusing."""
    global _rename_md_path
    from ..iceberg_meta import write_iceberg_metadata
    from ..tables import SnapshotTable

    if _rename_md_path and os.path.exists(_rename_md_path):
        return _rename_md_path
    hint = os.path.join(RENAME_ROOT, "metadata", "version-hint.text")
    if os.path.exists(hint):
        with open(hint) as f:
            n = f.read().strip()
        cand = os.path.join(RENAME_ROOT, "metadata", f"v{n}.metadata.json")
        if os.path.exists(cand):
            _rename_md_path = cand
            return cand
    shutil.rmtree(RENAME_ROOT, ignore_errors=True)
    counter = itertools.count()
    t = SnapshotTable.create(
        spark, RENAME_ROOT, "id bigint, amount bigint",
        clock=lambda: 1_700_000_000.0 + 60.0 * next(counter),
    )
    t.write(
        spark.createDataFrame([(i, 10 * i) for i in range(1, 5)], "id bigint, amount bigint")
        .coalesce(1).sortWithinPartitions("id")
    )
    t.rename_column("amount", "qty")
    t.write(
        spark.createDataFrame([(i, 10 * i) for i in range(5, 9)], "id bigint, qty bigint")
        .coalesce(1).sortWithinPartitions("id")
    )
    _rename_md_path = write_iceberg_metadata(t)
    return _rename_md_path


@query(
    "q_meta_name_mapping",
    # literal expectation: ids 1..8, qty = 10*id — recoverable ONLY by
    # resolving each file's physical column through the published
    # name-mapping (pre-rename files store the data under 'amount')
    oracle="""
    SELECT * FROM (VALUES
      (CAST(1 AS BIGINT), CAST(10 AS BIGINT)), (CAST(2 AS BIGINT), CAST(20 AS BIGINT)),
      (CAST(3 AS BIGINT), CAST(30 AS BIGINT)), (CAST(4 AS BIGINT), CAST(40 AS BIGINT)),
      (CAST(5 AS BIGINT), CAST(50 AS BIGINT)), (CAST(6 AS BIGINT), CAST(60 AS BIGINT)),
      (CAST(7 AS BIGINT), CAST(70 AS BIGINT)), (CAST(8 AS BIGINT), CAST(80 AS BIGINT))
    ) AS t(id, qty)
    """,
    tags=("meta:iceberg", "tablemeta", "interop", "rename", "name-mapping"),
)
def q_meta_name_mapping(spark, sf_dir) -> DataFrame:
    """External read of a renamed table through the emitted metadata:
    the `schema.name-mapping.default` property maps every field id to
    its historical names, so a reader probes each data file's parquet
    schema and selects whichever mapped name the file actually carries
    — exactly how an Iceberg reader resolves files without field ids."""
    import json as _json

    import pyarrow.parquet as _pq

    from ..iceberg_meta import read_table_chain

    md = _rename_md(spark)
    with open(md) as f:
        doc = _json.load(f)
    mapping = {
        e["field-id"]: e["names"]
        for e in _json.loads(doc["properties"]["schema.name-mapping.default"])
    }
    current = {f["id"]: f["name"] for f in doc["schema"]["fields"]}
    chain = read_table_chain(md)
    legs = []
    for e in chain["data"]:
        path = e["data_file"]["file_path"]
        physical = set(_pq.ParquetFile(path).schema_arrow.names)
        sel = []
        for fid, cur in current.items():
            name = next(n for n in mapping[fid] if n in physical)
            sel.append(F.col(name).alias(cur))
        legs.append(spark.read.parquet(path).select(*sel))
    u = legs[0]
    for d in legs[1:]:
        u = u.unionByName(d)
    return u.select("id", "qty")


# --------------------------------------------------------------------------
RB_ROOT = os.path.join(_REPO_ROOT, "fixtures", "rollback_demo")
_RB_META = os.path.join(RB_ROOT, "_meta.json")


def _rb_table(spark):
    """Deterministic rollback fixture: append {1,2} (sid 1), append {3}
    (sid 2), rollback to sid 1, append {4} (sid 3 forking from sid 1).
    Final main = {1,2,4}; sid 2 is retained but off-lineage."""
    from ..tables import SnapshotTable

    import json as _json

    try:
        with open(_RB_META) as f:
            doc = _json.load(f)
        if doc.get("branches", {}).get("main") == 3 and len(doc["snapshots"]) == 3:
            return SnapshotTable(spark, RB_ROOT)
    except Exception:
        pass
    shutil.rmtree(RB_ROOT, ignore_errors=True)
    counter = itertools.count()
    ddl = "id bigint, v string"
    t = SnapshotTable.create(
        spark, RB_ROOT, ddl, clock=lambda: 1_700_000_000.0 + 60.0 * next(counter)
    )
    mk = lambda rows: spark.createDataFrame(rows, ddl).coalesce(1)  # noqa: E731
    t.write(mk([(1, "a"), (2, "b")]))
    t.write(mk([(3, "c")]))
    t.rollback_to_snapshot(1)
    t.write(mk([(4, "d")]))
    return t


@query(
    "q_meta_rollback",
    # the fixture's history is a deterministic constant (like q_meta_dml);
    # the load-bearing fact is sid 2 retained but off-lineage after the
    # rollback, while sid 3 forked from sid 1
    oracle="""
    SELECT * FROM (VALUES (CAST(1 AS BIGINT), 'append', true),
                          (2, 'append', false),
                          (3, 'append', true))
    AS t(snapshot_id, operation, is_current_ancestor)
    """,
    tags=("meta:rollback", "tablemeta"),
    bench=True,
)
def q_meta_rollback(spark, sf_dir) -> DataFrame:
    """History after a rollback: the rolled-past snapshot is retained but
    no longer a current ancestor; the post-rollback write forks from the
    rollback point."""
    t = _rb_table(spark)
    return t.history().select("snapshot_id", "operation", "is_current_ancestor")


@query(
    "q_meta_manifests",
    # per-snapshot manifest stats straight from the committed _meta.json;
    # file counts are layout-stable here (fixture writes coalesce(1))
    oracle=f"""
    WITH m AS (SELECT snapshots FROM read_json_auto('{_DEMO_META}')),
         s AS (SELECT unnest(snapshots) AS snap FROM m)
    SELECT CAST(snap.snapshot_id AS BIGINT) AS snapshot_id,
           snap.operation AS operation,
           CAST(coalesce(len(snap.files), 0) AS INT) AS added_data_files,
           CAST(coalesce(len(snap.delete_file_stats), 0) AS INT) AS added_delete_files,
           CAST(coalesce(list_sum(list_transform(snap.files, f -> f."rows")), 0)
                AS BIGINT) AS added_rows,
           CAST(coalesce(list_sum(list_transform(snap.delete_file_stats, f -> f."rows")), 0)
                AS BIGINT) AS added_delete_rows,
           array_to_string(list_sort(list_distinct(list_transform(
               snap.files, f -> 'category=' || coalesce(f."partition".category, 'null')))),
               ',') AS partitions
    FROM s
    """,
    tags=("meta:manifests", "tablemeta"),
)
def q_meta_manifests(spark, sf_dir) -> DataFrame:
    """`.manifests` over the demo table: per-commit added data/delete file
    counts, added row totals, and the touched partition set."""
    t = _demo_table(spark)
    return t.manifests_table().select(
        "snapshot_id",
        "operation",
        "added_data_files",
        "added_delete_files",
        "added_rows",
        "added_delete_rows",
        F.concat_ws(",", F.col("partition_summary")).alias("partitions"),
    )


# --------------------------------------------------------------------------
POSDEL_ROOT = os.path.join(_REPO_ROOT, "fixtures", "posdel_demo")
_POSDEL_META = os.path.join(POSDEL_ROOT, "_meta.json")


def _posdel_table(spark):
    """Deterministic positional-delete fixture (Iceberg v2 position
    deletes — `write.delete.style=position`): append 6 rows, MOR DELETE
    WHERE qty < 25 (delete file = (file_rel, pos) identities, no keys),
    MOR UPDATE id=4 (positional pre-image + post-image append)."""
    from ..tables import SnapshotTable

    import json as _json

    try:
        with open(_POSDEL_META) as f:
            doc = _json.load(f)
        ops = [s["operation"] for s in doc["snapshots"]]
        styles = {
            d.get("style")
            for s in doc["snapshots"]
            for d in s.get("active_deletes", [])
        }
        if ops == ["append", "delete", "merge"] and styles == {"position"}:
            return SnapshotTable(spark, POSDEL_ROOT)
    except Exception:
        pass
    shutil.rmtree(POSDEL_ROOT, ignore_errors=True)
    counter = itertools.count()
    ddl = "id bigint, category string, qty bigint"
    t = SnapshotTable.create(
        spark, POSDEL_ROOT, ddl, partition_by=["category"],
        properties={
            "write.delete.mode": "merge-on-read",
            "write.update.mode": "merge-on-read",
            "write.delete.style": "position",
        },
        clock=lambda: 1_700_000_000.0 + 60.0 * next(counter),
    )
    rows = [(1, "a", 10), (2, "a", 20), (3, "b", 30), (4, "b", 40),
            (5, "c", 50), (6, "c", 60)]
    t.write(spark.createDataFrame(rows, ddl).coalesce(1).sortWithinPartitions("id"))
    t.delete_where("qty < 25")
    t.update_where("id = 4", {"qty": "qty * 10"})
    return t


@query(
    "q_meta_pos_delete",
    # same DML sequence as q_meta_dml, executed with POSITIONAL deletes:
    # the final state constant must be identical, and the changelog's
    # delete rows must be FULL pre-images (positional identity resolves
    # the exact prior row — equality deletes can only emit key stubs)
    oracle="""
    SELECT * FROM (VALUES
        (CAST(1 AS BIGINT), 'pre', CAST(1 AS BIGINT), 'a', CAST(10 AS BIGINT)),
        (1, 'pre', 2, 'a', 20),
        (2, 'pre', 4, 'b', 40),
        (3, 'state', 3, 'b', 30),
        (3, 'state', 4, 'b', 400),
        (3, 'state', 5, 'c', 50),
        (3, 'state', 6, 'c', 60))
    AS t(seq, kind, id, category, qty)
    """,
    tags=("meta:pos-delete", "tablemeta", "reference:S13"),
)
def q_meta_pos_delete(spark, sf_dir) -> DataFrame:
    """Positional-delete MOR lifecycle: final table state plus the
    changelog's full-row delete pre-images, both as one driver-checkable
    relation (`seq` groups: 1 = delete pre-images, 2 = update pre-image,
    3 = final state)."""
    t = _posdel_table(spark)
    ch = t.changes(1, t.latest_snapshot_id())
    pre = ch.filter(F.col("_change_type") == "delete").select(
        F.when(F.col("_snapshot_id") == 2, F.lit(1)).otherwise(F.lit(2)).cast("bigint").alias("seq"),
        F.lit("pre").alias("kind"),
        "id",
        "category",
        "qty",
    )
    state = t.scan().select(
        F.lit(3).cast("bigint").alias("seq"),
        F.lit("state").alias("kind"),
        "id",
        "category",
        "qty",
    )
    return pre.unionByName(state)


# --------------------------------------------------------------------------
HIDDEN_ROOT = os.path.join(_REPO_ROOT, "fixtures", "hidden_demo")
_HIDDEN_META = os.path.join(HIDDEN_ROOT, "_meta.json")


def _hidden_table(spark):
    """Deterministic hidden-partitioning fixture (Iceberg transformed
    partition spec): `days(ts), bucket(4, user_id)` — partition values
    are DERIVED, data files keep only the source columns. Two append
    commits over 4 days × a handful of users; coalesce(1) keeps the
    file-per-partition layout stable for the manifest oracle."""
    import datetime as _dt
    import json as _json

    from ..tables import SnapshotTable

    try:
        with open(_HIDDEN_META) as f:
            doc = _json.load(f)
        ops = [s["operation"] for s in doc["snapshots"]]
        if ops == ["append", "append"] and doc["partition_by"] == [
            "days(ts)",
            "bucket(4, user_id)",
        ]:
            return SnapshotTable(spark, HIDDEN_ROOT)
    except Exception:
        pass
    shutil.rmtree(HIDDEN_ROOT, ignore_errors=True)
    counter = itertools.count()
    ddl = "id bigint, ts timestamp, user_id bigint, val bigint"
    t = SnapshotTable.create(
        spark, HIDDEN_ROOT, ddl,
        partition_by=["days(ts)", "bucket(4, user_id)"],
        clock=lambda: 1_700_000_000.0 + 60.0 * next(counter),
    )
    mk = lambda rows: spark.createDataFrame(rows, ddl).coalesce(1)  # noqa: E731
    t.write(mk([
        (i, _dt.datetime(2024, 1, 1 + i % 4, 3 * (i % 8)), i % 6, 10 * i)
        for i in range(12)
    ]))
    t.write(mk([
        (i, _dt.datetime(2024, 1, 1 + i % 4, 3 * (i % 8)), i % 6, 10 * i)
        for i in range(12, 24)
    ]))
    return t


@query(
    "q_meta_hidden",
    # three independent recomputations in the oracle: live file count
    # from the committed _meta.json, the day-range prune decision replayed
    # over the manifest partition values, and the row/value totals straight
    # from the parquet files — all joined into the same single-row shape
    # the engine answers from plan_files + scan_pruned
    oracle=f"""
    WITH m AS (SELECT snapshots FROM read_json_auto('{_HIDDEN_META}')),
         s AS (SELECT unnest(snapshots) AS snap FROM m),
         f AS (SELECT unnest(snap.files) AS fl FROM s),
         d AS (SELECT * FROM read_parquet(
                   '{HIDDEN_ROOT}/data/*/ts_day=*/user_id_bucket=*/*.parquet',
                   hive_partitioning = true)
               WHERE ts >= TIMESTAMP '2024-01-02 00:00:00'
                 AND ts <= TIMESTAMP '2024-01-03 23:59:59')
    SELECT (SELECT CAST(COUNT(*) AS INT) FROM f) AS files_total,
           (SELECT CAST(COUNT(*) AS INT) FROM f
             WHERE fl."partition".ts_day BETWEEN '2024-01-02' AND '2024-01-03')
               AS files_kept,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM d) AS rows_in_range,
           (SELECT CAST(SUM(val) AS BIGINT) FROM d) AS sum_val
    """,
    tags=("meta:hidden-partitioning", "tablemeta", "reference:S12"),
)
def q_meta_hidden(spark, sf_dir) -> DataFrame:
    """Hidden partitioning end-to-end: a `days(ts), bucket(4, user_id)`
    table planned with a predicate on the SOURCE column `ts` — manifest
    partition values prune file reads through the transform (the Iceberg
    feature identity partitioning can't express), then `scan_pruned`
    returns exactly the rows a full scan + filter would."""
    t = _hidden_table(spark)
    lo, hi = "2024-01-02 00:00:00", "2024-01-03 23:59:59"
    kept, total = t.plan_files("ts", lo, hi)
    agg = (
        t.scan_pruned("ts", lo, hi)
        .filter(F.col("ts").between(lo, hi))
        .agg(
            F.count("*").alias("rows_in_range"),
            F.sum("val").alias("sum_val"),
        )
    )
    return agg.select(
        F.lit(total).cast("int").alias("files_total"),
        F.lit(len(kept)).cast("int").alias("files_kept"),
        "rows_in_range",
        "sum_val",
    )


@query(
    "q_meta_as_of",
    # a wall-clock instant BETWEEN the second append (t=1700000060) and
    # the MOR merge (t=1700000120) must resolve to snapshot 2's state —
    # the same independent reconstruction q_meta_time_travel checks, now
    # reached through timestamp resolution instead of a snapshot id
    oracle=f"""
    SELECT id, category, qty
    FROM read_parquet(['{DEMO_ROOT}/data/s1/*/*.parquet',
                       '{DEMO_ROOT}/data/s2/*/*.parquet'],
                      hive_partitioning = true)
    """,
    tags=("meta:timestamp-as-of", "tablemeta"),
)
def q_meta_as_of(spark, sf_dir) -> DataFrame:
    """Time travel by wall-clock time (Iceberg `FOR TIMESTAMP AS OF`):
    the latest snapshot made current at or before the instant — here a
    time 30 s after the second append and before the merge."""
    t = _demo_table(spark)
    return t.scan_as_of(1_700_000_090.0).select("id", "category", "qty")


# --------------------------------------------------------------------------
MAINTP_ROOT = os.path.join(_REPO_ROOT, "fixtures", "maint_policy_demo")
_MAINTP_META = os.path.join(MAINTP_ROOT, "_meta.json")


def _maintp_table(spark):
    """Deterministic maintenance-policy fixture: three 1-file appends into
    partition a (overfull at max_files=2), one into b (healthy), then
    `maintain(2)` — the policy rewrite touches ONLY partition a."""
    import json as _json

    from ..tables import SnapshotTable

    try:
        with open(_MAINTP_META) as f:
            doc = _json.load(f)
        ops = [s["operation"] for s in doc["snapshots"]]
        if ops == ["append", "append", "append", "maintain"]:
            return SnapshotTable(spark, MAINTP_ROOT)
    except Exception:
        pass
    shutil.rmtree(MAINTP_ROOT, ignore_errors=True)
    counter = itertools.count()
    ddl = "id bigint, category string, v bigint"
    t = SnapshotTable.create(
        spark, MAINTP_ROOT, ddl, partition_by=["category"],
        clock=lambda: 1_700_000_000.0 + 60.0 * next(counter),
    )
    mk = lambda rows: spark.createDataFrame(rows, ddl).coalesce(1)  # noqa: E731
    t.write(mk([(1, "a", 10), (10, "b", 100)]))
    t.write(mk([(2, "a", 20)]))
    t.write(mk([(3, "a", 30)]))
    t.maintain(max_files_per_partition=2)
    return t


@query(
    "q_meta_maintain",
    # the policy's outcome is a deterministic constant: partition a's
    # three small files became one, b kept its single original file, no
    # row was lost, and the commit is a 'maintain' scoped to 1 partition
    # (fixture writes coalesce(1), so file counts are layout-stable —
    # same caveat handling as q_meta_manifests)
    oracle="""
    SELECT * FROM (VALUES ('a', 1, CAST(3 AS BIGINT), CAST(60 AS BIGINT),
                           'maintain', 1),
                          ('b', 1, CAST(1 AS BIGINT), CAST(100 AS BIGINT),
                           'maintain', 1))
    AS t(category, n_live_files, n_rows, sum_v, last_op, scoped_partitions)
    """,
    tags=("meta:maintenance-policy", "tablemeta", "reference:S5c"),
)
def q_meta_maintain(spark, sf_dir) -> DataFrame:
    """Auto-maintenance policy: per-partition live file counts and row
    totals AFTER `maintain()` compacted only the overfull partition."""
    t = _maintp_table(spark)
    per_part: dict[str, int] = {}
    for _rel, f in t._live_files():
        c = f["partition"]["category"]
        per_part[c] = per_part.get(c, 0) + 1
    last = t.snapshots()[-1]
    files_df = spark.createDataFrame(
        [(c, n) for c, n in sorted(per_part.items())],
        "category string, n_live_files int",
    )
    rows_df = t.scan().groupBy("category").agg(
        F.count("*").alias("n_rows"), F.sum("v").alias("sum_v")
    )
    return (
        files_df.join(rows_df, "category")
        .withColumn("last_op", F.lit(last.operation))
        .withColumn(
            "scoped_partitions",
            F.lit(int(last.summary.get("overfull_partitions", 0))).cast("int"),
        )
    )


# --------------------------------------------------------------------------
SQLDEMO_ROOT = os.path.join(_REPO_ROOT, "fixtures", "sql_demo")
_SQLDEMO_META = os.path.join(SQLDEMO_ROOT, "_meta.json")


def _sql_table(spark):
    """Deterministic SQL-façade fixture: the full statement lifecycle the
    reference drives through spark.sql — CREATE TABLE ... USING iceberg,
    INSERT, the reference's MERGE INTO shape (aliases + dedup subquery +
    CDC DELETE clause, `bronze-silver.py:250-285`), DELETE FROM, UPDATE —
    executed from SQL TEXT via sqlext.SqlCatalog."""
    import json as _json

    from ..sqlext import SqlCatalog
    from ..tables import SnapshotTable

    try:
        with open(_SQLDEMO_META) as f:
            doc = _json.load(f)
        ops = [s["operation"] for s in doc["snapshots"]]
        if ops == ["append", "merge", "delete", "update"]:
            return SnapshotTable(spark, SQLDEMO_ROOT)
    except Exception:
        pass
    shutil.rmtree(SQLDEMO_ROOT, ignore_errors=True)
    counter = itertools.count()
    cat = SqlCatalog(spark, warehouse=os.path.join(_REPO_ROOT, "fixtures"))
    cat.sql(
        """CREATE TABLE sql_demo (
               invoiceid BIGINT, itemid BIGINT, category STRING, qty BIGINT
           ) USING iceberg
           TBLPROPERTIES ('write.merge.mode'='copy-on-write')"""
    )
    # deterministic commit clock, like every other fixture: SqlCatalog
    # re-instantiates SnapshotTable per statement, so pin the clock by
    # wrapping table() for the build
    clock = lambda: 1_700_000_000.0 + 60.0 * next(counter)  # noqa: E731
    orig_table = cat.table

    def table_with_clock(name):
        tt = orig_table(name)
        tt._clock = clock
        return tt

    cat.table = table_with_clock
    cat.sql(
        "INSERT INTO sql_demo VALUES (1, 1, 'alpha', 10), (2, 1, 'beta', 20),"
        " (3, 1, 'gamma', 30)"
    )
    spark.createDataFrame(
        [(1, 1, "alpha2", 11, "U", 2), (1, 1, "stale", 99, "U", 1),
         (2, 1, "beta", 20, "D", 1), (9, 9, "new", 90, "I", 1)],
        "invoiceid bigint, itemid bigint, category string, qty bigint,"
        " Op string, processed_time bigint",
    ).createOrReplaceTempView("__sql_demo_batch")
    cat.sql(
        """
        MERGE INTO sql_demo AS target
        USING (
            SELECT * FROM (
                SELECT *, ROW_NUMBER() OVER (
                    PARTITION BY invoiceid, itemid
                    ORDER BY processed_time DESC
                ) AS row_num FROM __sql_demo_batch
            ) AS deduped_source WHERE row_num = 1
        ) AS source
        ON target.invoiceid = source.invoiceid
           AND target.itemid = source.itemid
        WHEN MATCHED AND source.Op = 'D' THEN DELETE
        WHEN MATCHED THEN UPDATE SET
            target.category = source.category,
            target.qty = source.qty
        WHEN NOT MATCHED THEN INSERT
            (invoiceid, itemid, category, qty)
            VALUES (source.invoiceid, source.itemid, source.category, source.qty)
        """
    )
    cat.sql("DELETE FROM sql_demo WHERE qty > 50")
    cat.sql("UPDATE sql_demo SET qty = qty * 2 WHERE category = 'gamma'")
    return cat.table("sql_demo")


CTAS_ROOT = os.path.join(_REPO_ROOT, "fixtures", "sql_ctas_demo")
_CTAS_META = os.path.join(CTAS_ROOT, "_meta.json")


def _ctas_table(spark):
    """Deterministic fixture for the round-5 façade statements, driven
    entirely from SQL text: CTAS (schema from the SELECT), INSERT
    OVERWRITE, and CALL system.vacuum (maintain → expire → orphan sweep).
    After vacuum only the overwrite snapshot survives."""
    import json as _json

    from ..sqlext import SqlCatalog
    from ..tables import SnapshotTable

    try:
        with open(_CTAS_META) as f:
            doc = _json.load(f)
        if [s["operation"] for s in doc["snapshots"]] == ["overwrite"]:
            return SnapshotTable(spark, CTAS_ROOT)
    except Exception:
        pass
    shutil.rmtree(CTAS_ROOT, ignore_errors=True)
    cat = SqlCatalog(spark, warehouse=os.path.join(_REPO_ROOT, "fixtures"))
    spark.createDataFrame(
        [(1, "a", 10), (2, "a", 20), (3, "b", 30), (4, "b", 40)],
        "id bigint, grp string, qty bigint",
    ).createOrReplaceTempView("__ctas_src")
    cat.sql(
        """CREATE TABLE sql_ctas_demo USING iceberg
           TBLPROPERTIES ('write.merge.mode'='copy-on-write')
           AS SELECT grp, SUM(qty) AS total FROM __ctas_src GROUP BY grp"""
    )
    cat.sql(
        "INSERT OVERWRITE sql_ctas_demo"
        " SELECT grp, SUM(qty) * 10 AS total FROM __ctas_src GROUP BY grp"
    )
    cat.sql("CALL system.vacuum(table => 'sql_ctas_demo', retain_last => 1)")
    return cat.table("sql_ctas_demo")


@query(
    "q_sql_ctas",
    # deterministic end state: CTAS totals ×10 by the overwrite; vacuum
    # leaves exactly one live snapshot; DESCRIBE pins the derived schema
    oracle="""
    SELECT * FROM (VALUES ('a', CAST(300 AS BIGINT), 1, 'grp:string,total:bigint'),
                          ('b', 700, 1, 'grp:string,total:bigint'))
    AS t(grp, total, n_live_snapshots, schema_str)
    """,
    tags=("sql-facade", "tablemeta", "ctas"),
)
def q_sql_ctas(spark, sf_dir) -> DataFrame:
    """Round-5 façade statements end-to-end from SQL text: CTAS derives
    the table from a SELECT, INSERT OVERWRITE replaces its state in a new
    snapshot, and CALL system.vacuum expires everything but the head —
    final state, live-snapshot count, and the DESCRIBE-derived schema are
    the constant the oracle states."""
    t = _ctas_table(spark)
    n = len(t.snapshots())
    schema_str = ",".join(
        f"{f.name}:{f.dataType.simpleString()}" for f in t.schema().fields
    )
    return (
        t.scan()
        .select("grp", "total")
        .withColumn("n_live_snapshots", F.lit(n).cast("int"))
        .withColumn("schema_str", F.lit(schema_str))
    )


@query(
    "q_sql_surface",
    # the lifecycle lands on a deterministic constant: MERGE updated
    # (1,1)→alpha2/11 latest-wins over the stale row, deleted (2,1) via
    # the CDC clause, inserted (9,9); DELETE removed qty>50 (the new 90);
    # UPDATE doubled gamma. History = the four statements in order.
    oracle="""
    SELECT * FROM (VALUES
        (CAST(1 AS BIGINT), CAST(1 AS BIGINT), 'alpha2', CAST(11 AS BIGINT), 4),
        (3, 1, 'gamma', 60, 4))
    AS t(invoiceid, itemid, category, qty, n_commits)
    """,
    tags=("sql-facade", "tablemeta", "reference:C4"),
)
def q_sql_surface(spark, sf_dir) -> DataFrame:
    """The reference's spark.sql surface (C4) executed as SQL TEXT through
    `sqlext.SqlCatalog`: CREATE/INSERT/MERGE (the `bronze-silver.py`
    statement shape with a CDC DELETE clause)/DELETE/UPDATE, verified on
    the final state + commit count."""
    t = _sql_table(spark)
    n = len(t.snapshots())
    return t.scan().select(
        "invoiceid", "itemid", "category", "qty",
    ).withColumn("n_commits", F.lit(n).cast("int"))


# --------------------------------------------------------------------------
DYNOV_ROOT = os.path.join(_REPO_ROOT, "fixtures", "dynov_demo")


def _dynov_table(spark):
    """Deterministic dynamic-partition-overwrite fixture: two appends
    (sids 1-2) across partitions a/b/c, then `overwrite_partitions` of a
    batch touching ONLY a and b (sid 3) — c's files are never rewritten."""
    from ..tables import SnapshotTable

    import json as _json

    try:
        with open(os.path.join(DYNOV_ROOT, "_meta.json")) as f:
            doc = _json.load(f)
        snaps = doc.get("snapshots", [])
        if len(snaps) == 3 and snaps[-1]["operation"] == "dynamic-overwrite":
            return SnapshotTable(spark, DYNOV_ROOT)
    except Exception:
        pass
    shutil.rmtree(DYNOV_ROOT, ignore_errors=True)
    counter = itertools.count()
    ddl = "id bigint, category string, qty bigint"
    t = SnapshotTable.create(
        spark, DYNOV_ROOT, ddl, partition_by=["category"],
        clock=lambda: 1_700_000_000.0 + 60.0 * next(counter),
    )
    mk = lambda rows: spark.createDataFrame(rows, ddl).coalesce(1)  # noqa: E731
    t.write(mk([(1, "a", 10), (2, "b", 20), (3, "c", 30)]))
    t.write(mk([(4, "a", 40), (5, "b", 50)]))
    t.overwrite_partitions(mk([(9, "a", 99), (8, "b", 88)]))
    return t


@query(
    "q_meta_dyn_overwrite",
    # oracle: INDEPENDENT reconstruction from the committed raw parquet —
    # apply dynamic-overwrite semantics by hand: sid-3's own partitions
    # replace, every other partition survives from sids 1-2
    oracle=f"""
    WITH old AS (
      SELECT id, category, qty
      FROM read_parquet('{DYNOV_ROOT}/data/s1/*/*.parquet', hive_partitioning = true)
      UNION ALL
      SELECT id, category, qty
      FROM read_parquet('{DYNOV_ROOT}/data/s2/*/*.parquet', hive_partitioning = true)),
    nw AS (
      SELECT id, category, qty
      FROM read_parquet('{DYNOV_ROOT}/data/s3/*/*.parquet', hive_partitioning = true))
    SELECT id, category, qty FROM old
    WHERE category NOT IN (SELECT DISTINCT category FROM nw)
    UNION ALL
    SELECT id, category, qty FROM nw
    """,
    tags=("meta:dyn-overwrite", "tablemeta", "reference:S13"),
)
def q_meta_dyn_overwrite(spark, sf_dir) -> DataFrame:
    """Dynamic partition overwrite (Iceberg INSERT OVERWRITE,
    partitionOverwriteMode=dynamic): the engine's masked scan must equal
    an independent raw-parquet reconstruction that applies the
    replace-only-written-partitions rule by hand."""
    t = _dynov_table(spark)
    return t.scan().select("id", "category", "qty")


# --------------------------------------------------------------------------
# ANALYZE TABLE — the statistics service (Iceberg
# `CALL system.compute_table_stats`, which records NDV sketches in a
# Puffin stats file; Spark's `ANALYZE TABLE ... COMPUTE STATISTICS FOR
# COLUMNS`). tables.py:analyze computes per-column null counts and a
# DETERMINISTIC K-minimum-values sketch (k smallest distinct 60-bit
# md5-prefix hashes) in one distributed top-k job per column, and stores
# them in versioned table properties. The oracle recomputes the SKETCH
# itself (sample size + k-th hash + null/row counts) from the same rows
# in DuckDB — integer/string-exact; the float NDV estimator derived from
# the sketch is engine-side only.
_analyze_cache: dict = {}


def _analyze_table(spark, sf_dir: str) -> str:
    import tempfile

    from ..catalog import load_table
    from ..tables import SnapshotTable

    key = os.path.abspath(sf_dir)
    root = _analyze_cache.get(key)
    if root and SnapshotTable.exists(root):
        return root
    root = os.path.join(tempfile.mkdtemp(prefix="eiws_analyze_"), "tbl")
    src = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") % 7 == 0)
        .selectExpr(
            "CAST(c_custkey AS BIGINT) AS c_custkey",
            "c_mktsegment",
            "CAST(c_nationkey AS BIGINT) AS c_nationkey",
        )
    )
    t = SnapshotTable.create(spark, root, src.schema)
    t.write(src, mode="append")
    _analyze_cache[key] = root
    return root


def _analyze_oracle_leg(col: str) -> str:
    return f"""
    SELECT '{col}' AS column_name,
           (SELECT COUNT(*) FROM src) AS row_count,
           (SELECT COUNT(*) FROM src WHERE {col} IS NULL) AS null_count,
           CAST(COUNT(*) AS BIGINT) AS sample_size,
           MAX(h) AS kth_hash
    FROM (SELECT h FROM (
            SELECT DISTINCT CAST('0x' || substr(md5(CAST({col} AS VARCHAR)), 1, 15)
                            AS BIGINT) AS h
            FROM src WHERE {col} IS NOT NULL)
          ORDER BY h LIMIT 64)
    """.strip()


@query(
    "q_meta_analyze",
    oracle=f"""
    WITH src AS (SELECT CAST(c_custkey AS BIGINT) AS c_custkey, c_mktsegment,
                        CAST(c_nationkey AS BIGINT) AS c_nationkey
                 FROM customer WHERE c_custkey % 7 = 0)
    {_analyze_oracle_leg('c_custkey')}
    UNION ALL
    {_analyze_oracle_leg('c_mktsegment')}
    UNION ALL
    {_analyze_oracle_leg('c_nationkey')}
    """,
    tags=("meta:analyze", "tablemeta", "stats"),
)
def q_meta_analyze(spark, sf_dir) -> DataFrame:
    """ANALYZE through the SQL facade, then read the stored stats back:
    the emitted sketch rows must match DuckDB's independent recompute."""
    import json as _json

    from ..sqlext import SqlCatalog

    root = _analyze_table(spark, sf_dir)
    cat = SqlCatalog(spark)
    cat.register("stats_demo", root)
    cat.sql(
        "ANALYZE TABLE stats_demo COMPUTE STATISTICS "
        "FOR COLUMNS c_custkey, c_mktsegment, c_nationkey"
    )
    t = cat.table("stats_demo")
    props = t.properties()
    rows = []
    for c in ("c_custkey", "c_mktsegment", "c_nationkey"):
        s = _json.loads(props[f"stats.{c}"])
        rows.append(
            (c, s["row_count"], s["null_count"], s["sample_size"], s["kth_hash"])
        )
    return spark.createDataFrame(
        rows,
        "column_name string, row_count long, null_count long, "
        "sample_size long, kth_hash long",
    )


def _puffin_oracle_leg(col: str) -> str:
    """Oracle twin of the Puffin statistics blob for one column: the
    retained-entry count (the k-th KMV value becomes theta, so a full
    sketch retains k-1 entries), the 60-bit bound hash (theta for
    estimation mode, the max retained entry in exact mode — both equal
    the k-th/last KMV hash), and the NDV written to the blob's `ndv`
    property. The estimator leg mirrors `SnapshotTable.analyze`'s float
    semantics bit-for-bit: IEEE-double division of the exactly-
    representable numerator 63·2^60 by the rounded-to-double k-th hash,
    truncated — DOUBLE arithmetic is deterministic and identical across
    engines."""
    return f"""
    SELECT '{col}' AS column_name,
           CASE WHEN COUNT(*) >= 64 THEN CAST(COUNT(*) - 1 AS BIGINT)
                ELSE CAST(COUNT(*) AS BIGINT) END AS retained,
           MAX(h) AS bound_hash,
           CASE WHEN COUNT(*) < 64 THEN CAST(COUNT(*) AS BIGINT)
                ELSE CAST(FLOOR(CAST(63 AS DOUBLE) * 1152921504606846976
                                / CAST(MAX(h) AS DOUBLE)) AS BIGINT)
           END AS ndv
    FROM (SELECT h FROM (
            SELECT DISTINCT CAST('0x' || substr(md5(CAST({col} AS VARCHAR)), 1, 15)
                            AS BIGINT) AS h
            FROM src WHERE {col} IS NOT NULL)
          ORDER BY h LIMIT 64)
    """.strip()


@query(
    "q_meta_stats_puffin",
    oracle=f"""
    WITH src AS (SELECT CAST(c_custkey AS BIGINT) AS c_custkey, c_mktsegment,
                        CAST(c_nationkey AS BIGINT) AS c_nationkey
                 FROM customer WHERE c_custkey % 7 = 0)
    {_puffin_oracle_leg('c_custkey')}
    UNION ALL
    {_puffin_oracle_leg('c_mktsegment')}
    UNION ALL
    {_puffin_oracle_leg('c_nationkey')}
    """,
    tags=("meta:statistics", "tablemeta", "stats", "interop"),
)
def q_meta_stats_puffin(spark, sf_dir) -> DataFrame:
    """ANALYZE, emit native Iceberg metadata, then read the statistics
    back THROUGH the Puffin statistics file (container walk + compact-
    theta decode + blob `ndv` property) — the full write→read loop of the
    spec's table-statistics surface, graded against DuckDB's independent
    KMV recompute. Cites the reference's interop promise
    (read_iceberg_duckdb.py:22-44): stats files ride the same metadata
    dir external engines attach."""
    import json as _json

    from ..iceberg_meta import (
        iceberg_schema,
        read_puffin_stats,
        write_iceberg_metadata,
    )
    from ..sqlext import SqlCatalog

    root = _analyze_table(spark, sf_dir)
    cat = SqlCatalog(spark)
    cat.register("stats_puffin_demo", root)
    t = cat.table("stats_puffin_demo")
    if "stats.c_custkey" not in t.properties():
        cat.sql(
            "ANALYZE TABLE stats_puffin_demo COMPUTE STATISTICS "
            "FOR COLUMNS c_custkey, c_mktsegment, c_nationkey"
        )
        t = cat.table("stats_puffin_demo")
    md_path = write_iceberg_metadata(t)
    with open(md_path) as f:
        doc = _json.load(f)
    stats_entry = doc["statistics"][0]
    puffin = read_puffin_stats(stats_entry["statistics-path"])
    _schema_json, ids = iceberg_schema(t.schema())
    rows = []
    for col in ("c_custkey", "c_mktsegment", "c_nationkey"):
        got = puffin["by_field"][ids[col]]
        sk = got["sketch"]
        if sk["theta"] >= (1 << 63) - 1:
            bound = max(sk["entries"]) // 8
        else:
            bound = sk["theta"] // 8
        rows.append(
            (col, sk["retained"], bound, int(got["blob"]["properties"]["ndv"]))
        )
    return spark.createDataFrame(
        rows, "column_name string, retained long, bound_hash long, ndv long"
    )


@query(
    "q_meta_position_deletes",
    # the positional fixture's delete identities are fully determined:
    # the base write is coalesce(1) + sortWithinPartitions(id), so within
    # each category file positions follow id order — DELETE qty<25 hits
    # (a,0) and (a,1) at snapshot 2, UPDATE id=4 pre-images (b,1) at
    # snapshot 3. File names carry write UUIDs, so the graded column is
    # the partition dir extracted from the path, not the path itself.
    oracle="""
    SELECT * FROM (VALUES
        ('category=a', CAST(0 AS BIGINT), CAST(2 AS BIGINT)),
        ('category=a', CAST(1 AS BIGINT), CAST(2 AS BIGINT)),
        ('category=b', CAST(1 AS BIGINT), CAST(3 AS BIGINT)))
    AS t(part, pos, delete_snapshot_id)
    """,
    tags=("meta:position-deletes", "tablemeta", "reference:S13"),
)
def q_meta_position_deletes(spark, sf_dir) -> DataFrame:
    """The `.position_deletes` metadata table over the positional-MOR
    fixture: every active (data file, row position) delete identity with
    its committing snapshot — the MOR debugging surface Iceberg v2
    exposes under the same name."""
    t = _posdel_table(spark)
    return t.position_deletes_table().select(
        F.regexp_extract("file_path", r"(category=[^/]+)", 1).alias("part"),
        "pos",
        "delete_snapshot_id",
    )


# --------------------------------------------------------------------------
# Metadata-log surface + latest-metadata discovery (reference
# `read_iceberg_duckdb.py:22-44`: the external reader finds the CURRENT
# metadata by listing `metadata/`, filtering `*.metadata.json`, and taking
# `sorted()[-1]`). The fixture carries a 4-version emission history whose
# middle includes a ROLLBACK and an EXPIRE — the hostile cases for a
# discovery rule — and the query reads the `.metadata_log_entries` table
# through the discovered latest file. The oracle reads EVERY version file
# on disk independently: the two agree only if (a) discovery picked the
# true latest version and (b) that file's metadata-log chain is complete
# and carries each prior version's own last-updated-ms /
# current-snapshot-id.

METALOG_ROOT = os.path.join(_REPO_ROOT, "fixtures", "metalog_demo")


def _metalog_demo(spark):
    """4-emission history: v1 (s1) → v2 (s2) → write s3, rollback to s2,
    expire → v3 (current s2) → write → v4. Deterministic clock; reused
    when version-hint already says 4."""
    from ..iceberg_meta import write_iceberg_metadata
    from ..tables import SnapshotTable

    hint = os.path.join(METALOG_ROOT, "metadata", "version-hint.text")
    try:
        with open(hint) as f:
            ok = f.read().strip() == "4"
    except OSError:
        ok = False
    if ok:
        return SnapshotTable(spark, METALOG_ROOT)
    shutil.rmtree(METALOG_ROOT, ignore_errors=True)
    counter = itertools.count()
    ddl = "id bigint, qty bigint"
    t = SnapshotTable.create(
        spark, METALOG_ROOT, ddl,
        clock=lambda: 1_700_000_000.0 + 60.0 * next(counter),
    )
    t.write(spark.createDataFrame([(1, 10), (2, 20)], ddl).coalesce(1))
    write_iceberg_metadata(t)  # v1, current = s1
    t.write(spark.createDataFrame([(3, 30)], ddl).coalesce(1))
    write_iceberg_metadata(t)  # v2, current = s2
    t.write(spark.createDataFrame([(4, 40)], ddl).coalesce(1))  # s3
    t.rollback_to_snapshot(2)  # s3 leaves the main lineage
    t.expire_snapshots(keep_last=1)  # drops the unreachable fork
    write_iceberg_metadata(t)  # v3, current = s2 again
    t.write(spark.createDataFrame([(5, 50)], ddl).coalesce(1))
    write_iceberg_metadata(t)  # v4
    return t


@query(
    "q_meta_metadata_log",
    # independent derivation: every version file on disk, read directly —
    # no metadata-log knowledge. Agreement proves the discovery rule
    # landed on the true latest AND its log chain is complete/correct.
    oracle=f"""
    SELECT regexp_extract(filename, 'v[0-9]+\\.metadata\\.json') AS file,
           CAST("last-updated-ms" AS BIGINT) AS timestamp_ms,
           CAST("current-snapshot-id" AS BIGINT) AS latest_snapshot_id,
           CAST("current-schema-id" AS INT) AS latest_schema_id
    FROM read_json_auto('{METALOG_ROOT}/metadata/v*.metadata.json',
                        filename = true)
    """,
    tags=("meta:metadata-log", "tablemeta", "interop"),
)
def q_meta_metadata_log(spark, sf_dir) -> DataFrame:
    """`.metadata_log_entries` over a rollback+expire emission history,
    reached through the reference reader's latest-metadata discovery rule
    (list / filter / sorted()[-1], `read_iceberg_duckdb.py:22-44`)."""
    t = _metalog_demo(spark)
    return t.metadata_log_entries_table().select(
        "file", "timestamp_ms", "latest_snapshot_id", "latest_schema_id"
    )


METALOG_RELOC_ROOT = os.path.join(_REPO_ROOT, "fixtures", "metalog_reloc")


def _metalog_reloc(spark):
    """RELOCATED copy of the metalog demo: the whole table directory
    copied to a different absolute path AFTER its 4-version history was
    emitted, so every metadata-log entry records a now-stale write-time
    path — the moved-warehouse / portable-checkout shape."""
    _metalog_demo(spark)  # ensure the source history exists
    from ..tables import SnapshotTable

    hint = os.path.join(METALOG_RELOC_ROOT, "metadata", "version-hint.text")
    try:
        with open(hint) as f:
            ok = f.read().strip() == "4"
    except OSError:
        ok = False
    if not ok:
        shutil.rmtree(METALOG_RELOC_ROOT, ignore_errors=True)
        shutil.copytree(METALOG_ROOT, METALOG_RELOC_ROOT)
    return SnapshotTable(spark, METALOG_RELOC_ROOT)


@query(
    "q_meta_metadata_log_reloc",
    # independent derivation AT THE NEW LOCATION: the relocated dir's
    # version files read directly. Agreement proves the engine's chain
    # walk resolves each logged (stale) path by basename next to the
    # discovered latest file — and that the SQL-facade
    # `<table>.metadata_log_entries` suffix serves the same rows.
    oracle=f"""
    SELECT regexp_extract(filename, 'v[0-9]+\\.metadata\\.json') AS file,
           CAST("last-updated-ms" AS BIGINT) AS timestamp_ms,
           CAST("current-snapshot-id" AS BIGINT) AS latest_snapshot_id,
           CAST("current-schema-id" AS INT) AS latest_schema_id
    FROM read_json_auto('{METALOG_RELOC_ROOT}/metadata/v*.metadata.json',
                        filename = true)
    """,
    tags=("meta:metadata-log", "tablemeta", "interop", "sql-facade"),
)
def q_meta_metadata_log_reloc(spark, sf_dir) -> DataFrame:
    """`.metadata_log_entries` over a RELOCATED warehouse, through the
    SQL facade (`SELECT ... FROM <name>.metadata_log_entries`): the
    logged absolute paths are stale after the move and must resolve by
    basename (`iceberg_meta.py:1600` fallback), like Iceberg readers
    resolving relative to the table location."""
    from ..sqlext import SqlCatalog

    t = _metalog_reloc(spark)
    cat = SqlCatalog(spark, warehouse=os.path.join(_REPO_ROOT, "fixtures"))
    cat.register("metalog_reloc", t.root)
    return cat.sql(
        "SELECT file, timestamp_ms, latest_snapshot_id, latest_schema_id"
        " FROM metalog_reloc.metadata_log_entries"
    )


@query(
    "q_meta_snapshot_summary",
    # manifest-free recomputation: per-snapshot added/total counters
    # rebuilt from the raw parquet files alone (append-only fixture:
    # snapshot N's live state IS dirs s1..sN). The same numbers are
    # graded twice — once from the engine's `.snapshots` table, once from
    # the emitted Iceberg metadata's snapshot `summary` — so a drift in
    # EITHER surface breaks the match.
    oracle=f"""
    WITH f AS (
      SELECT CAST(regexp_extract(filename, 'data/s([0-9]+)/', 1) AS BIGINT) AS dsid,
             filename AS fn, COUNT(*) AS n
      FROM read_parquet('{ICE_ROOT}/data/*/*/*.parquet', filename = true)
      GROUP BY 1, 2)
    SELECT s.dsid AS snapshot_id,
           (SELECT COUNT(*) FROM f WHERE f.dsid = s.dsid) AS added_files,
           (SELECT CAST(SUM(n) AS BIGINT) FROM f WHERE f.dsid = s.dsid) AS added_rows,
           (SELECT COUNT(*) FROM f WHERE f.dsid <= s.dsid) AS total_data_files,
           (SELECT CAST(SUM(n) AS BIGINT) FROM f WHERE f.dsid <= s.dsid) AS total_records,
           (SELECT COUNT(*) FROM f WHERE f.dsid = s.dsid) AS em_added_files,
           (SELECT CAST(SUM(n) AS BIGINT) FROM f WHERE f.dsid = s.dsid) AS em_added_records,
           (SELECT COUNT(*) FROM f WHERE f.dsid <= s.dsid) AS em_total_files,
           (SELECT CAST(SUM(n) AS BIGINT) FROM f WHERE f.dsid <= s.dsid) AS em_total_records
    FROM (SELECT DISTINCT dsid FROM f) s
    """,
    tags=("meta:snapshot-summary", "tablemeta", "interop"),
)
def q_meta_snapshot_summary(spark, sf_dir) -> DataFrame:
    """Iceberg standard snapshot summary counters, graded on BOTH
    surfaces at once: the engine's `.snapshots` totals and the emitted
    metadata.json `summary` (added-data-files / added-records /
    total-data-files / total-records), against a raw-parquet
    recomputation that consults neither."""
    import json

    from ..tables import SnapshotTable

    md = _iceberg_demo(spark)
    with open(md) as f:
        doc = json.load(f)
    em_rows = [
        (
            s["snapshot-id"],
            int(s["summary"]["added-data-files"]),
            int(s["summary"]["added-records"]),
            int(s["summary"]["total-data-files"]),
            int(s["summary"]["total-records"]),
        )
        for s in doc["snapshots"]
    ]
    emdf = spark.createDataFrame(
        em_rows,
        "snapshot_id long, em_added_files long, em_added_records long,"
        " em_total_files long, em_total_records long",
    )
    t = SnapshotTable(spark, ICE_ROOT)
    st = t.snapshots_table().select(
        "snapshot_id", "added_files", "added_rows",
        "total_data_files", F.col("total_records").alias("total_records"),
    )
    # both sides are O(snapshot-count) driver-built rows: broadcast, never
    # a shuffle join
    return st.join(F.broadcast(emdf), "snapshot_id")


# --------------------------------------------------------------------------
# `add_files` import (Iceberg add_files/migrate procedure): pre-existing
# parquet registered into the table with footer-derived manifests and NO
# data rewrite — the realistic 100 TB bootstrap path the reference's
# first-run bronze overwrite (`raw-bronze.py:178-183`) sidesteps by
# rewriting. The fixture imports an externally-written hive-partitioned
# dataset into a table that already has native rows; the oracle reads the
# native dirs AND THE ORIGINAL EXTERNAL FILES — agreement proves the
# import registered exactly the source's content (zero-rewrite is proved
# by inode equality in pytest).

ADDFILES_ROOT = os.path.join(_REPO_ROOT, "fixtures", "addfiles_demo")
ADDFILES_SRC = os.path.join(_REPO_ROOT, "fixtures", "addfiles_src")


def _addfiles_demo(spark):
    from ..tables import SnapshotTable

    ok = False
    try:
        t = SnapshotTable(spark, ADDFILES_ROOT)
        snaps = t.snapshots()
        ok = (
            len(snaps) == 2
            and snaps[-1].operation == "add-files"
            and all(
                os.path.exists(os.path.join(ADDFILES_ROOT, f["path"]))
                for s in snaps
                for f in s.files
            )
            and os.path.isdir(ADDFILES_SRC)
        )
    except Exception:
        ok = False
    if ok:
        return t
    shutil.rmtree(ADDFILES_ROOT, ignore_errors=True)
    shutil.rmtree(ADDFILES_SRC, ignore_errors=True)
    ddl = "id bigint, category string, qty bigint"
    # the "pre-existing" dataset: plain Spark parquet, hive-partitioned,
    # written by no table machinery at all
    ext = spark.createDataFrame(
        [(10, "a", 100), (11, "b", 110), (12, "b", 120), (13, "c", 130)], ddl
    )
    (
        ext.coalesce(1)
        .sortWithinPartitions("id")
        .write.mode("overwrite")
        .partitionBy("category")
        .parquet(ADDFILES_SRC)
    )
    counter = itertools.count()
    t = SnapshotTable.create(
        spark,
        ADDFILES_ROOT,
        ddl,
        partition_by=["category"],
        clock=lambda: 1_700_000_000.0 + 60.0 * next(counter),
    )
    t.write(
        spark.createDataFrame([(1, "a", 10), (2, "c", 20)], ddl)
        .coalesce(1)
        .sortWithinPartitions("id")
    )
    t.add_files(ADDFILES_SRC)
    return t


@query(
    "q_meta_add_files",
    # native rows from the table's own s1 dir + imported rows from the
    # ORIGINAL external location (not the table's copy of them — there is
    # no copy): union-exact against the table scan
    oracle=f"""
    SELECT id, category, qty
    FROM read_parquet('{ADDFILES_ROOT}/data/s1/*/*.parquet',
                      hive_partitioning = true)
    UNION ALL
    SELECT id, category, qty
    FROM read_parquet('{ADDFILES_SRC}/*/*.parquet', hive_partitioning = true)
    """,
    tags=("meta:add-files", "tablemeta", "reference:S10"),
)
def q_meta_add_files(spark, sf_dir) -> DataFrame:
    """Scan after an `add_files` import: native + imported rows, graded
    against the native dirs plus the UNTOUCHED external source files."""
    t = _addfiles_demo(spark)
    return t.scan().select("id", "category", "qty")


@query(
    "q_meta_avro_java",
    # same manifest-free oracle as q_meta_iceberg: raw recursive glob
    # over the data dirs — agreement proves the JAVA-decoded manifests
    # list exactly the live files with correct partitions and row counts
    oracle=f"""
    SELECT category,
           COUNT(DISTINCT filename) AS n_files,
           COUNT(*) AS n_rows,
           CAST(SUM(qty) AS BIGINT) AS qty_total
    FROM read_parquet('{ICE_ROOT}/data/*/*/*.parquet',
                      hive_partitioning = true, filename = true)
    GROUP BY category
    """,
    tags=("meta:avro-java", "tablemeta", "interop"),
)
def q_meta_avro_java(spark, sf_dir) -> DataFrame:
    """Third-party-decoded external read: the fixture table's Iceberg
    chain walked with the STOCK Apache Avro Java library (avro-1.12.x on
    Spark's JVM classpath — the Avro implementation Iceberg's own Java
    runtime uses), not this repo's decoder. metadata.json → Java-decoded
    manifest list → Java-decoded manifests → listed parquet files,
    aggregated per partition and graded against a glob oracle that
    consults no metadata at all."""
    import json as _json

    md = _iceberg_demo(spark)
    with open(md) as f:
        doc = _json.load(f)
    snap = next(
        s for s in doc["snapshots"]
        if s["snapshot-id"] == doc["current-snapshot-id"]
    )
    jvm = spark._jvm

    def java_records(path):
        dfr = jvm.org.apache.avro.file.DataFileReader(
            jvm.java.io.File(path), jvm.org.apache.avro.generic.GenericDatumReader()
        )
        out = []
        while dfr.hasNext():
            out.append(dfr.next())
        dfr.close()
        return out

    files = []
    for mrec in java_records(snap["manifest-list"]):
        for e in java_records(str(mrec.get("manifest_path").toString())):
            dfr = e.get("data_file")
            part = dfr.get("partition")
            files.append(
                (
                    str(part.get("category").toString()),
                    str(dfr.get("file_path").toString()),
                )
            )
    dfs = [
        spark.read.schema("id bigint, qty bigint")
        .parquet(fp)
        .select(
            F.lit(cat).alias("category"),
            F.lit(fp).alias("fpath"),
            "qty",
        )
        for cat, fp in files
    ]
    u = dfs[0]
    for d in dfs[1:]:
        u = u.unionByName(d)
    return u.groupBy("category").agg(
        F.countDistinct("fpath").alias("n_files"),
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("qty").cast("bigint").alias("qty_total"),
    )


# --------------------------------------------------------------------------
SUMLC_ROOT = os.path.join(_REPO_ROOT, "fixtures", "summary_lifecycle_demo")
_SUMLC_META = os.path.join(SUMLC_ROOT, "_meta.json")
# (path, mtime) of the last metadata emission the freshness guard verified
_sumlc_fresh_cache: dict[str, tuple] = {}


def _summary_lifecycle_table(spark):
    """Deterministic non-append lifecycle for the summary counters:
    s1 appends 3 rows across partitions a/b (2 files), s2 COW-deletes one
    row of partition a (rewrites a's file: 1 added, 1 deleted), s3
    cherry-picks a staged append (files stay owned by the STAGED snapshot
    — the case the pre-r11 owner-id counters reported as added=0)."""
    import json as _json

    from ..tables import SnapshotTable

    try:
        with open(_SUMLC_META) as f:
            ops = [s["operation"] for s in _json.load(f)["snapshots"]]
        # recorded in WALL order: the staged branch append (s2) commits
        # before the COW delete — a mismatch here meant the fixture was
        # rebuilt (new file UUIDs, git churn) on every process until r11
        if ops == ["append", "append", "delete", "cherrypick"]:
            return SnapshotTable(spark, SUMLC_ROOT)
    except Exception:
        pass
    shutil.rmtree(SUMLC_ROOT, ignore_errors=True)
    counter = itertools.count()
    ddl = "id bigint, part string"
    t = SnapshotTable.create(
        spark, SUMLC_ROOT, ddl, partition_by=["part"],
        clock=lambda: 1_700_000_000.0 + 60.0 * next(counter),
    )
    t.write(
        spark.createDataFrame([(1, "a"), (2, "a"), (3, "b")], ddl)
        .coalesce(1).sortWithinPartitions("id")
    )
    staged = t.write(
        spark.createDataFrame([(4, "c")], ddl).coalesce(1), branch="stage"
    )
    t.delete_where("id = 1")  # COW: rewrites partition a
    t.cherry_pick_snapshot(staged)
    return t


def _main_lineage_ids(t) -> set:
    """Snapshot ids on the MAIN head's parent chain — the set
    write_iceberg_metadata emits. Off-lineage snapshots (staged/WAP
    branch commits later cherry-picked) exist in the engine's snapshot
    list but are NOT part of an Iceberg metadata doc's snapshot log.

    Derived from the SAME walk the emitter uses (`SnapshotTable._lineage`
    / `_parent_id`, the source iceberg_meta.write_iceberg_metadata
    iterates) rather than re-deriving parent semantics from Snapshot
    dataclass records: `Snapshot(**s)` cannot distinguish an ABSENT
    parent_id (legacy dense history ⇒ parent is sid-1) from an explicit
    None (true root), so an independent walk could disagree with the
    emitter on a branched table whose explicit-None root has a retained
    lower-id snapshot — and the freshness guard must never disagree with
    the emitter it guards (ADVICE r13)."""
    meta = t._load()
    head = t._head(meta)
    if head is None:
        return set()
    return {s["snapshot_id"] for s in t._lineage(meta, head["snapshot_id"])}


def _summaries_match_engine(doc: dict, t) -> bool:
    """Freshness guard core (ADVICE r11 + r12): the emitted metadata doc
    must agree with the engine's CURRENT summary semantics, independently
    recomputed by snapshots_table — spec operation + added-* +
    total-records per snapshot id, AND the snapshot-id sets must be equal
    BOTH ways (a truncated/stale emission MISSING a lineage snapshot the
    engine has fails here too, not just per-snapshot counter drift on the
    ids it does carry). The comparison is against the MAIN-LINEAGE set,
    not the raw snapshot list: an off-lineage staged/WAP commit is
    engine-visible but never emitted, and comparing against it would fail
    every branched fixture forever (the r13 review caught exactly that —
    the lifecycle fixture re-emitted a byte-identical metadata version
    per process). A later-round change to write_iceberg_metadata's
    counters would otherwise leave a committed v1.metadata.json silently
    stale (the data side already has the _meta.json ops guard; this is
    its emission twin)."""
    from ..iceberg_meta import _OP_SUMMARY

    lineage = _main_lineage_ids(t)
    if {s["snapshot-id"] for s in doc.get("snapshots", [])} != lineage:
        return False
    st = {
        r.snapshot_id: r
        for r in t.snapshots_table().collect()
        if r.snapshot_id in lineage
    }
    for s in doc.get("snapshots", []):
        r = st[s["snapshot-id"]]
        su = s.get("summary", {})
        if (
            su.get("operation") != _OP_SUMMARY.get(r.operation, "overwrite")
            or int(su.get("added-data-files", -1)) != r.added_files
            or int(su.get("added-records", -1)) != r.added_rows
            or int(su.get("total-records", -1)) != r.total_records
        ):
            return False
    return True


@query(
    "q_meta_summary_lifecycle",
    # deterministic lifecycle -> the spec's parent-relative counters are a
    # CONSTANT relation (the q_meta_dml pattern): the COW rewrite shows
    # 1 added / 1 deleted file, and the cherry-pick — whose incoming dirs
    # stay owned by the STAGED snapshot — must still show its file as
    # added (the pre-r11 owner-id derivation reported 0 here)
    oracle="""
    SELECT * FROM (VALUES
      ('append', CAST(2 AS BIGINT), CAST(3 AS BIGINT), CAST(0 AS BIGINT), CAST(0 AS BIGINT), CAST(3 AS BIGINT)),
      ('delete', 1, 1, 1, 2, 2),
      ('append', 1, 1, 0, 0, 3))
    AS t(operation, added_files, added_records, deleted_files, deleted_records, total_records)
    """,
    tags=("meta:snapshot-summary", "tablemeta", "interop"),
)
def q_meta_summary_lifecycle(spark, sf_dir) -> DataFrame:
    """Parent-relative snapshot-summary counters over a NON-APPEND
    lifecycle (COW rewrite + cherry-pick), read from the EMITTED
    metadata.json — the surface external engines consume. Pins the r11
    semantics fix driver-visibly (the append-only summary fixture cannot
    catch owner-id-vs-parent-relative drift)."""
    import json as _json

    from ..iceberg_meta import discover_latest_metadata, write_iceberg_metadata

    t = _summary_lifecycle_table(spark)
    # the fixture's lifecycle is FIXED — reuse the committed emission when
    # present (re-emitting would mint a new metadata version per process:
    # the same rebuild-churn the _meta.json ops guard prevents for data)
    try:
        md = discover_latest_metadata(SUMLC_ROOT)
    except (FileNotFoundError, OSError):
        md = write_iceberg_metadata(t)
    with open(md) as f:
        doc = _json.load(f)

    def _emission_fresh(d) -> bool:
        ck = (md, os.path.getmtime(md))
        if _sumlc_fresh_cache.get("key") == ck:
            return True
        if not _summaries_match_engine(d, t):
            return False
        _sumlc_fresh_cache["key"] = ck
        return True

    if not _emission_fresh(doc):
        md = write_iceberg_metadata(t)
        with open(md) as f:
            doc = _json.load(f)
        _sumlc_fresh_cache["key"] = (md, os.path.getmtime(md))
    # spec operation values: append / replace / overwrite / delete —
    # a cherry-pick emits "append" (it re-applies an append), so the two
    # append rows are distinguished by their counters
    rows = [
        (
            s["summary"]["operation"],
            int(s["summary"]["added-data-files"]),
            int(s["summary"]["added-records"]),
            int(s["summary"].get("deleted-data-files", 0)),
            int(s["summary"].get("deleted-records", 0)),
            int(s["summary"]["total-records"]),
        )
        for s in doc["snapshots"]
    ]
    return spark.createDataFrame(
        rows,
        "operation string, added_files long, added_records long,"
        " deleted_files long, deleted_records long, total_records long",
    )
