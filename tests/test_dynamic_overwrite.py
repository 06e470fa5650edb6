"""Dynamic partition overwrite (Iceberg `INSERT OVERWRITE` with
`partitionOverwriteMode=dynamic`, Spark's `INSERT OVERWRITE` dynamic
semantics): replace exactly the partitions present in the batch via the
COW exclusion machinery, on both the native `overwrite_partitions()` path
and the DSv2 `mode("overwrite").option("overwrite-mode", "dynamic")`
format path.
"""

from __future__ import annotations

import glob
import json
import os

import pytest

from emr_apache_iceberg_workshop_spark.tables import CommitConflict, SnapshotTable

DDL = "id bigint, category string, qty bigint"


def _mk(spark, rows):
    return spark.createDataFrame(rows, DDL)


def _state(t):
    return sorted((r.id, r.category, r.qty) for r in t.scan().collect())


def _seed(spark, tmp_path, name="t", partition_by=("category",), props=None):
    t = SnapshotTable.create(
        spark, str(tmp_path / name), DDL,
        partition_by=list(partition_by), properties=props or {},
    )
    t.write(_mk(spark, [(1, "a", 10), (2, "b", 20), (3, "c", 30)]))
    t.write(_mk(spark, [(4, "a", 40), (5, "b", 50)]))
    return t


def test_replaces_only_batch_partitions(spark, tmp_path):
    t = _seed(spark, tmp_path)
    untouched = sorted(glob.glob(t.root + "/data/*/category=c/*.parquet"))
    sig = [(f, os.path.getsize(f), open(f, "rb").read()) for f in untouched]
    pre = t.latest_snapshot_id()
    sid = t.overwrite_partitions(_mk(spark, [(9, "a", 99)]))
    assert _state(t) == [(2, "b", 20), (3, "c", 30), (5, "b", 50), (9, "a", 99)]
    # untouched partitions byte-identical; replaced rows still time-travelable
    assert [(f, os.path.getsize(f), open(f, "rb").read()) for f in untouched] == sig
    assert sorted(r.id for r in t.scan_at(pre).collect()) == [1, 2, 3, 4, 5]
    snap = next(s for s in t.snapshots() if s.snapshot_id == sid)
    assert snap.operation == "dynamic-overwrite"
    assert snap.summary["replaced_partitions"] == 1


def test_dsv2_dynamic_write_parity(spark, tmp_path):
    from emr_apache_iceberg_workshop_spark.sources import dsv2

    t = _seed(spark, tmp_path, "fmt")
    dsv2.register(spark)
    _mk(spark, [(9, "a", 99), (8, "b", 88)]).write.format(dsv2.FORMAT_NAME).mode(
        "overwrite"
    ).option("table", t.root).option("overwrite-mode", "dynamic").save()
    expect = [(3, "c", 30), (8, "b", 88), (9, "a", 99)]
    assert _state(t) == expect
    # independent read path agrees on the masked state
    got = sorted(
        (r.id, r.category, r.qty)
        for r in spark.read.format(dsv2.FORMAT_NAME).option("table", t.root).load().collect()
    )
    assert got == expect
    snap = t.snapshots()[-1]
    assert snap.operation == "dynamic-overwrite"
    # plain .mode("overwrite") without the option stays a FULL overwrite
    _mk(spark, [(1, "z", 1)]).write.format(dsv2.FORMAT_NAME).mode("overwrite").option(
        "table", t.root
    ).save()
    assert _state(t) == [(1, "z", 1)]


def test_hidden_partition_dynamic_overwrite(spark, tmp_path):
    t = SnapshotTable.create(
        spark, str(tmp_path / "h"), DDL, partition_by=["bucket(4, id)"]
    )
    t.write(_mk(spark, [(i, "s", i) for i in range(12)]))
    before = _state(t)
    # ids 0 and 4: whatever buckets they hash to get replaced WHOLE —
    # every other row in those buckets disappears, other buckets survive
    t.overwrite_partitions(_mk(spark, [(0, "n", 100), (4, "n", 104)]))
    from emr_apache_iceberg_workshop_spark.partitioning import iceberg_bucket

    import pyspark.sql.types as _T

    replaced = {iceberg_bucket(0, 4, _T.LongType()), iceberg_bucket(4, 4, _T.LongType())}
    survivors = [
        r for r in before if iceberg_bucket(r[0], 4, _T.LongType()) not in replaced
    ]
    assert _state(t) == sorted(survivors + [(0, "n", 100), (4, "n", 104)])


def test_mask_file_above_cap(spark, tmp_path):
    t = SnapshotTable.create(
        spark, str(tmp_path / "cap"), DDL, partition_by=["category"],
        properties={"write.cow.scope-cap": "2"},
    )
    t.write(_mk(spark, [(i, f"c{i % 8}", i) for i in range(32)]))
    t.overwrite_partitions(_mk(spark, [(100 + j, f"c{j}", 0) for j in range(3)]))
    with open(os.path.join(t.root, "_meta.json")) as fh:
        snap = json.load(fh)["snapshots"][-1]
    assert snap.get("mask_file"), "above-cap overwrite must use a mask file"
    assert all(
        not (isinstance(e, dict) and e.get("exclude"))
        for e in snap["active_dirs"]
    ), "no inline tuple list may land in metadata above the cap"
    expect = sorted(
        [(i, f"c{i % 8}", i) for i in range(32) if i % 8 not in (0, 1, 2)]
        + [(100 + j, f"c{j}", 0) for j in range(3)]
    )
    assert _state(t) == expect
    # the DSv2 dir-listing path has no mask-file writer: it must refuse
    from emr_apache_iceberg_workshop_spark.sources import dsv2

    dsv2.register(spark)
    with pytest.raises(Exception, match="scope-cap"):
        _mk(spark, [(200 + j, f"c{j}", 1) for j in range(3)]).write.format(
            dsv2.FORMAT_NAME
        ).mode("overwrite").option("table", t.root).option(
            "overwrite-mode", "dynamic"
        ).save()
    assert _state(t) == expect  # refused write left no trace


def test_unpartitioned_degenerates_to_full(spark, tmp_path):
    t = SnapshotTable.create(spark, str(tmp_path / "u"), DDL)
    t.write(_mk(spark, [(1, "a", 1), (2, "b", 2)]))
    t.overwrite_partitions(_mk(spark, [(9, "z", 9)]))
    assert _state(t) == [(9, "z", 9)]


def test_empty_batch_is_a_noop_commit(spark, tmp_path):
    t = _seed(spark, tmp_path, "e")
    before = _state(t)
    t.overwrite_partitions(_mk(spark, []))
    assert _state(t) == before


def test_deletes_survive_on_untouched_partitions(spark, tmp_path):
    t = SnapshotTable.create(
        spark, str(tmp_path / "mor"), DDL, partition_by=["category"],
        properties={"write.merge.mode": "merge-on-read"},
    )
    t.write(_mk(spark, [(1, "a", 10), (2, "b", 20), (3, "b", 30)]))
    t.merge(_mk(spark, [(2, "b", 21)]), keys=["id"])  # MOR delete on id=2
    t.overwrite_partitions(_mk(spark, [(9, "a", 99)]))
    # the delete file still suppresses the OLD id=2 row in untouched b
    assert _state(t) == [(2, "b", 21), (3, "b", 30), (9, "a", 99)]


def test_incremental_and_changelog_refuse(spark, tmp_path):
    t = _seed(spark, tmp_path, "inc")
    lo = t.latest_snapshot_id()
    sid = t.overwrite_partitions(_mk(spark, [(9, "a", 99)]))
    with pytest.raises(ValueError):
        t.scan_incremental(lo, sid).collect()
    with pytest.raises(ValueError):
        t.changes(lo, sid).collect()


def test_stale_base_refused(spark, tmp_path):
    t = _seed(spark, tmp_path, "race")
    t2 = SnapshotTable(spark, t.root)
    df = _mk(spark, [(9, "a", 99)])
    # t2 commits first; t's staged overwrite was computed against a stale
    # base and must refuse (non-append rule)
    meta = t._load()
    stage, part_names = t._stage_data_dir(df, meta)
    t2.write(_mk(spark, [(6, "c", 60)]))
    with pytest.raises(CommitConflict):
        t.commit_staged(stage, part_names, mode="overwrite_dynamic", meta=meta)


def test_facade_insert_overwrite_dynamic(spark, tmp_path):
    """INSERT OVERWRITE through the SQL facade honors the
    write.overwrite-mode=dynamic table property."""
    from emr_apache_iceberg_workshop_spark.sqlext import SqlCatalog

    cat = SqlCatalog(spark, str(tmp_path / "wh"))
    cat.sql(
        "CREATE TABLE inv (id BIGINT, category STRING, qty BIGINT) "
        "PARTITIONED BY (category) "
        "TBLPROPERTIES ('write.overwrite-mode'='dynamic')"
    )
    cat.sql("INSERT INTO inv VALUES (1, 'a', 10), (2, 'b', 20), (3, 'c', 30)")
    cat.sql("INSERT OVERWRITE inv VALUES (9, 'a', 99)")
    got = sorted(
        (r.id, r.category, r.qty) for r in cat.sql("SELECT * FROM inv").collect()
    )
    assert got == [(2, "b", 20), (3, "c", 30), (9, "a", 99)]
    t = cat.table("inv")
    assert t.snapshots()[-1].operation == "dynamic-overwrite"
