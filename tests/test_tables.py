"""SnapshotTable (Iceberg-semantics stand-in) and Avro converter tests."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F
from pyspark.sql import types as T

from emr_apache_iceberg_workshop_spark.schema_utils import avro_schema_to_spark_schema
from emr_apache_iceberg_workshop_spark.tables import SnapshotTable


@pytest.fixture()
def table(spark, tmp_path):
    return SnapshotTable.create(
        spark, str(tmp_path / "t"), "id bigint, v string, part string", partition_by=["part"]
    )


def test_append_overwrite_incremental_history(spark, table):
    df = lambda rows: spark.createDataFrame(rows, "id bigint, v string, part string")  # noqa: E731
    s1 = table.write(df([(1, "a", "x"), (2, "b", "y")]))
    s2 = table.write(df([(3, "c", "x")]))
    assert (s1, s2) == (1, 2)
    assert table.scan().count() == 3
    assert {r["id"] for r in table.scan_incremental(s1, s2).collect()} == {3}
    assert table.scan_incremental(None, s2).count() == 3

    hist = table.history().orderBy(F.desc("made_current_at")).limit(1).collect()
    assert hist[0]["snapshot_id"] == 2  # O1 top-1 pattern

    s3 = table.write(df([(9, "z", "x")]), mode="overwrite")
    assert table.scan().count() == 1
    with pytest.raises(ValueError):  # Iceberg parity: appends-only incremental
        table.scan_incremental(s2, s3).count()


def test_merge_upsert_and_partition_pruning(spark, table):
    df = lambda rows: spark.createDataFrame(rows, "id bigint, v string, part string")  # noqa: E731
    table.write(df([(1, "a", "x"), (2, "b", "y")]))
    table.merge(df([(2, "B", "y"), (3, "c", "z")]), keys=["id"])
    state = {r["id"]: r["v"] for r in table.scan().collect()}
    assert state == {1: "a", 2: "B", 3: "c"}

    # partition pruning reaches the physical plan on the partition column
    plan = table.scan().filter(F.col("part") == "y")._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(part" in plan


def test_empty_table_scan(spark, tmp_path):
    t = SnapshotTable.create(spark, str(tmp_path / "e"), "id bigint, v string")
    assert t.scan().count() == 0
    assert t.latest_snapshot_id() is None


def test_avro_converter_parity():
    # shapes from bronze-silver.py:22-57 (SURVEY.md §1.2)
    schema = avro_schema_to_spark_schema(
        {
            "fields": [
                {"name": "ts", "type": {"type": "long", "logicalType": "timestamp-micros"}},
                {"name": "d", "type": {"type": "int", "logicalType": "date"}},
                {"name": "k", "type": "long"},
                {"name": "q", "type": "int"},
                {"name": "p", "type": "double"},
                {"name": "f", "type": "float"},
                {"name": "b", "type": "boolean"},
                {"name": "s", "type": ["null", "string"]},
                {"name": "u", "type": "weird_unknown"},
            ]
        }
    )
    got = {f.name: (f.dataType, f.nullable) for f in schema.fields}
    assert got["ts"] == (T.TimestampType(), False)
    assert got["d"] == (T.DateType(), False)
    assert got["k"] == (T.LongType(), False)
    assert got["q"] == (T.IntegerType(), False)
    assert got["p"] == (T.DoubleType(), False)
    assert got["f"] == (T.FloatType(), False)
    assert got["b"] == (T.BooleanType(), False)
    assert got["s"] == (T.StringType(), True)  # [null, T] union → nullable
    assert got["u"] == (T.StringType(), False)  # unknown → string fallback


def test_time_travel_and_maintenance(spark, tmp_path):
    from emr_apache_iceberg_workshop_spark.tables import SnapshotTable

    root = str(tmp_path / "tt_table")
    t = SnapshotTable.create(spark, root, "k long, v string")
    s1 = t.write(spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string"))
    s2 = t.write(spark.createDataFrame([(3, "c")], "k long, v string"))

    # time travel: state AS OF s1 excludes the second append
    assert {r.k for r in t.scan_at(s1).collect()} == {1, 2}
    assert {r.k for r in t.scan_at(s2).collect()} == {1, 2, 3}

    # compaction: same rows, new snapshot, operation recorded
    s3 = t.compact(target_partitions=1)
    assert {r.k for r in t.scan().collect()} == {1, 2, 3}
    ops = {r.snapshot_id: r.operation for r in t.history().collect()}
    assert ops[s3] == "compact"
    # pre-compaction snapshots still readable (files not yet expired)
    assert {r.k for r in t.scan_at(s1).collect()} == {1, 2}

    # expiration: only the latest survives; old reads now fail
    expired = t.expire_snapshots(keep_last=1)
    assert set(expired) == {s1, s2}
    assert {r.k for r in t.scan().collect()} == {1, 2, 3}
    import pytest as _pytest

    with _pytest.raises(ValueError):
        t.scan_at(s1)
    # expired data dirs are gone from disk
    import os as _os

    assert not _os.path.exists(_os.path.join(root, "data/s1"))


def test_schema_evolution_add_drop_and_time_travel(spark, tmp_path):
    """Iceberg-style metadata-only evolution: added columns read as NULL in
    old files, dropped columns vanish without rewrites, time travel sees
    the schema as of the snapshot, incremental reads skip the metadata-only
    commit."""
    from emr_apache_iceberg_workshop_spark.tables import SnapshotTable

    root = str(tmp_path / "t")
    t = SnapshotTable.create(spark, root, "id bigint, category string")
    t.write(spark.createDataFrame([(1, "a"), (2, "b")], "id bigint, category string"))
    s1 = t.latest_snapshot_id()

    s_evolve = t.evolve_schema(add={"score": "double"})
    # old files project the new column as NULL
    rows = {r.id: r.score for r in t.scan().collect()}
    assert rows == {1: None, 2: None}

    # new writes carry the new column; mixed old+new scan works
    t.write(spark.createDataFrame([(3, "c", 0.5)], "id bigint, category string, score double"))
    s2 = t.latest_snapshot_id()
    rows = {r.id: r.score for r in t.scan().collect()}
    assert rows == {1: None, 2: None, 3: 0.5}

    # incremental read across the evolve commit: only the appended rows
    inc = t.scan_incremental(s1, s2)
    assert [r.id for r in inc.collect()] == [3]

    # time travel: snapshot before the evolve has the ORIGINAL schema
    assert "score" not in t.scan_at(s1).columns
    assert "score" in t.scan_at(s2).columns

    # drop: metadata-only, column gone from scans, data untouched
    t.evolve_schema(drop=["category"])
    assert t.scan().columns == ["id", "score"]
    assert t.scan().count() == 3

    # guard rails
    import pytest as _pytest

    with _pytest.raises(ValueError):
        t.evolve_schema(add={"id": "bigint"})
    with _pytest.raises(ValueError):
        t.evolve_schema(drop=["nope"])
    assert s_evolve > s1
