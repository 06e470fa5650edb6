"""Hidden-partitioning transforms (Iceberg partition specs): parse,
write-layout, scan round-trip, manifest pruning, and DML interplay.

Iceberg semantics under test (spec: partitioning.py): partition values
are DERIVED from source columns — `days(ts)`, `bucket(N, id)`,
`truncate(W, s)` — data files keep the source column, directories carry
the transform value, and predicates on the SOURCE column prune files
through the transform."""

from __future__ import annotations

import datetime as dt
import os

import pytest
from pyspark.sql import types as T

from emr_apache_iceberg_workshop_spark.partitioning import (
    PartitionField,
    field_expr,
    parse_field,
    parse_spec,
    prune_keep,
)
from emr_apache_iceberg_workshop_spark.tables import SnapshotTable


# -- parsing ---------------------------------------------------------------
def test_parse_identity_and_transforms():
    assert parse_field("ts") == PartitionField("identity", "ts", None, "ts")
    assert parse_field("identity(ts)") == PartitionField("identity", "ts", None, "ts")
    assert parse_field("days(ts)") == PartitionField("days", "ts", None, "ts_day")
    assert parse_field("day(ts)") == PartitionField("days", "ts", None, "ts_day")
    assert parse_field("hours(ts)") == PartitionField("hours", "ts", None, "ts_hour")
    assert parse_field("months(ts)") == PartitionField("months", "ts", None, "ts_month")
    assert parse_field("years(ts)") == PartitionField("years", "ts", None, "ts_year")
    assert parse_field("bucket(8, user_id)") == PartitionField(
        "bucket", "user_id", 8, "user_id_bucket"
    )
    assert parse_field("truncate(4, name)") == PartitionField(
        "truncate", "name", 4, "name_trunc"
    )


def test_parse_rejects_bad_specs():
    for bad in ["days()", "bucket(0, x)", "bucket(x)", "frobnicate(ts)", "a b"]:
        with pytest.raises(ValueError):
            parse_field(bad)
    with pytest.raises(ValueError):
        parse_spec(["days(ts)", "day(ts)"])  # duplicate derived name


# -- transform expressions (Spark side) ------------------------------------
def test_field_exprs(spark):
    schema = T.StructType.fromDDL("ts timestamp, n bigint, s string")
    df = spark.createDataFrame(
        [
            (dt.datetime(2024, 3, 5, 14, 30), 17, "abcdef"),
            (dt.datetime(2023, 12, 31, 23, 59), -3, "ab"),
            (None, None, None),
        ],
        schema,
    )
    out = df.select(
        field_expr(parse_field("days(ts)"), schema).alias("d"),
        field_expr(parse_field("hours(ts)"), schema).alias("h"),
        field_expr(parse_field("months(ts)"), schema).alias("m"),
        field_expr(parse_field("years(ts)"), schema).alias("y"),
        field_expr(parse_field("truncate(5, n)"), schema).alias("tn"),
        field_expr(parse_field("truncate(3, s)"), schema).alias("ts_"),
        field_expr(parse_field("bucket(8, n)"), schema).alias("b"),
    ).collect()
    r0, r1, r2 = out
    assert (r0.d, r0.h, r0.m, r0.y) == (dt.date(2024, 3, 5), "2024-03-05-14", "2024-03", 2024)
    assert r0.tn == 15 and r0.ts_ == "abc"
    assert 0 <= r0.b < 8
    # Iceberg floor semantics for negative ints: -3 → -5 (not 0 or -3)
    assert r1.tn == -5 and r1.ts_ == "ab"
    # nulls stay in the null partition for every transform
    assert all(v is None for v in (r2.d, r2.h, r2.m, r2.y, r2.tn, r2.ts_, r2.b))


# -- prune_keep (manifest-side) --------------------------------------------
def test_prune_keep_monotone_and_bucket():
    days = parse_field("days(ts)")
    assert prune_keep(days, "2024-03-05", "2024-03-05 10:00:00", "2024-03-06 00:00:00")
    assert not prune_keep(days, "2024-03-04", "2024-03-05 10:00:00", "2024-03-06 00:00:00")
    assert not prune_keep(days, None, "2024-03-05 10:00:00", "2024-03-06 00:00:00")
    tr = parse_field("truncate(10, n)")
    assert prune_keep(tr, "20", 25, 31)
    assert not prune_keep(tr, "40", 25, 31)
    yr = parse_field("years(ts)")
    assert prune_keep(yr, "2024", dt.datetime(2024, 1, 1), dt.datetime(2024, 2, 1))
    assert not prune_keep(yr, "2023", dt.datetime(2024, 1, 1), dt.datetime(2024, 2, 1))
    bk = parse_field("bucket(8, n)")
    # ranges never prune a hash bucket; equality prunes via bucket_of
    assert prune_keep(bk, "3", 5, 9)
    assert prune_keep(bk, "3", 7, 7, bucket_of=lambda v: 3)
    assert not prune_keep(bk, "4", 7, 7, bucket_of=lambda v: 3)


def test_prune_keep_one_sided_bounds():
    """One-sided predicates (lo=None or hi=None) must prune in the right
    domain for every transform — truncate(string) with lo=None used to
    crash on int(dir_value)."""
    tr_s = parse_field("truncate(4, s)")
    assert prune_keep(tr_s, "abcd", None, "abzz")
    assert not prune_keep(tr_s, "zzzz", None, "abzz")
    assert prune_keep(tr_s, "abcd", "abca", None)
    assert not prune_keep(tr_s, "aaaa", "abcd", None)
    tr_i = parse_field("truncate(10, n)")
    assert prune_keep(tr_i, "20", None, 25)
    assert not prune_keep(tr_i, "40", None, 25)
    assert prune_keep(tr_i, "40", 35, None)
    assert not prune_keep(tr_i, "20", 35, None)
    days = parse_field("days(ts)")
    assert prune_keep(days, "2024-03-05", None, "2024-03-05 00:00:00")
    assert not prune_keep(days, "2024-03-06", None, "2024-03-05 23:00:00")
    # fully unbounded predicate prunes nothing (non-null partitions)
    assert prune_keep(tr_s, "abcd", None, None)
    assert prune_keep(tr_i, "40", None, None)


# -- table round-trip ------------------------------------------------------
@pytest.fixture()
def hidden_table(spark, tmp_path):
    root = os.path.join(str(tmp_path), "ht")
    ddl = "id bigint, ts timestamp, user_id bigint, v string"
    t = SnapshotTable.create(
        spark, root, ddl, partition_by=["days(ts)", "bucket(4, user_id)"]
    )
    rows = [
        (i, dt.datetime(2024, 1, 1 + (i % 5), i % 24), i % 10, f"v{i}")
        for i in range(40)
    ]
    t.write(spark.createDataFrame(rows, ddl).coalesce(1))
    return t, rows, ddl


def test_hidden_partition_layout_and_scan(spark, hidden_table):
    t, rows, ddl = hidden_table
    # physical layout: ts_day=YYYY-MM-DD/user_id_bucket=N directories
    s1 = os.path.join(t.root, "data", "s1")
    days = sorted(d for d in os.listdir(s1) if d.startswith("ts_day="))
    assert days and all("=" in d for d in days)
    sub = os.listdir(os.path.join(s1, days[0]))
    assert any(x.startswith("user_id_bucket=") for x in sub)
    # scan: table schema exactly (no derived columns), all rows back
    got = t.scan()
    assert got.columns == ["id", "ts", "user_id", "v"]
    assert got.count() == 40
    assert {r.id for r in got.collect()} == set(range(40))
    # data files keep the source columns ts / user_id
    assert got.filter("user_id = 3").count() == len([r for r in rows if r[2] == 3])


def test_hidden_partition_pruning(spark, hidden_table):
    t, rows, _ = hidden_table
    # days(ts) range: only 2024-01-02..03 files survive planning
    kept, total = t.plan_files("ts", "2024-01-02 00:00:00", "2024-01-03 23:59:59")
    assert total > len(kept) > 0
    for _rel, f in kept:
        assert f["partition"]["ts_day"] in ("2024-01-02", "2024-01-03")
    df = t.scan_pruned("ts", "2024-01-02 00:00:00", "2024-01-03 23:59:59")
    want = len([r for r in rows if r[1].day in (2, 3)])
    assert df.filter("ts >= '2024-01-02' and ts < '2024-01-04'").count() == want
    # bucket(4, user_id) equality: keeps ~1/4 of files, correct rows
    kept_b, total_b = t.plan_files("user_id", 3, 3)
    assert 0 < len(kept_b) < total_b
    got = t.scan_pruned("user_id", 3, 3).filter("user_id = 3").count()
    assert got == len([r for r in rows if r[2] == 3])


def test_hidden_partition_dml_cow(spark, hidden_table):
    t, rows, _ = hidden_table
    # row-level DELETE under a transformed spec: partition-scoped COW
    t.delete_where("id < 8")
    assert t.scan().count() == 32
    assert t.scan().filter("id < 8").count() == 0
    summ = t.snapshots()[-1].summary
    assert summ.get("scoped_partitions", 0) > 0
    # UPDATE touches only matching partitions and preserves others
    t.update_where("id = 20", {"v": "'patched'"})
    got = {r.id: r.v for r in t.scan().collect()}
    assert got[20] == "patched" and got[30] == "v30"


def test_hidden_partition_merge(spark, tmp_path):
    root = os.path.join(str(tmp_path), "mt")
    ddl = "id bigint, ts timestamp, v string"
    t = SnapshotTable.create(
        spark, root, ddl, partition_by=["days(ts)"],
        properties={"write.merge.mode": "copy-on-write"},
    )
    base = [(i, dt.datetime(2024, 2, 1 + i % 3), f"v{i}") for i in range(12)]
    t.write(spark.createDataFrame(base, ddl).coalesce(1))
    src = spark.createDataFrame(
        [(1, dt.datetime(2024, 2, 2), "patched"), (99, dt.datetime(2024, 2, 9), "new")], ddl
    )
    t.merge(src, keys=["id"])
    got = {r.id: r.v for r in t.scan().collect()}
    assert got[1] == "patched" and got[99] == "new" and len(got) == 13
    assert t.snapshots()[-1].summary["mode"] == "copy-on-write"


def test_hidden_partition_schema_evolution_guard(spark, hidden_table):
    t, _, _ = hidden_table
    with pytest.raises(ValueError, match="partition source"):
        t.evolve_schema(drop=["ts"])


def test_create_rejects_unknown_source(spark, tmp_path):
    with pytest.raises(ValueError, match="unknown partition source"):
        SnapshotTable.create(
            spark, os.path.join(str(tmp_path), "bad"), "id bigint",
            partition_by=["days(nope)"],
        )


def test_iceberg_bucket_spec_vectors():
    """The bucket hash is pinned to the PUBLIC Iceberg spec's Appendix-B
    test vectors (and murmur3_x86_32's own public vectors), so emitted
    bucket[N] specs are exchangeable with any Iceberg writer/reader."""
    import struct

    import numpy as np

    from emr_apache_iceberg_workshop_spark.partitioning import (
        _np_murmur3_long,
        iceberg_bucket,
        murmur3_32,
    )
    from pyspark.sql import types as T

    # murmur3_x86_32 public vectors
    assert murmur3_32(b"") == 0
    assert murmur3_32(b"hello") & 0xFFFFFFFF == 0x248BFA47
    # Iceberg spec Appendix B ("32-bit Hash Requirements")
    assert murmur3_32(struct.pack("<q", 34)) == 2017239379  # int/long 34
    assert murmur3_32(b"iceberg") == 1210000089  # string
    assert murmur3_32(struct.pack("<q", 17486)) == -653330422  # date 2017-11-16
    assert murmur3_32(struct.pack("<q", 1510871468000000)) == -2047944441  # ts
    assert murmur3_32(b"\x05\x8c") == -500754589  # decimal 14.20 unscaled 1420
    # bucket = (hash & maxint) % N, null → null partition
    assert iceberg_bucket(34, 16, T.LongType()) == 2017239379 % 16
    assert iceberg_bucket("iceberg", 16, T.StringType()) == 1210000089 % 16
    assert iceberg_bucket(None, 16, T.LongType()) is None
    assert iceberg_bucket(dt.date(2017, 11, 16), 1000, T.DateType()) == (
        (-653330422 & 0x7FFFFFFF) % 1000
    )
    assert iceberg_bucket(
        dt.datetime(2017, 11, 16, 22, 31, 8), 1000, T.TimestampNTZType()
    ) == ((-2047944441 & 0x7FFFFFFF) % 1000)
    # the vectorized write-path hash agrees with the scalar one
    v = np.array([34, 17486, -1, 0, 2**62], dtype="int64")
    for x, h in zip(v, _np_murmur3_long(v)):
        assert int(h) == murmur3_32(struct.pack("<q", int(x))) & 0xFFFFFFFF


def test_iceberg_meta_emits_bucket_spec(spark, hidden_table):
    """bucket(4, user_id) specs emit native Iceberg metadata: the spec
    declares bucket[4] and every manifest partition value matches the
    spec-pinned hash of the rows actually in that file."""
    import json

    from emr_apache_iceberg_workshop_spark.iceberg_meta import (
        read_data_files,
        write_iceberg_metadata,
    )
    from emr_apache_iceberg_workshop_spark.partitioning import iceberg_bucket
    from pyspark.sql import types as T

    t, rows, _ = hidden_table  # spec: days(ts), bucket(4, user_id)
    md = write_iceberg_metadata(t)
    with open(md) as f:
        doc = json.load(f)
    tf = {p["name"]: p["transform"] for p in doc["partition-spec"]}
    assert tf["user_id_bucket"] == "bucket[4]"
    files = read_data_files(md)
    assert files
    total = 0
    for fe in files:
        want_bucket = fe["partition"]["user_id_bucket"]
        got = spark.read.parquet(fe["file_path"]).select("user_id").collect()
        total += len(got)
        for r in got:
            assert iceberg_bucket(r.user_id, 4, T.LongType()) == want_bucket
    assert total == len(rows)


def test_iceberg_meta_emits_monotone_transforms(spark, tmp_path):
    """Native Iceberg v1 emission of a days(ts)+truncate(2,v) table: the
    spec declares Iceberg's transform names and the manifests carry
    Iceberg's canonical partition representations (day as days-since-epoch
    via the Avro date logical type, truncate as the source type)."""
    import json

    from emr_apache_iceberg_workshop_spark.iceberg_meta import (
        read_data_files,
        write_iceberg_metadata,
    )

    root = os.path.join(str(tmp_path), "mono")
    ddl = "id bigint, ts timestamp, v string"
    t = SnapshotTable.create(
        spark, root, ddl, partition_by=["days(ts)", "truncate(2, v)"]
    )
    rows = [
        (1, dt.datetime(2024, 1, 1, 5), "alpha"),
        (2, dt.datetime(2024, 1, 2, 6), "altair"),
        (3, dt.datetime(2024, 1, 2, 7), "beta"),
    ]
    t.write(spark.createDataFrame(rows, ddl).coalesce(1))
    md_path = write_iceberg_metadata(t)
    with open(md_path) as f:
        doc = json.load(f)
    assert doc["partition-spec"] == [
        {"name": "ts_day", "transform": "day", "source-id": 2, "field-id": 1000},
        {"name": "v_trunc", "transform": "truncate[2]", "source-id": 3, "field-id": 1001},
    ]
    files = read_data_files(md_path)
    parts = sorted(
        (f["partition"]["ts_day"], f["partition"]["v_trunc"]) for f in files
    )
    epoch = dt.date(1970, 1, 1).toordinal()
    d1 = dt.date(2024, 1, 1).toordinal() - epoch
    d2 = dt.date(2024, 1, 2).toordinal() - epoch
    assert parts == [(d1, "al"), (d2, "al"), (d2, "be")]
    # hour/month/year offsets from 1970 (Iceberg canonical ints)
    from emr_apache_iceberg_workshop_spark.iceberg_meta import _partition_value

    assert _partition_value("2024-01-02-05", "int", "hours") == (d2 * 24) + 5
    assert _partition_value("2024-01", "int", "months") == (2024 - 1970) * 12
    assert _partition_value("2024", "int", "years") == 54


def test_export_snapshot_transformed(spark, tmp_path, hidden_table):
    import duckdb

    from tools.export_snapshot import export_snapshot

    t, rows, _ = hidden_table
    out = os.path.join(str(tmp_path), "exp")
    man = export_snapshot(t, out)
    assert man["partition_dirs"] == ["ts_day", "user_id_bucket"]
    con = duckdb.connect()
    con.execute(open(os.path.join(out, "view.sql")).read())
    cnt, ids = con.execute(
        "SELECT COUNT(*), SUM(id) FROM exported"
    ).fetchone()
    assert cnt == 40 and ids == sum(range(40))
    # partition dirs exist in the export and prune in the external engine
    n = con.execute(
        f"""SELECT COUNT(*) FROM read_parquet('{man["data_glob"]}',
            hive_partitioning = true) WHERE ts_day = DATE '2024-01-02'"""
    ).fetchone()[0]
    assert n == len([r for r in rows if r[1].day == 2])
