"""`spark.read.format("eiws")` (Python Data Source) vs the native
SnapshotTable scan paths: the DSv2 reader is an INDEPENDENT pyarrow
implementation of the table format's read semantics, so agreement on
every fixture shape is a cross-implementation check of the format itself
(the argument of tests/test_iceberg_external_decode.py, applied to the
table layer instead of the Iceberg metadata)."""

from __future__ import annotations

import os

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _fx(name: str) -> str:
    return os.path.join(ROOT, "fixtures", name)


@pytest.fixture(scope="module")
def dsv2_spark(spark):
    from emr_apache_iceberg_workshop_spark.plans import tablemeta
    from emr_apache_iceberg_workshop_spark.sources import dsv2

    dsv2.register(spark)
    tablemeta._demo_table(spark)  # ensure the demo fixtures exist
    tablemeta._age_table(spark)
    return spark


def _native(spark, root):
    from emr_apache_iceberg_workshop_spark.tables import SnapshotTable

    return SnapshotTable(spark, root)


def _rows(df):
    return sorted(map(tuple, df.collect()))


# every committed fixture shape: MOR equality deletes, COW partition
# exclusions, positional deletes, renames, spec evolution, hidden
# transforms, rollback forks, relocated manifests after expiry, buckets
FIXTURES = [
    "tablemeta_demo",
    "dml_demo",
    "posdel_demo",
    "rename_demo",
    "spec_demo",
    "hidden_demo",
    "rollback_demo",
    "maint_policy_demo",
    "iceberg_v2_demo",
    "sql_demo",
    "cherrypick_demo",
    "expire_age_demo",
    "bucket_demo",
    "wap_demo",
]


@pytest.mark.parametrize("name", FIXTURES)
def test_full_scan_matches_native(dsv2_spark, name):
    root = _fx(name)
    if not os.path.exists(os.path.join(root, "_meta.json")):
        pytest.skip(f"fixture {name} not built in this checkout")
    a = _rows(_native(dsv2_spark, root).scan())
    b = _rows(dsv2_spark.read.format("eiws").option("table", root).load())
    assert a == b


def test_time_travel_and_refs(dsv2_spark):
    root = _fx("tablemeta_demo")
    t = _native(dsv2_spark, root)
    r = dsv2_spark.read.format("eiws").option("table", root)
    assert _rows(t.scan_at(2)) == _rows(r.option("snapshot-id", "2").load())
    assert _rows(t.scan_at("audit")) == _rows(r.option("snapshot-id", "audit").load())
    assert _rows(t.scan_as_of(1700000070)) == _rows(
        r.option("as-of-timestamp", "1700000070").load()
    )


def test_branch_read(dsv2_spark):
    root = _fx("wap_demo")
    t = _native(dsv2_spark, root)
    got = _rows(
        dsv2_spark.read.format("eiws")
        .option("table", root)
        .option("branch", "audit")
        .load()
    )
    assert got == _rows(t.scan("audit"))
    assert got != _rows(t.scan())  # staged branch differs from main


def test_incremental_matches_and_raises_on_overwrite(dsv2_spark):
    root = _fx("tablemeta_demo")
    t = _native(dsv2_spark, root)
    r = dsv2_spark.read.format("eiws").option("table", root)
    assert _rows(t.scan_incremental(1, 2)) == _rows(
        r.option("start-snapshot-id", "1").option("end-snapshot-id", "2").load()
    )
    # (1, 3] crosses the MOR merge commit: both paths must refuse
    with pytest.raises(Exception, match="non-append"):
        t.scan_incremental(1, 3).collect()
    with pytest.raises(Exception, match="non-append"):
        r.option("start-snapshot-id", "1").option("end-snapshot-id", "3").load().collect()


def test_load_path_form(dsv2_spark):
    root = _fx("tablemeta_demo")
    a = _rows(_native(dsv2_spark, root).scan())
    assert a == _rows(dsv2_spark.read.format("eiws").load(root))


def test_filtered_read_matches_and_prunes_files(dsv2_spark):
    from emr_apache_iceberg_workshop_spark.sources.dsv2 import SnapshotTableReader

    root = _fx("tablemeta_demo")
    t = _native(dsv2_spark, root)
    df = (
        dsv2_spark.read.format("eiws")
        .option("table", root)
        .load()
        .filter("category = 'a' AND qty >= 20")
    )
    assert _rows(df) == _rows(t.scan().filter("category = 'a' AND qty >= 20"))
    # planner-level check: a pushed partition filter drops non-matching
    # files before Spark schedules anything
    fields = [(f.name, f.dataType.simpleString()) for f in t.schema().fields]
    rd = SnapshotTableReader({"table": root}, fields)
    all_files = len(rd.partitions())
    from pyspark.sql.datasource import EqualTo

    rd2 = SnapshotTableReader({"table": root}, fields)
    rd2.pushFilters([EqualTo(("category",), "a")])
    pruned = len(rd2.partitions())
    assert 0 < pruned < all_files
    # bounds pruning: qty > every manifest upper bound plans zero files
    from pyspark.sql.datasource import GreaterThan

    rd3 = SnapshotTableReader({"table": root}, fields)
    rd3.pushFilters([GreaterThan(("qty",), 10_000)])
    # every data file pruned: the plan is the single read-nothing
    # sentinel (the batch API requires >= 1 partition)
    assert [s.path for s in rd3.partitions()] == [""]


def test_unknown_ref_raises(dsv2_spark):
    root = _fx("tablemeta_demo")
    with pytest.raises(Exception, match="unknown"):
        (
            dsv2_spark.read.format("eiws")
            .option("table", root)
            .option("snapshot-id", "no-such-tag")
            .load()
            .collect()
        )


def test_missing_table_option_raises(dsv2_spark):
    with pytest.raises(Exception, match="eiws reader needs"):
        dsv2_spark.read.format("eiws").load("/no/such/table").collect()
