"""Bucketed co-located join: result parity is covered by the oracle
harness; these tests pin the SCALE claim — the join itself runs with no
Exchange and no Sort on either input."""

from __future__ import annotations

import pytest

from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def bucketed_plan(spark):
    from emr_apache_iceberg_workshop_spark.plans.bucketed import bucketize

    bo = bucketize(spark, SF_SMOKE, "orders", "o_custkey")
    bc = bucketize(spark, SF_SMOKE, "customer", "c_custkey")
    # disable broadcast so the physical plan must be the bucketed SMJ
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        o = spark.table(bo).select("o_custkey", "o_totalprice")
        c = spark.table(bc).select("c_custkey", "c_mktsegment")
        joined = o.join(c, o.o_custkey == c.c_custkey)
        plan = joined._jdf.queryExecution().executedPlan().toString()
        rows = joined.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    return plan, rows


def test_bucketed_join_no_exchange_no_sort(bucketed_plan):
    plan, _ = bucketed_plan
    assert "SortMergeJoin" in plan
    assert "Exchange" not in plan, plan
    # bucketBy().sortBy() persists sorted buckets: SMJ needs no re-sort
    assert "Sort " not in plan.replace("SortMergeJoin", ""), plan


def test_bucketed_join_row_parity(spark, bucketed_plan):
    from emr_apache_iceberg_workshop_spark.catalog import load_table

    _, rows = bucketed_plan
    o = load_table(spark, SF_SMOKE, "orders").select("o_custkey")
    c = load_table(spark, SF_SMOKE, "customer").select("c_custkey")
    expected = o.join(c, o.o_custkey == c.c_custkey).count()
    assert rows == expected


def test_bucketize_idempotent(spark):
    from emr_apache_iceberg_workshop_spark.plans.bucketed import bucketize, _built

    t1 = bucketize(spark, SF_SMOKE, "orders", "o_custkey")
    built_before = dict(_built)
    t2 = bucketize(spark, SF_SMOKE, "orders", "o_custkey")
    assert t1 == t2 and _built == built_before
