"""Bucketed-table co-located join: proves the engine can eliminate the
shuffle for repeated large-table joins — at 100 TB, bucketing lineitem and
orders on the join key turns every orderkey join into a zero-exchange
sort-merge (the reference's Iceberg tables would use hidden partitioning +
sorted write for the same effect)."""

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def bucketed(spark, tmp_path_factory):
    wh = tmp_path_factory.mktemp("warehouse")
    sf = "/root/testdata/sf0.01"
    li = spark.read.parquet(f"{sf}/lineitem.parquet")
    orders = spark.read.parquet(f"{sf}/orders.parquet")
    for name, df, key in (("b_lineitem", li, "l_orderkey"), ("b_orders", orders, "o_orderkey")):
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        (df.write.bucketBy(8, key).sortBy(key).format("parquet")
         .option("path", str(wh / name)).saveAsTable(name))
    yield spark.table("b_lineitem"), spark.table("b_orders")
    for name in ("b_lineitem", "b_orders"):
        spark.sql(f"DROP TABLE IF EXISTS {name}")


def test_bucketed_join_has_no_shuffle(spark, bucketed):
    li, orders = bucketed
    # force the non-broadcast path: at real scale neither side broadcasts,
    # and bucketing must remove the hash-partition exchange entirely
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = li.join(orders, li.l_orderkey == orders.o_orderkey)
        plan = joined._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    assert "SortMergeJoin" in plan
    assert "Exchange" not in plan, f"bucketed join should not shuffle:\n{plan}"


def test_bucketed_join_correct(spark, bucketed):
    li, orders = bucketed
    n_bucketed = li.join(orders, li.l_orderkey == orders.o_orderkey).count()
    sf = "/root/testdata/sf0.01"
    plain = (
        spark.read.parquet(f"{sf}/lineitem.parquet")
        .join(spark.read.parquet(f"{sf}/orders.parquet"),
              F.col("l_orderkey") == F.col("o_orderkey"))
        .count()
    )
    assert n_bucketed == plain
