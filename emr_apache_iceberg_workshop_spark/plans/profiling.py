"""Window-function variety + data-quality profiling queries.

Widens the window surface beyond the reference's single ROW_NUMBER dedup
(`bronze-silver.py:254-258`): NTILE bucketing, LAG gap analysis,
FIRST/LAST_VALUE frames — each deterministic (total orders with unique
tiebreakers) and oracle-checked. `q_column_profile` is the data-quality
operator a training-data pipeline runs before ingestion: per-column
null/distinct/extrema stats in ONE pass (a single hash-agg over a
column-pruned scan — at 100 TB this is the cheapest full-table statement
there is, and it parallelizes embarrassingly).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from ..catalog import load_table
from ..functions import dsum, osum
from .registry import query


# --------------------------------------------------------------------------
# NTILE deciles of customer spend, WITHOUT the single-partition global
# window (r15: the naive `Window.orderBy(spend)` plans Exchange
# SinglePartition → Sort → Window — every customer through ONE reducer,
# the canonical 100 TB bottleneck; r14 VERDICT What's-wrong #1).
#
# Scale-safe exact form — two-phase range rank:
#   1. repartitionByRange(P, spend, o_custkey): non-overlapping sorted key
#      ranges, partition i holds strictly smaller keys than partition i+1.
#   2. row_number() per range partition (Window.partitionBy(pid) — P
#      parallel reducers, never one).
#   3. The P-row per-partition count relation yields each partition's
#      global rank OFFSET via a cumulative window over P rows (bounded by
#      the partition count, NOT the data — allowlisted in the explain
#      audit's single-partition-window lint) and the total n.
#   4. global rank = offset + local row_number; NTILE(k) is then pure
#      arithmetic: the first (n % k) buckets take floor(n/k)+1 rows.
# A histogram-cutoff form (the t_ccnet_buckets pattern) does NOT work
# here: spend is near-unique per customer, so the distinct-value histogram
# has ~n rows and its cumulative pass would itself be a single-partition
# window over the full relation.
@query(
    "q_ntile_deciles",
    oracle=f"""
    WITH spend AS (
      SELECT o_custkey, {osum('o_totalprice', 2)} AS spend, COUNT(*) AS n_orders
      FROM orders GROUP BY o_custkey
    )
    SELECT decile,
           COUNT(*) AS n_customers,
           {osum('spend', 2)} AS decile_spend,
           CAST(SUM(n_orders) AS BIGINT) AS decile_orders
    FROM (SELECT *, NTILE(10) OVER (ORDER BY spend, o_custkey) AS decile FROM spend)
    GROUP BY decile
    """,
    tags=("window:ntile", "agg"),
)
def q_ntile_deciles(spark, sf_dir) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    spend = orders.groupBy("o_custkey").agg(
        dsum(F.col("o_totalprice"), 2).alias("spend"), F.count(F.lit(1)).alias("n_orders")
    )
    return _ntile_buckets(spark, spend, keys=("spend", "o_custkey"), k=10).groupBy(
        "decile"
    ).agg(
        F.count(F.lit(1)).alias("n_customers"),
        dsum(F.col("spend"), 2).alias("decile_spend"),
        F.sum("n_orders").alias("decile_orders"),
    )


def _ntile_buckets(spark, df: DataFrame, keys: tuple[str, ...], k: int) -> DataFrame:
    """Exact NTILE(k) over `keys` without a single-partition global window.

    Range-partitions on the (unique-total-order) key tuple, row_numbers
    within each of the P range partitions in parallel, then converts local
    row numbers to global ranks via the P-row partition-count relation
    (cumulative offsets — the only single-partition window, bounded by the
    partition count at ANY data scale). The bucket id reproduces SQL
    NTILE semantics: with n rows, the first n % k buckets hold
    floor(n/k)+1 rows, the rest floor(n/k).
    """
    n_part = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    ranged = df.repartitionByRange(n_part, *keys).withColumn(
        "_pid", F.spark_partition_id()
    )
    w_local = Window.partitionBy("_pid").orderBy(*keys)
    # materialize ONCE: the per-pid counts and the rank join below both
    # derive from this frame, and RangePartitioner samples boundaries
    # with an RDD-id-derived seed — two independently planned range
    # exchanges (ReuseExchange can be defeated by column pruning) could
    # place boundaries differently, silently desynchronizing _off from
    # the actual partition sizes (review r15). One eager checkpoint pins
    # a single physical partitioning for both consumers.
    local = (
        ranged.withColumn("_lrn", F.row_number().over(w_local).cast("long"))
        .localCheckpoint(eager=True)
    )
    w_off = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    w_tot = Window.orderBy("_pid").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    # `_pid` is re-aliased (fresh ExprId) because pid_offsets derives
    # from the checkpointed `local` and joins back against it — the
    # analyzer cannot dedup a LogicalRDD's attributes under AQE-off
    # (the r14 conflicting-references class, plans/dedup.py:_fresh_ids)
    pid_offsets = (
        local.groupBy("_pid")
        .agg(F.count(F.lit(1)).alias("_cnt"))
        .select(
            F.col("_pid").alias("_pid"),
            F.coalesce(F.sum("_cnt").over(w_off), F.lit(0)).alias("_off"),
            F.sum("_cnt").over(w_tot).alias("_n"),
        )
    )
    rank = F.col("_off") + F.col("_lrn")
    q_ = F.floor(F.col("_n") / k).cast("long")  # small-bucket size
    r_ = (F.col("_n") % k).cast("long")  # number of +1-sized buckets
    big = q_ + F.lit(1)
    in_big = rank <= big * r_
    decile = F.when(in_big, F.floor((rank + big - 1) / big)).otherwise(
        r_ + F.floor((rank - big * r_ + F.greatest(q_, F.lit(1)) - 1) / F.greatest(q_, F.lit(1)))
    )
    return (
        local.join(F.broadcast(pid_offsets), "_pid")
        .withColumn("decile", decile.cast("long"))
        .drop("_pid", "_lrn", "_off", "_n")
    )


# --------------------------------------------------------------------------
# LAG order-gap analysis: days since each customer's previous order,
# aggregated into a per-priority gap profile. Window partitioned by
# customer → shuffles once on o_custkey, sorts within partitions only.
@query(
    "q_order_gaps",
    oracle="""
    WITH g AS (
      SELECT o_custkey, o_orderpriority,
             date_diff('day',
               LAG(o_orderdate) OVER (PARTITION BY o_custkey
                                      ORDER BY o_orderdate, o_orderkey),
               o_orderdate) AS gap_days
      FROM orders
    )
    SELECT o_orderpriority,
           COUNT(gap_days) AS n_gaps,
           MIN(gap_days) AS min_gap,
           MAX(gap_days) AS max_gap,
           CAST(SUM(gap_days) AS BIGINT) AS total_gap_days
    FROM g GROUP BY o_orderpriority
    """,
    tags=("window:lag", "agg"),
)
def q_order_gaps(spark, sf_dir) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    g = orders.withColumn(
        "gap_days",
        F.datediff(F.col("o_orderdate"), F.lag("o_orderdate").over(w)).cast("long"),
    )
    return g.groupBy("o_orderpriority").agg(
        F.count("gap_days").alias("n_gaps"),
        F.min("gap_days").alias("min_gap"),
        F.max("gap_days").alias("max_gap"),
        F.sum("gap_days").alias("total_gap_days"),
    )


# --------------------------------------------------------------------------
# FIRST/LAST_VALUE over an explicit full frame: each customer's first and
# latest order in one window pass (vs two self-joined rank filters).
@query(
    "q_first_last_order",
    oracle="""
    SELECT DISTINCT o_custkey,
           FIRST_VALUE(o_orderdate) OVER w AS first_order,
           LAST_VALUE(o_orderdate) OVER w AS last_order,
           FIRST_VALUE(o_orderkey) OVER w AS first_orderkey,
           LAST_VALUE(o_orderkey) OVER w AS last_orderkey,
           COUNT(*) OVER w AS n_orders
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
    tags=("window:first-last",),
)
def q_first_last_order(spark, sf_dir) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return orders.select(
        "o_custkey",
        F.first("o_orderdate").over(w).alias("first_order"),
        F.last("o_orderdate").over(w).alias("last_order"),
        F.first("o_orderkey").over(w).alias("first_orderkey"),
        F.last("o_orderkey").over(w).alias("last_orderkey"),
        F.count(F.lit(1)).over(w).alias("n_orders"),
    ).distinct()


# --------------------------------------------------------------------------
# Column profile: nulls/distincts/extrema for every orders column in ONE
# hash-agg pass (no per-column jobs, no shuffle beyond the single global
# agg). The ingestion-gate data-quality statement.
@query(
    "q_column_profile",
    oracle="""
    SELECT COUNT(*) AS n_rows,
           COUNT(o_custkey) AS custkey_nonnull,
           COUNT(DISTINCT o_custkey) AS custkey_distinct,
           COUNT(DISTINCT o_orderstatus) AS status_distinct,
           COUNT(DISTINCT o_orderpriority) AS priority_distinct,
           MIN(o_totalprice) AS price_min,
           MAX(o_totalprice) AS price_max,
           MIN(o_orderdate) AS date_min,
           MAX(o_orderdate) AS date_max
    FROM orders
    """,
    tags=("profile", "agg:distinct"),
)
def q_column_profile(spark, sf_dir) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return orders.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count("o_custkey").alias("custkey_nonnull"),
        F.countDistinct("o_custkey").alias("custkey_distinct"),
        F.countDistinct("o_orderstatus").alias("status_distinct"),
        F.countDistinct("o_orderpriority").alias("priority_distinct"),
        F.min("o_totalprice").alias("price_min"),
        F.max("o_totalprice").alias("price_max"),
        F.min("o_orderdate").alias("date_min"),
        F.max("o_orderdate").alias("date_max"),
    )


# --------------------------------------------------------------------------
# Sketch operators — the 100 TB profiling path. Exact COUNT(DISTINCT) and
# exact percentiles shuffle every value; HyperLogLog++ and t-digest/GK
# sketches keep per-group state constant-size and merge associatively
# (one partial agg per partition, tiny final merge — the same shape as
# SUM). Cross-engine check: a sketch VALUE is engine-specific, so the
# oracle instead verifies the sketch against the EXACT answer computed in
# the same statement — the Spark side returns the exact value plus a
# within-tolerance flag (deterministic: Spark's HLL++/percentile_approx
# are seed-free), and DuckDB recomputes the exact value with the flag
# pinned TRUE. A sketch drifting out of tolerance fails the hash match.
@query(
    "q_sketch_distinct",
    oracle="""
    SELECT event_type,
           COUNT(DISTINCT user_id) AS exact_users,
           TRUE AS approx_within_5pct
    FROM events
    GROUP BY event_type
    """,
    tags=("sketch:hll", "agg"),
)
def q_sketch_distinct(spark, sf_dir) -> DataFrame:
    """HLL++ approximate distinct users per event type, checked against
    the exact distinct in the same result: |approx - exact| / exact must
    stay within 5% (HLL++ at rsd=0.02 gives ~2% typical error)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("exact_users"),
        (
            F.abs(
                F.approx_count_distinct("user_id", rsd=0.02).cast("double")
                - F.countDistinct("user_id").cast("double")
            )
            <= 0.05 * F.countDistinct("user_id").cast("double")
        ).alias("approx_within_5pct"),
    )


@query(
    "q_sketch_quantiles",
    oracle="""
    SELECT l_returnflag,
           ROUND(quantile_cont(l_extendedprice, 0.5), 6) AS exact_p50,
           ROUND(quantile_cont(l_extendedprice, 0.99), 6) AS exact_p99,
           TRUE AS approx_within_bounds
    FROM lineitem
    GROUP BY l_returnflag
    """,
    tags=("sketch:quantile", "agg"),
)
def q_sketch_quantiles(spark, sf_dir) -> DataFrame:
    """approx_percentile (Greenwald-Khanna, accuracy 1e4 → rank error
    ≤ 0.01%) checked against the exact continuous quantile: the sketch
    answer must land within 1% relative error of exact p50/p99. The
    sketch is the operator you actually run at 100 TB; the exact values
    here double as the oracle's comparison columns."""
    li = load_table(spark, sf_dir, "lineitem")
    exact50 = F.expr("percentile(l_extendedprice, 0.5)")
    exact99 = F.expr("percentile(l_extendedprice, 0.99)")
    appr = F.expr(
        "approx_percentile(l_extendedprice, array(0.5, 0.99), 10000)"
    )
    # percentile interpolation (lo + frac*(hi-lo)) is not bit-identical
    # across engines/libm builds — round to 6 decimals on both sides
    return li.groupBy("l_returnflag").agg(
        F.round(exact50, 6).alias("exact_p50"),
        F.round(exact99, 6).alias("exact_p99"),
        (
            (F.abs(appr.getItem(0) - exact50) <= 0.01 * exact50)
            & (F.abs(appr.getItem(1) - exact99) <= 0.01 * exact99)
        ).alias("approx_within_bounds"),
    )
