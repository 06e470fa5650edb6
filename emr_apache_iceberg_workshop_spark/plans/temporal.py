"""Temporal join operators over `events`: as-of join, range join, exact
percentiles — operators the reference's engine family (time-series /
CDC lakes) commonly needs and Spark has no single built-in for.

As-of join (purchase → latest prior view per user) is implemented with
the union + last-carried-forward window trick: tag both sides, sort each
user's merged timeline once, and carry the most recent right-side row
forward. ONE shuffle on the partition key, no join at all — this is the
scale-correct shape (a naive inequality join explodes; per-key
`applyInPandas` merges would work but stay Python-side). The oracle uses
a LATERAL top-1 subquery, deterministic via the event_id tiebreak.

Range join (click → purchases within 30 min) uses equi-join on user_id +
range predicate. At 100 TB add a coarse time-bucket equi-key on both
sides (join on (user_id, bucket) for bucket and bucket+1) so the range
predicate filters within buckets instead of within whole user histories.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from ..catalog import load_table
from ..functions import osum, TS_FMT_SPARK, TS_FMT_DUCK
from .registry import query


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    right_vals: list[str],
    tiebreak: str,
) -> DataFrame:
    """For each left row, attach the right row with the greatest
    `right_ts` <= `left_ts` within the same `on` group (latest tiebreak
    wins at equal ts). Union + window — one shuffle on `on`, no join.
    """
    lt = left.withColumn("__side", F.lit(1)).withColumn("__ts", F.col(left_ts))
    rt = (
        right.select(
            *on,
            F.col(right_ts).alias("__rts"),
            F.col(tiebreak).alias("__rtb"),
            *[F.col(c).alias(f"__rv_{c}") for c in right_vals],
        )
        .withColumn("__side", F.lit(0))
        .withColumn("__ts", F.col("__rts"))
    )
    merged = lt.unionByName(rt, allowMissingColumns=True)
    # Right rows sort before left rows at equal ts (side 0 < 1) so an
    # equal-ts right row is visible to the left row (ASOF >= semantics).
    w = (
        Window.partitionBy(*on)
        .orderBy("__ts", "__side", F.coalesce("__rtb", F.lit(-1)))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = [F.last(f"__rv_{c}", ignorenulls=True).over(w).alias(f"__asof_{c}") for c in right_vals]
    carried.append(F.last("__rts", ignorenulls=True).over(w).alias("__asof_ts"))
    return (
        merged.select("*", *carried)
        .filter(F.col("__side") == 1)
        .drop("__side", "__ts", "__rts", "__rtb", *[f"__rv_{c}" for c in right_vals])
    )


# --------------------------------------------------------------------------
@query(
    "q_asof_join",
    oracle=f"""
    SELECT p.event_id, p.user_id,
           strftime(p.ts, '{TS_FMT_DUCK}') AS purchase_ts,
           p.value AS purchase_value,
           strftime(v.vts, '{TS_FMT_DUCK}') AS last_view_ts,
           v.vvalue AS last_view_value
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    LEFT JOIN LATERAL (
      SELECT ts AS vts, value AS vvalue
      FROM events v
      WHERE v.event_type = 'view' AND v.user_id = p.user_id AND v.ts <= p.ts
      ORDER BY v.ts DESC, v.event_id DESC LIMIT 1
    ) v ON TRUE
    """,
    tags=("join:asof", "window"),
)
def q_asof_join(spark, sf_dir) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase")
    views = ev.filter(F.col("event_type") == "view")
    out = asof_join(
        purchases,
        views,
        on=["user_id"],
        left_ts="ts",
        right_ts="ts",
        right_vals=["value"],
        tiebreak="event_id",
    )
    return out.select(
        "event_id",
        "user_id",
        F.date_format("ts", TS_FMT_SPARK).alias("purchase_ts"),
        F.col("value").alias("purchase_value"),
        F.date_format("__asof_ts", TS_FMT_SPARK).alias("last_view_ts"),
        F.col("__asof_value").alias("last_view_value"),
    )


# --------------------------------------------------------------------------
@query(
    "q_range_join",
    oracle=f"""
    SELECT c.event_id AS click_id, c.user_id,
           COUNT(p.event_id) AS n_purchases_30m,
           {osum('COALESCE(p.value, 0)', 2)} AS purchase_value_30m
    FROM (SELECT * FROM events WHERE event_type = 'click') c
    LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
      ON p.user_id = c.user_id
     AND p.ts > c.ts AND p.ts <= c.ts + INTERVAL '30 minutes'
    GROUP BY c.event_id, c.user_id
    """,
    tags=("join:range", "agg"),
)
def q_range_join(spark, sf_dir) -> DataFrame:
    from ..functions import dsum

    ev = load_table(spark, sf_dir, "events")
    # range predicate on the raw int64 ns column: same ordering as ts,
    # and a plain long comparison stays inside codegen
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"), "user_id", F.col("ts_ns").alias("c_ns")
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"), F.col("ts_ns").alias("p_ns"),
        F.col("value").alias("p_value"), F.col("event_id").alias("p_id"),
    )
    joined = clicks.join(
        purchases,
        (F.col("p_user") == F.col("user_id"))
        & (F.col("p_ns") > F.col("c_ns"))
        & (F.col("p_ns") <= F.col("c_ns") + F.lit(30 * 60 * 1_000_000_000)),
        "left",
    )
    return joined.groupBy("click_id", "user_id").agg(
        F.count("p_id").alias("n_purchases_30m"),
        dsum(F.coalesce("p_value", F.lit(0.0)), 2).alias("purchase_value_30m"),
    )


# --------------------------------------------------------------------------
@query(
    "q_percentiles",
    oracle="""
    SELECT l_returnflag,
           ROUND(quantile_cont(l_extendedprice, 0.5), 6) AS p50_price,
           ROUND(quantile_cont(l_extendedprice, 0.9), 6) AS p90_price,
           ROUND(quantile_cont(l_extendedprice, 0.99), 6) AS p99_price,
           ROUND(quantile_cont(l_quantity, 0.5), 6) AS p50_qty,
           MIN(l_extendedprice) AS min_price,
           MAX(l_extendedprice) AS max_price
    FROM lineitem
    GROUP BY l_returnflag
    """,
    tags=("agg:percentile",),
)
def q_percentiles(spark, sf_dir) -> DataFrame:
    # Exact percentiles (Spark `percentile`, linear interpolation — the
    # same continuous-quantile definition DuckDB's quantile_cont uses).
    # Interpolation arithmetic is not bit-identical across engines/libm
    # builds, so both sides round to 6 decimals. At 100 TB switch to
    # percentile_approx (t-digest) unless exactness is required; exact
    # percentile shuffles all values per group.
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.expr("percentile(l_extendedprice, 0.5)"), 6).alias("p50_price"),
        F.round(F.expr("percentile(l_extendedprice, 0.9)"), 6).alias("p90_price"),
        F.round(F.expr("percentile(l_extendedprice, 0.99)"), 6).alias("p99_price"),
        F.round(F.expr("percentile(l_quantity, 0.5)"), 6).alias("p50_qty"),
        F.min("l_extendedprice").alias("min_price"),
        F.max("l_extendedprice").alias("max_price"),
    )
