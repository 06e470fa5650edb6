"""Relational query surface over the driver's TPC-H-ish tables.

Covers the reference's operator inventory (SURVEY.md §2: P1-P3 filters and
projections, A1 counts, O1 ordered limit, F3/F4 scalar fns) widened to the
full relational surface Catalyst gives us: multi-way joins, hash
aggregation, semi/anti joins, set ops, rollup.

Plan-quality conventions (checked via .explain at sf0.1):
- explicit `F.broadcast` hints ONLY on truly constant-size sides
  (region: 5 rows, nation: 25 rows — fixed at any SF). Scale-dependent
  tables (customer/supplier/part/orders grow linearly with SF) are left
  unhinted: AQE's runtime-size broadcast decision picks BroadcastHashJoin
  when the filtered side is actually small, and falls back to sort-merge
  when it isn't — the only answer that is right at both sf0.1 and 100 TB.
- filters expressed on raw scan columns so they reach PushedFilters.
- aggregates use functions.exact (decimal-exact sums) — deterministic
  under any partitioning AND bit-identical to the DuckDB oracle.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, functions as F

from ..catalog import load_table, load_tables, TABLES
from ..functions import dsum, davg, osum, oavg
from ..operators import top_k
from .registry import query

def _rev():
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))
_O_REV = "l_extendedprice * (1 - l_discount)"


# --------------------------------------------------------------------------
# Q1: pricing summary — groupBy + 8 aggregates (TPC-H Q1 shape)
@query(
    "q01_pricing_summary",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {osum('l_quantity', 2)} AS sum_qty,
           {osum('l_extendedprice', 2)} AS sum_base_price,
           {osum(_O_REV, 6)} AS sum_disc_price,
           {osum(f'{_O_REV} * (1 + l_tax)', 8)} AS sum_charge,
           {oavg('l_quantity', 2)} AS avg_qty,
           {oavg('l_extendedprice', 2)} AS avg_price,
           {oavg('l_discount', 2)} AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
    tags=("agg", "reference:A1"),
)
def q01_pricing_summary(spark, sf_dir) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum(F.col("l_quantity"), 2).alias("sum_qty"),
            dsum(F.col("l_extendedprice"), 2).alias("sum_base_price"),
            dsum(_rev(), 6).alias("sum_disc_price"),
            dsum(_rev() * (1 + F.col("l_tax")), 8).alias("sum_charge"),
            davg(F.col("l_quantity"), 2).alias("avg_qty"),
            davg(F.col("l_extendedprice"), 2).alias("avg_price"),
            davg(F.col("l_discount"), 2).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


# --------------------------------------------------------------------------
# Q3: shipping priority — 3-way join + agg + top-k
@query(
    "q03_shipping_priority",
    oracle=f"""
    SELECT l_orderkey,
           {osum(_O_REV, 6)} AS revenue,
           strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
           o_orderpriority
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
      AND l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
    tags=("join", "topk", "reference:O1"),
)
def q03_shipping_priority(spark, sf_dir) -> DataFrame:
    t = load_tables(spark, sf_dir, ["customer", "orders", "lineitem"])
    cust = t["customer"].filter(F.col("c_mktsegment") == "BUILDING")
    cutoff = F.lit("1998-03-15 00:00:00").cast("timestamp_ntz")
    orders = t["orders"].filter(F.col("o_orderdate") < cutoff)
    li = t["lineitem"].filter(F.col("l_shipdate") > cutoff)
    agg = (
        li.join(orders.join(cust, F.col("o_custkey") == F.col("c_custkey")),
                F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(dsum(_rev(), 6).alias("revenue"))
        .select(
            "l_orderkey",
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            "o_orderpriority",
        )
    )
    return top_k(agg, [F.col("revenue").desc(), F.col("l_orderkey")], 10)


# --------------------------------------------------------------------------
# Q5-shape: regional revenue — 6-way join, broadcast dims
@query(
    "q05_region_revenue",
    oracle=f"""
    SELECT n_name, {osum(_O_REV, 6)} AS revenue
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY n_name
    """,
    tags=("join", "agg"),
)
def q05_region_revenue(spark, sf_dir) -> DataFrame:
    t = load_tables(spark, sf_dir, ["lineitem", "orders", "customer", "supplier", "nation", "region"])
    orders = t["orders"].filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp_ntz"))
    )
    nat = t["nation"].join(
        F.broadcast(t["region"].filter(F.col("r_name") == "ASIA")),
        F.col("n_regionkey") == F.col("r_regionkey"),
    )
    return (
        t["lineitem"]
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .join(
            t["supplier"],
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(dsum(_rev(), 6).alias("revenue"))
    )


# --------------------------------------------------------------------------
# Top-20 customers by lineitem revenue (join + agg + ordered limit)
@query(
    "q_top_customers",
    oracle=f"""
    SELECT c_custkey, c_name, {osum(_O_REV, 6)} AS revenue,
           COUNT(DISTINCT o_orderkey) AS n_orders
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    GROUP BY c_custkey, c_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
    tags=("join", "topk"),
)
def q_top_customers(spark, sf_dir) -> DataFrame:
    t = load_tables(spark, sf_dir, ["lineitem", "orders", "customer"])
    agg = (
        t["lineitem"]
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_custkey", "c_name")
        .agg(
            dsum(_rev(), 6).alias("revenue"),
            F.countDistinct("o_orderkey").alias("n_orders"),
        )
    )
    return top_k(agg, [F.col("revenue").desc(), F.col("c_custkey")], 20)


# --------------------------------------------------------------------------
# P1/P2/F3 parity: filter + projection + computed columns
@query(
    "q_filter_project",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           l_extendedprice * (1 - l_discount) AS revenue,
           strftime(l_shipdate, '%Y') AS ship_year,
           l_quantity >= 30 AS bulk_flag
    FROM lineitem
    WHERE l_extendedprice > 0 AND l_quantity > 0
      AND l_returnflag = 'R' AND l_discount >= 0.05
    """,
    tags=("filter", "project", "reference:P1,P2,F3"),
)
def q_filter_project(spark, sf_dir) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_extendedprice") > 0)
            & (F.col("l_quantity") > 0)
            & (F.col("l_returnflag") == "R")
            & (F.col("l_discount") >= 0.05)
        ).select(
            "l_orderkey",
            "l_linenumber",
            _rev().alias("revenue"),
            F.date_format("l_shipdate", "yyyy").alias("ship_year"),
            (F.col("l_quantity") >= 30).alias("bulk_flag"),
        )
    )


# --------------------------------------------------------------------------
# A1 parity: COUNT(*) per table
@query(
    "q_table_counts",
    oracle=" UNION ALL ".join(
        f"SELECT '{t}' AS tbl, COUNT(*) AS n_rows FROM {t}" for t in TABLES
    ),
    tags=("agg", "reference:A1"),
)
def q_table_counts(spark, sf_dir) -> DataFrame:
    parts = [
        load_table(spark, sf_dir, t)
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .select(F.lit(t).alias("tbl"), "n_rows")
        for t in TABLES
    ]
    return reduce(DataFrame.unionAll, parts)


# --------------------------------------------------------------------------
# Semi / anti joins: per-nation customers with and without orders
@query(
    "q_semi_anti",
    oracle="""
    SELECT n_name,
           COUNT(CASE WHEN has_ord THEN 1 END) AS with_orders,
           COUNT(CASE WHEN NOT has_ord THEN 1 END) AS without_orders
    FROM (
      SELECT c.c_custkey, c.c_nationkey,
             EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey) AS has_ord
      FROM customer c
    )
    JOIN nation ON c_nationkey = n_nationkey
    GROUP BY n_name
    """,
    tags=("join:semi", "join:anti"),
)
def q_semi_anti(spark, sf_dir) -> DataFrame:
    t = load_tables(spark, sf_dir, ["customer", "orders", "nation"])
    with_o = (
        t["customer"].join(t["orders"], F.col("c_custkey") == F.col("o_custkey"), "left_semi")
        .withColumn("has_ord", F.lit(True))
    )
    without_o = (
        t["customer"].join(t["orders"], F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .withColumn("has_ord", F.lit(False))
    )
    return (
        with_o.unionAll(without_o)
        .join(F.broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(
            F.count(F.when(F.col("has_ord"), 1)).alias("with_orders"),
            F.count(F.when(~F.col("has_ord"), 1)).alias("without_orders"),
        )
    )


# --------------------------------------------------------------------------
# Set operations: INTERSECT / EXCEPT on yearly active customer sets
@query(
    "q_set_ops",
    oracle="""
    WITH y95 AS (SELECT DISTINCT o_custkey FROM orders
                 WHERE o_orderdate >= TIMESTAMP '1995-01-01' AND o_orderdate < TIMESTAMP '1996-01-01'),
         y96 AS (SELECT DISTINCT o_custkey FROM orders
                 WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01')
    SELECT 'both' AS cohort, o_custkey FROM (SELECT o_custkey FROM y95 INTERSECT SELECT o_custkey FROM y96)
    UNION ALL
    SELECT 'only_1995' AS cohort, o_custkey FROM (SELECT o_custkey FROM y95 EXCEPT SELECT o_custkey FROM y96)
    UNION ALL
    SELECT 'only_1996' AS cohort, o_custkey FROM (SELECT o_custkey FROM y96 EXCEPT SELECT o_custkey FROM y95)
    """,
    tags=("setop",),
)
def q_set_ops(spark, sf_dir) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")

    def actives(y0: str, y1: str) -> DataFrame:
        return (
            orders.filter(
                (F.col("o_orderdate") >= F.lit(f"{y0}-01-01 00:00:00").cast("timestamp_ntz"))
                & (F.col("o_orderdate") < F.lit(f"{y1}-01-01 00:00:00").cast("timestamp_ntz"))
            )
            .select("o_custkey")
            .distinct()
        )

    y95, y96 = actives("1995", "1996"), actives("1996", "1997")
    return (
        y95.intersect(y96).select(F.lit("both").alias("cohort"), "o_custkey")
        .unionAll(y95.exceptAll(y96).select(F.lit("only_1995").alias("cohort"), "o_custkey"))
        .unionAll(y96.exceptAll(y95).select(F.lit("only_1996").alias("cohort"), "o_custkey"))
    )


# --------------------------------------------------------------------------
# Rollup: revenue by region/nation hierarchy with subtotals
@query(
    "q_rollup_revenue",
    oracle=f"""
    SELECT COALESCE(r_name, 'ALL') AS region_name,
           COALESCE(n_name, 'ALL') AS nation_name,
           {osum('o_totalprice', 2)} AS total_price,
           COUNT(*) AS n_orders
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY ROLLUP(r_name, n_name)
    """,
    tags=("agg:rollup",),
)
def q_rollup_revenue(spark, sf_dir) -> DataFrame:
    t = load_tables(spark, sf_dir, ["orders", "customer", "nation", "region"])
    return (
        t["orders"]
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(t["region"]), F.col("n_regionkey") == F.col("r_regionkey"))
        .rollup("r_name", "n_name")
        .agg(dsum(F.col("o_totalprice"), 2).alias("total_price"), F.count(F.lit(1)).alias("n_orders"))
        .select(
            F.coalesce("r_name", F.lit("ALL")).alias("region_name"),
            F.coalesce("n_name", F.lit("ALL")).alias("nation_name"),
            "total_price",
            "n_orders",
        )
    )


# --------------------------------------------------------------------------
# Order priority check (TPC-H Q4 shape: semi join + conditional agg)
@query(
    "q04_order_priority",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-07-01' AND o_orderdate < TIMESTAMP '1996-10-01'
      AND EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey
                  AND l_shipdate > TIMESTAMP '1997-01-01')
    GROUP BY o_orderpriority
    """,
    tags=("join:semi", "agg"),
)
def q04_order_priority(spark, sf_dir) -> DataFrame:
    t = load_tables(spark, sf_dir, ["orders", "lineitem"])
    orders = t["orders"].filter(
        (F.col("o_orderdate") >= F.lit("1996-07-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1996-10-01 00:00:00").cast("timestamp_ntz"))
    )
    late_li = t["lineitem"].filter(
        F.col("l_shipdate") > F.lit("1997-01-01 00:00:00").cast("timestamp_ntz")
    )
    return (
        orders.join(late_li, F.col("o_orderkey") == F.col("l_orderkey"), "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


# --------------------------------------------------------------------------
# Part stats by brand/type (groupBy over dimension attrs; TPC-H Q14-ish mix)
@query(
    "q_part_revenue_share",
    oracle=f"""
    SELECT p_brand,
           {osum(_O_REV, 6)} AS revenue,
           {osum(f"CASE WHEN p_type LIKE 'PROMO%' THEN {_O_REV} ELSE 0 END", 6)} AS promo_revenue,
           COUNT(*) AS n_lines
    FROM lineitem JOIN part ON l_partkey = p_partkey
    GROUP BY p_brand
    """,
    tags=("join", "agg:conditional"),
)
def q_part_revenue_share(spark, sf_dir) -> DataFrame:
    t = load_tables(spark, sf_dir, ["lineitem", "part"])
    return (
        t["lineitem"]
        .join(t["part"], F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand")
        .agg(
            dsum(_rev(), 6).alias("revenue"),
            dsum(F.when(F.col("p_type").startswith("PROMO"), _rev()).otherwise(F.lit(0.0)), 6).alias(
                "promo_revenue"
            ),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


# --------------------------------------------------------------------------
# TPC-H Q6 shape: single-pass filtered aggregate — the pushdown showcase
# (.explain must show all three predicates in PushedFilters and a 4-column
# ReadSchema; at 100 TB this reads only matching row groups)
@query(
    "q06_forecast_revenue",
    oracle=f"""
    SELECT {osum('l_extendedprice * l_discount', 4)} AS revenue,
           COUNT(*) AS n_lines
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount >= 0.05 AND l_discount <= 0.07
      AND l_quantity < 24
    """,
    tags=("agg", "pushdown"),
)
def q06_forecast_revenue(spark, sf_dir) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp_ntz"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            dsum(F.col("l_extendedprice") * F.col("l_discount"), 4).alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


# --------------------------------------------------------------------------
# Correlated comparison via window: orders above their customer's average
# (exact decimal sum/count per key — cross-engine-deterministic ratio)
@query(
    "q_above_avg_orders",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice, cust_avg
    FROM (
      SELECT o_orderkey, o_custkey, o_totalprice,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(38,2))) OVER (PARTITION BY o_custkey) AS DOUBLE)
               / COUNT(*) OVER (PARTITION BY o_custkey) AS cust_avg
      FROM orders
    )
    WHERE o_totalprice > cust_avg
    """,
    tags=("window:agg", "correlated"),
)
def q_above_avg_orders(spark, sf_dir) -> DataFrame:
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey")
    cust_avg = (
        F.sum(F.col("o_totalprice").cast("decimal(38,2)")).over(w).cast("double")
        / F.count(F.lit(1)).over(w)
    )
    return (
        orders.withColumn("cust_avg", cust_avg)
        .filter(F.col("o_totalprice") > F.col("cust_avg"))
        .select("o_orderkey", "o_custkey", "o_totalprice", "cust_avg")
    )


# --------------------------------------------------------------------------
# CUBE: all subtotal combinations over (orderpriority, orderstatus)
@query(
    "q_cube_orders",
    oracle=f"""
    SELECT COALESCE(o_orderpriority, 'ALL') AS priority,
           COALESCE(o_orderstatus, 'ALL') AS status,
           COUNT(*) AS n_orders,
           {osum('o_totalprice', 2)} AS total_price
    FROM orders
    GROUP BY CUBE(o_orderpriority, o_orderstatus)
    """,
    tags=("agg:cube",),
)
def q_cube_orders(spark, sf_dir) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.cube("o_orderpriority", "o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n_orders"), dsum(F.col("o_totalprice"), 2).alias("total_price"))
        .select(
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            "n_orders",
            "total_price",
        )
    )


# --------------------------------------------------------------------------
# String-function surface: upper/substr/length/replace/trim/levenshtein —
# identical semantics in Spark (Java) and DuckDB for ASCII inputs
@query(
    "q_string_funcs",
    oracle="""
    SELECT c_custkey,
           upper(c_mktsegment) AS seg_upper,
           lower(c_name) AS name_lower,
           substr(c_name, 10, 9) AS cust_num,
           lpad(CAST(c_custkey AS VARCHAR), 12, '0') AS key_padded,
           length(c_name) AS name_len,
           replace(c_mktsegment, 'MACHINERY', 'MACHINES') AS segment_renamed,
           c_name LIKE '%00' AS ends_00,
           levenshtein(c_mktsegment, 'BUILDING') AS seg_dist,
           concat_ws('|', c_mktsegment, CAST(c_nationkey AS VARCHAR)) AS seg_nation
    FROM customer
    WHERE c_custkey % 7 = 0
    """,
    tags=("scalar:string",),
)
def q_string_funcs(spark, sf_dir) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    return cust.filter(F.col("c_custkey") % 7 == 0).select(
        "c_custkey",
        F.upper("c_mktsegment").alias("seg_upper"),
        F.lower("c_name").alias("name_lower"),
        F.substring("c_name", 10, 9).alias("cust_num"),
        F.lpad(F.col("c_custkey").cast("string"), 12, "0").alias("key_padded"),
        F.length("c_name").cast("bigint").alias("name_len"),
        F.regexp_replace("c_mktsegment", "MACHINERY", "MACHINES").alias("segment_renamed"),
        F.col("c_name").like("%00").alias("ends_00"),
        F.levenshtein("c_mktsegment", F.lit("BUILDING")).cast("bigint").alias("seg_dist"),
        F.concat_ws("|", F.col("c_mktsegment"), F.col("c_nationkey").cast("string")).alias("seg_nation"),
    )


# --------------------------------------------------------------------------
# TPC-H Q13 shape: customer order-count distribution (left outer join +
# two-level aggregation)
@query(
    "q13_custdist",
    oracle="""
    SELECT c_count, COUNT(*) AS custdist
    FROM (
      SELECT c_custkey, COUNT(o_orderkey) AS c_count
      FROM customer LEFT JOIN orders ON c_custkey = o_custkey
      GROUP BY c_custkey
    )
    GROUP BY c_count
    """,
    tags=("join:outer", "agg:two-level"),
)
def q13_custdist(spark, sf_dir) -> DataFrame:
    t = load_tables(spark, sf_dir, ["customer", "orders"])
    per_cust = (
        t["customer"]
        .join(t["orders"], F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


# --------------------------------------------------------------------------
# TPC-H Q18 shape: large-quantity orders (HAVING on a grouped sum, then
# join back to headers)
@query(
    "q18_large_orders",
    oracle=f"""
    WITH big AS (
      SELECT l_orderkey, {osum('l_quantity', 2)} AS total_qty
      FROM lineitem GROUP BY l_orderkey
      HAVING SUM(CAST(l_quantity AS DECIMAL(38,2))) > 210
    )
    SELECT o_orderkey, o_custkey, o_totalprice,
           strftime(o_orderdate, '%Y-%m-%d') AS orderdate, total_qty
    FROM big JOIN orders ON o_orderkey = l_orderkey
    """,
    tags=("agg:having", "join"),
)
def q18_large_orders(spark, sf_dir) -> DataFrame:
    t = load_tables(spark, sf_dir, ["lineitem", "orders"])
    big = (
        t["lineitem"]
        .groupBy("l_orderkey")
        .agg(dsum(F.col("l_quantity"), 2).alias("total_qty"))
        .filter(F.col("total_qty") > 210)
    )
    return big.join(t["orders"], F.col("o_orderkey") == F.col("l_orderkey")).select(
        "o_orderkey",
        "o_custkey",
        "o_totalprice",
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
        "total_qty",
    )


# --------------------------------------------------------------------------
# TPC-H Q22 shape: customers above global average balance with no orders
# (scalar subquery + anti join)
@query(
    "q22_global_sales_opportunity",
    oracle="""
    SELECT c_nationkey AS nationkey, COUNT(*) AS numcust,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(38,2))) AS DOUBLE) AS totacctbal
    FROM customer
    WHERE c_acctbal > (
            SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(38,2))) AS DOUBLE) / COUNT(*)
            FROM customer WHERE c_acctbal > 0.0)
      AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    GROUP BY c_nationkey
    """,
    tags=("join:anti", "subquery:scalar"),
)
def q22_global_sales_opportunity(spark, sf_dir) -> DataFrame:
    t = load_tables(spark, sf_dir, ["customer", "orders"])
    cust = t["customer"]
    # scalar subquery as a 1-row broadcast crossJoin (same shape as
    # q11/q15/q17): no driver round-trip, the threshold streams to every
    # task as a broadcast variable inside one job
    avg_bal = cust.filter(F.col("c_acctbal") > 0.0).agg(
        (F.sum(F.col("c_acctbal").cast("decimal(38,2)")).cast("double") / F.count(F.lit(1))).alias("__avg_bal")
    )
    rich = (
        cust.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("__avg_bal"))
        .drop("__avg_bal")
    )
    no_orders = rich.join(t["orders"], F.col("c_custkey") == F.col("o_custkey"), "left_anti")
    return no_orders.groupBy(F.col("c_nationkey").alias("nationkey")).agg(
        F.count(F.lit(1)).alias("numcust"),
        F.sum(F.col("c_acctbal").cast("decimal(38,2)")).cast("double").alias("totacctbal"),
    )


# --------------------------------------------------------------------------
# TPC-H Q7 shape: volume shipping between two nations, by ship year
@query(
    "q07_volume_shipping",
    oracle=f"""
    SELECT supp_nation, cust_nation, l_year, {osum('volume', 6)} AS revenue
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             strftime(l_shipdate, '%Y') AS l_year,
             {_O_REV} AS volume
      FROM lineitem
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN orders ON o_orderkey = l_orderkey
      JOIN customer ON c_custkey = o_custkey
      JOIN nation n1 ON s_nationkey = n1.n_nationkey
      JOIN nation n2 ON c_nationkey = n2.n_nationkey
      WHERE ((n1.n_name = 'FRANCE' AND n2.n_name = 'GERMANY')
          OR (n1.n_name = 'GERMANY' AND n2.n_name = 'FRANCE'))
    )
    GROUP BY supp_nation, cust_nation, l_year
    """,
    tags=("join", "agg"),
)
def q07_volume_shipping(spark, sf_dir) -> DataFrame:
    t = load_tables(spark, sf_dir, ["lineitem", "supplier", "orders", "customer", "nation"])
    n1 = t["nation"].selectExpr("n_nationkey AS n1_key", "n_name AS supp_nation")
    n2 = t["nation"].selectExpr("n_nationkey AS n2_key", "n_name AS cust_nation")
    return (
        t["lineitem"]
        .join(t["supplier"], F.col("s_suppkey") == F.col("l_suppkey"))
        .join(t["orders"], F.col("o_orderkey") == F.col("l_orderkey"))
        .join(t["customer"], F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(
            ((F.col("supp_nation") == "FRANCE") & (F.col("cust_nation") == "GERMANY"))
            | ((F.col("supp_nation") == "GERMANY") & (F.col("cust_nation") == "FRANCE"))
        )
        .groupBy("supp_nation", "cust_nation", F.date_format("l_shipdate", "yyyy").alias("l_year"))
        .agg(dsum(_rev(), 6).alias("revenue"))
    )


# --------------------------------------------------------------------------
# TPC-H Q10 shape: returned-item revenue by customer, top 20
@query(
    "q10_returned_items",
    oracle=f"""
    SELECT c_custkey, c_name, {osum(_O_REV, 6)} AS revenue, n_name
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation ON c_nationkey = n_nationkey
    WHERE o_orderdate >= TIMESTAMP '1996-10-01' AND o_orderdate < TIMESTAMP '1997-01-01'
      AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
    tags=("join", "topk"),
)
def q10_returned_items(spark, sf_dir) -> DataFrame:
    t = load_tables(spark, sf_dir, ["customer", "orders", "lineitem", "nation"])
    orders = t["orders"].filter(
        (F.col("o_orderdate") >= F.lit("1996-10-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp_ntz"))
    )
    li = t["lineitem"].filter(F.col("l_returnflag") == "R")
    agg = (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(dsum(_rev(), 6).alias("revenue"))
        .select("c_custkey", "c_name", "revenue", "n_name")
    )
    return top_k(agg, [F.col("revenue").desc(), F.col("c_custkey")], 20)


# --------------------------------------------------------------------------
# TPC-H Q19 shape: OR-ed predicate brackets over a join (disjunction
# pushdown + join predicate mix)
@query(
    "q19_bracket_discounts",
    oracle=f"""
    SELECT {osum(_O_REV, 6)} AS revenue, COUNT(*) AS n_lines
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#1' AND p_size <= 10 AND l_quantity >= 1 AND l_quantity <= 15)
       OR (p_brand = 'Brand#2' AND p_size <= 20 AND l_quantity >= 10 AND l_quantity <= 25)
       OR (p_brand = 'Brand#3' AND p_size <= 30 AND l_quantity >= 20 AND l_quantity <= 35)
    """,
    tags=("join", "pushdown:disjunction"),
)
def q19_bracket_discounts(spark, sf_dir) -> DataFrame:
    t = load_tables(spark, sf_dir, ["lineitem", "part"])
    li, p = t["lineitem"], t["part"]
    j = li.join(p, F.col("p_partkey") == F.col("l_partkey"))
    br = (
        ((F.col("p_brand") == "Brand#1") & (F.col("p_size") <= 10)
         & F.col("l_quantity").between(1, 15))
        | ((F.col("p_brand") == "Brand#2") & (F.col("p_size") <= 20)
           & F.col("l_quantity").between(10, 25))
        | ((F.col("p_brand") == "Brand#3") & (F.col("p_size") <= 30)
           & F.col("l_quantity").between(20, 35))
    )
    return j.filter(br).agg(
        dsum(_rev(), 6).alias("revenue"), F.count(F.lit(1)).alias("n_lines")
    )


# --------------------------------------------------------------------------
# GROUPING SETS (distinct from rollup/cube: arbitrary group combinations)
@query(
    "q_grouping_sets",
    oracle=f"""
    SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
           COALESCE(l_linestatus, 'ALL') AS linestatus,
           {osum('l_quantity', 2)} AS sum_qty, COUNT(*) AS n_lines
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), (l_returnflag, l_linestatus))
    """,
    tags=("agg:grouping-sets",),
)
def q_grouping_sets(spark, sf_dir) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    li.createOrReplaceTempView("__gs_lineitem")
    return spark.sql(f"""
        SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
               COALESCE(l_linestatus, 'ALL') AS linestatus,
               CAST(SUM(CAST(l_quantity AS DECIMAL(38,2))) AS DOUBLE) AS sum_qty,
               COUNT(*) AS n_lines
        FROM __gs_lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), (l_returnflag, l_linestatus))
    """)


# --------------------------------------------------------------------------
# RANGE window frame: 1-hour trailing sum per user over event time
@query(
    "q_trailing_window",
    oracle="""
    SELECT event_id, user_id,
           CAST(SUM(CAST(value AS DECIMAL(38,2))) OVER (
             PARTITION BY user_id ORDER BY epoch_ns(ts)
             RANGE BETWEEN 3600000000000 PRECEDING AND CURRENT ROW) AS DOUBLE)
             AS trailing_1h_value,
           COUNT(*) OVER (
             PARTITION BY user_id ORDER BY epoch_ns(ts)
             RANGE BETWEEN 3600000000000 PRECEDING AND CURRENT ROW)
             AS trailing_1h_events
    FROM events
    """,
    tags=("window:range-frame",),
)
def q_trailing_window(spark, sf_dir) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    # RANGE frame over the raw int64 ns timestamp: same ordering/values as
    # DuckDB's epoch_ns(ts) (events.parquet stores ns since epoch)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_ns")
        .rangeBetween(-3_600_000_000_000, 0)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.sum(F.col("value").cast("decimal(38,2)")).over(w).cast("double").alias("trailing_1h_value"),
        F.count(F.lit(1)).over(w).alias("trailing_1h_events"),
    )


# --------------------------------------------------------------------------
# PIVOT: returnflag x linestatus quantity matrix (Spark pivot API; oracle
# spells it as conditional aggregation — same relational operation)
@query(
    "q_pivot_status",
    oracle=f"""
    SELECT l_returnflag,
           {osum("CASE WHEN l_linestatus = 'F' THEN l_quantity ELSE 0 END", 2)} AS qty_F,
           {osum("CASE WHEN l_linestatus = 'O' THEN l_quantity ELSE 0 END", 2)} AS qty_O
    FROM lineitem
    GROUP BY l_returnflag
    """,
    tags=("agg:pivot",),
)
def q_pivot_status(spark, sf_dir) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    piv = (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["F", "O"])
        .agg(F.sum(F.coalesce(F.col("l_quantity"), F.lit(0.0)).cast("decimal(38,2)")).cast("double"))
    )
    return piv.select(
        "l_returnflag",
        F.coalesce("F", F.lit(0.0)).alias("qty_F"),
        F.coalesce("O", F.lit(0.0)).alias("qty_O"),
    )


# ==========================================================================
# Remaining TPC-H query shapes. The driver's tables have no `partsupp` and
# lineitem lacks commitdate/receiptdate/shipmode, so Q2/Q9/Q11/Q16/Q20
# derive supplier-part relationships from DISTINCT (l_partkey, l_suppkey)
# and Q12/Q21 use shipping lag (l_shipdate - o_orderdate) as the lateness
# signal. Join/agg/subquery SHAPE is preserved in every case.
# ==========================================================================


# --------------------------------------------------------------------------
# Q2 shape: min-cost supplier per part (correlated-min over a candidate set).
# Scale: the window min shuffles once on p_partkey; candidate set is already
# reduced by part-type/size + region pushdown before the window.
@query(
    "q02_min_cost_supplier",
    oracle="""
    WITH sp AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
    cand AS (
      SELECT p_partkey, p_name, s_suppkey, s_name, s_acctbal, n_name
      FROM part
      JOIN sp ON p_partkey = l_partkey
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation ON s_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      WHERE r_name = 'EUROPE' AND p_type = 'STANDARD' AND p_size <= 10
    ),
    mins AS (SELECT p_partkey AS mk, MIN(s_acctbal) AS min_bal FROM cand GROUP BY p_partkey)
    SELECT s_acctbal, s_name, n_name, p_partkey, p_name, s_suppkey
    FROM cand JOIN mins ON p_partkey = mk AND s_acctbal = min_bal
    ORDER BY s_acctbal DESC, n_name, s_name, p_partkey, s_suppkey
    LIMIT 100
    """,
    tags=("join", "window:min", "topk", "tpch:q02-shape"),
)
def q02_min_cost_supplier(spark, sf_dir) -> DataFrame:
    from pyspark.sql import Window

    t = load_tables(spark, sf_dir, ["part", "lineitem", "supplier", "nation", "region"])
    sp = t["lineitem"].select("l_partkey", "l_suppkey").distinct()
    part = t["part"].filter((F.col("p_type") == "STANDARD") & (F.col("p_size") <= 10))
    nat = t["nation"].join(
        F.broadcast(t["region"].filter(F.col("r_name") == "EUROPE")),
        F.col("n_regionkey") == F.col("r_regionkey"),
    )
    cand = (
        part.join(sp, F.col("p_partkey") == F.col("l_partkey"))
        .join(t["supplier"], F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("p_partkey", "p_name", "s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    w = Window.partitionBy("p_partkey")
    ranked = cand.withColumn("min_bal", F.min("s_acctbal").over(w)).filter(
        F.col("s_acctbal") == F.col("min_bal")
    )
    out = ranked.select("s_acctbal", "s_name", "n_name", "p_partkey", "p_name", "s_suppkey")
    return top_k(
        out,
        [F.col("s_acctbal").desc(), F.col("n_name"), F.col("s_name"), F.col("p_partkey"), F.col("s_suppkey")],
        100,
    )


# --------------------------------------------------------------------------
# Q8 shape: national market share — two nation roles (customer region,
# supplier nation), conditional agg ratio per order year.
@query(
    "q08_market_share",
    oracle=f"""
    SELECT strftime(o_orderdate, '%Y') AS o_year,
           {osum(f"CASE WHEN sn.n_name = 'NATION_5' THEN {_O_REV} ELSE 0 END", 6)}
             / {osum(_O_REV, 6)} AS mkt_share,
           COUNT(*) AS n_lines
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation cn ON c_nationkey = cn.n_nationkey
    JOIN region ON cn.n_regionkey = r_regionkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation sn ON s_nationkey = sn.n_nationkey
    JOIN part ON l_partkey = p_partkey
    WHERE r_name = 'ASIA' AND p_type = 'PROMO'
      AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
    GROUP BY o_year
    """,
    tags=("join", "agg:conditional", "tpch:q08-shape"),
)
def q08_market_share(spark, sf_dir) -> DataFrame:
    t = load_tables(
        spark, sf_dir, ["lineitem", "orders", "customer", "supplier", "part", "nation", "region"]
    )
    cust_nat = t["nation"].join(
        F.broadcast(t["region"].filter(F.col("r_name") == "ASIA")),
        F.col("n_regionkey") == F.col("r_regionkey"),
    ).select(F.col("n_nationkey").alias("cn_key"))
    supp_nat = t["nation"].select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("sn_name")
    )
    orders = t["orders"].filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp_ntz"))
    )
    part = t["part"].filter(F.col("p_type") == "PROMO")
    nation_rev = F.when(F.col("sn_name") == "NATION_5", _rev()).otherwise(F.lit(0.0))
    return (
        t["lineitem"]
        .join(part, F.col("l_partkey") == F.col("p_partkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(cust_nat), F.col("c_nationkey") == F.col("cn_key"))
        .join(t["supplier"], F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(supp_nat), F.col("s_nationkey") == F.col("sn_key"))
        .groupBy(F.date_format("o_orderdate", "yyyy").alias("o_year"))
        .agg(
            (dsum(nation_rev, 6) / dsum(_rev(), 6)).alias("mkt_share"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


# --------------------------------------------------------------------------
# Q9 shape: product-type profit by supplier nation and year. No partsupp →
# cost proxied as 0.5 * p_retailprice * l_quantity (same join/agg shape).
@query(
    "q09_product_profit",
    oracle=f"""
    SELECT n_name AS nation, strftime(o_orderdate, '%Y') AS o_year,
           {osum(f"{_O_REV} - 0.5 * p_retailprice * l_quantity", 8)} AS sum_profit
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation ON s_nationkey = n_nationkey
    JOIN part ON l_partkey = p_partkey
    WHERE p_name LIKE '%widget%'
    GROUP BY n_name, strftime(o_orderdate, '%Y')
    """,
    tags=("join", "agg", "tpch:q09-shape"),
)
def q09_product_profit(spark, sf_dir) -> DataFrame:
    t = load_tables(spark, sf_dir, ["lineitem", "orders", "supplier", "nation", "part"])
    part = t["part"].filter(F.col("p_name").like("%widget%"))
    profit = _rev() - 0.5 * F.col("p_retailprice") * F.col("l_quantity")
    return (
        t["lineitem"]
        .join(part, F.col("l_partkey") == F.col("p_partkey"))
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(t["supplier"], F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(t["nation"]), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.date_format("o_orderdate", "yyyy").alias("o_year"),
        )
        .agg(dsum(profit, 8).alias("sum_profit"))
    )


# --------------------------------------------------------------------------
# Q11 shape: important stock — per-part value for one nation's suppliers,
# HAVING above a scalar-subquery fraction of the total. The scalar total is
# a 1-row broadcast; the per-part agg shuffles once on l_partkey.
@query(
    "q11_important_stock",
    oracle="""
    WITH v AS (
      SELECT l_partkey AS partkey,
             SUM(CAST(l_extendedprice AS DECIMAL(38,2))) AS val
      FROM lineitem
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation ON s_nationkey = n_nationkey
      WHERE n_name = 'NATION_3'
      GROUP BY l_partkey
    )
    SELECT partkey, CAST(val AS DOUBLE) AS value
    FROM v
    WHERE CAST(val AS DOUBLE) > (SELECT CAST(SUM(val) AS DOUBLE) FROM v) * 0.001
    """,
    tags=("agg", "subquery:scalar", "tpch:q11-shape"),
)
def q11_important_stock(spark, sf_dir) -> DataFrame:
    t = load_tables(spark, sf_dir, ["lineitem", "supplier", "nation"])
    nat = t["nation"].filter(F.col("n_name") == "NATION_3")
    v = (
        t["lineitem"]
        .join(t["supplier"], F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(F.col("l_partkey").alias("partkey"))
        .agg(F.sum(F.col("l_extendedprice").cast("decimal(38,2)")).alias("val"))
    )
    total = v.agg(F.sum("val").cast("double").alias("total"))
    return (
        v.crossJoin(F.broadcast(total))
        .filter(F.col("val").cast("double") > F.col("total") * 0.001)
        .select("partkey", F.col("val").cast("double").alias("value"))
    )


# --------------------------------------------------------------------------
# Q12 shape: late-shipment priority counts. No shipmode/receiptdate →
# lateness = shipped >60 days after order date, bucketed by returnflag.
@query(
    "q12_late_shipments",
    oracle="""
    SELECT l_returnflag,
           COUNT(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 END) AS high_line_count,
           COUNT(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 END) AS low_line_count
    FROM orders
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate >= o_orderdate + INTERVAL 60 DAY
      AND l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
    GROUP BY l_returnflag
    """,
    tags=("join", "agg:conditional", "tpch:q12-shape"),
)
def q12_late_shipments(spark, sf_dir) -> DataFrame:
    t = load_tables(spark, sf_dir, ["orders", "lineitem"])
    li = t["lineitem"].filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp_ntz"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(t["orders"], F.col("o_orderkey") == F.col("l_orderkey"))
        .filter(F.col("l_shipdate") >= F.expr("o_orderdate + INTERVAL 60 DAY"))
        .groupBy("l_returnflag")
        .agg(
            F.count(F.when(high, 1)).alias("high_line_count"),
            F.count(F.when(~high, 1)).alias("low_line_count"),
        )
    )


# --------------------------------------------------------------------------
# Q14: promo revenue share for one ship month (conditional-agg ratio).
@query(
    "q14_promo_revenue",
    oracle=f"""
    SELECT 100.00 * {osum(f"CASE WHEN p_type = 'PROMO' THEN {_O_REV} ELSE 0 END", 6)}
             / {osum(_O_REV, 6)} AS promo_revenue
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1997-09-01' AND l_shipdate < TIMESTAMP '1997-10-01'
    """,
    tags=("join", "agg:conditional", "tpch:q14"),
)
def q14_promo_revenue(spark, sf_dir) -> DataFrame:
    t = load_tables(spark, sf_dir, ["lineitem", "part"])
    li = t["lineitem"].filter(
        (F.col("l_shipdate") >= F.lit("1997-09-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1997-10-01 00:00:00").cast("timestamp_ntz"))
    )
    promo = F.when(F.col("p_type") == "PROMO", _rev()).otherwise(F.lit(0.0))
    return li.join(t["part"], F.col("l_partkey") == F.col("p_partkey")).agg(
        (F.lit(100.0) * dsum(promo, 6) / dsum(_rev(), 6)).alias("promo_revenue")
    )


# --------------------------------------------------------------------------
# Q15: top supplier by quarterly revenue (agg + scalar-max subquery).
@query(
    "q15_top_supplier",
    oracle="""
    WITH rev AS (
      SELECT l_suppkey AS suppkey,
             SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))) AS total_rev
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1997-04-01'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, CAST(total_rev AS DOUBLE) AS total_revenue
    FROM supplier JOIN rev ON s_suppkey = suppkey
    WHERE total_rev = (SELECT MAX(total_rev) FROM rev)
    ORDER BY s_suppkey
    """,
    tags=("agg", "subquery:scalar", "tpch:q15"),
)
def q15_top_supplier(spark, sf_dir) -> DataFrame:
    t = load_tables(spark, sf_dir, ["lineitem", "supplier"])
    rev = (
        t["lineitem"]
        .filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1997-04-01 00:00:00").cast("timestamp_ntz"))
        )
        .groupBy(F.col("l_suppkey").alias("suppkey"))
        .agg(F.sum(_rev().cast("decimal(38,6)")).alias("total_rev"))
    )
    mx = rev.agg(F.max("total_rev").alias("max_rev"))
    return (
        rev.crossJoin(F.broadcast(mx))
        .filter(F.col("total_rev") == F.col("max_rev"))
        .join(t["supplier"], F.col("suppkey") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", F.col("total_rev").cast("double").alias("total_revenue"))
        .orderBy("s_suppkey")
    )


# --------------------------------------------------------------------------
# Q16 shape: supplier count per brand/type/size, excluding flagged
# suppliers (NOT IN → anti join). Supplier-part pairs derived from lineitem.
@query(
    "q16_parts_supplier",
    oracle="""
    WITH sp AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
    SELECT p_brand, p_type, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
    FROM sp
    JOIN part ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#5' AND p_type <> 'PROMO'
      AND p_size IN (1, 4, 9, 14, 19, 23, 36, 45)
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p_brand, p_type, p_size
    """,
    tags=("join:anti", "agg:distinct", "tpch:q16-shape"),
)
def q16_parts_supplier(spark, sf_dir) -> DataFrame:
    t = load_tables(spark, sf_dir, ["lineitem", "part", "supplier"])
    sp = t["lineitem"].select("l_partkey", "l_suppkey").distinct()
    part = t["part"].filter(
        (F.col("p_brand") != "Brand#5")
        & (F.col("p_type") != "PROMO")
        & (F.col("p_size").isin(1, 4, 9, 14, 19, 23, 36, 45))
    )
    # flagged is O(supplier) — no broadcast hint; AQE sizes it at runtime
    flagged = t["supplier"].filter(F.col("s_acctbal") < 0).select("s_suppkey")
    return (
        sp.join(flagged, F.col("l_suppkey") == F.col("s_suppkey"), "left_anti")
        .join(part, F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


# --------------------------------------------------------------------------
# Q17 shape: small-quantity revenue vs per-part average quantity
# (correlated avg → per-part agg join; p_container → p_size bucket).
@query(
    "q17_small_quantity",
    oracle="""
    WITH pq AS (
      SELECT l_partkey AS pk,
             CAST(SUM(CAST(l_quantity AS DECIMAL(38,2))) AS DOUBLE) / COUNT(*) AS avg_qty
      FROM lineitem GROUP BY l_partkey
    )
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,2))) AS DOUBLE) / 7.0 AS avg_yearly,
           COUNT(*) AS n_lines
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    JOIN pq ON pk = l_partkey
    WHERE p_brand = 'Brand#23' AND p_size < 10
      AND l_quantity < 0.5 * avg_qty
    """,
    tags=("join", "subquery:correlated-avg", "tpch:q17-shape"),
)
def q17_small_quantity(spark, sf_dir) -> DataFrame:
    t = load_tables(spark, sf_dir, ["lineitem", "part"])
    pq = (
        t["lineitem"]
        .groupBy(F.col("l_partkey").alias("pk"))
        .agg(
            (F.sum(F.col("l_quantity").cast("decimal(38,2)")).cast("double") / F.count(F.lit(1))).alias("avg_qty")
        )
    )
    part = t["part"].filter((F.col("p_brand") == "Brand#23") & (F.col("p_size") < 10))
    return (
        t["lineitem"]
        .join(part, F.col("p_partkey") == F.col("l_partkey"))
        .join(pq, F.col("pk") == F.col("l_partkey"))
        .filter(F.col("l_quantity") < 0.5 * F.col("avg_qty"))
        .agg(
            (F.sum(F.col("l_extendedprice").cast("decimal(38,2)")).cast("double") / 7.0).alias("avg_yearly"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


# --------------------------------------------------------------------------
# Q20 shape: suppliers shipping above-average volume of a part family in a
# year, restricted to one nation (agg + scalar threshold + dim joins).
@query(
    "q20_heavy_shippers",
    oracle="""
    WITH shipped AS (
      SELECT l_suppkey AS suppkey,
             SUM(CAST(l_quantity AS DECIMAL(38,2))) AS qty
      FROM lineitem
      JOIN part ON l_partkey = p_partkey
      WHERE p_name LIKE 'small%'
        AND l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, CAST(qty AS DOUBLE) AS small_qty
    FROM supplier
    JOIN shipped ON s_suppkey = suppkey
    JOIN nation ON s_nationkey = n_nationkey
    WHERE n_name = 'NATION_7'
      AND CAST(qty AS DOUBLE) > 0.5 * (SELECT CAST(SUM(qty) AS DOUBLE) / COUNT(*) FROM shipped)
    ORDER BY s_suppkey
    """,
    tags=("agg", "subquery:scalar", "tpch:q20-shape"),
)
def q20_heavy_shippers(spark, sf_dir) -> DataFrame:
    t = load_tables(spark, sf_dir, ["lineitem", "part", "supplier", "nation"])
    part = t["part"].filter(F.col("p_name").like("small%"))
    shipped = (
        t["lineitem"]
        .filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp_ntz"))
        )
        .join(part, F.col("l_partkey") == F.col("p_partkey"))
        .groupBy(F.col("l_suppkey").alias("suppkey"))
        .agg(F.sum(F.col("l_quantity").cast("decimal(38,2)")).alias("qty"))
    )
    avg_qty = shipped.agg(
        (F.sum("qty").cast("double") / F.count(F.lit(1))).alias("avg_qty")
    )
    nat = t["nation"].filter(F.col("n_name") == "NATION_7")
    return (
        shipped.crossJoin(F.broadcast(avg_qty))
        .filter(F.col("qty").cast("double") > 0.5 * F.col("avg_qty"))
        .join(t["supplier"], F.col("suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", "s_name", F.col("qty").cast("double").alias("small_qty"))
        .orderBy("s_suppkey")
    )


# --------------------------------------------------------------------------
# Q21 shape: suppliers who alone were late on multi-supplier F-status
# orders (EXISTS other-supplier + NOT EXISTS other-late-supplier →
# conditional semi + anti joins). Lateness = shipped >100 days after order.
@query(
    "q21_waiting_suppliers",
    oracle="""
    WITH l AS (
      SELECT l_orderkey, l_suppkey, l_shipdate, o_orderdate
      FROM lineitem JOIN orders ON o_orderkey = l_orderkey
      WHERE o_orderstatus = 'F'
    ),
    late AS (
      SELECT DISTINCT l_orderkey, l_suppkey FROM l
      WHERE l_shipdate > o_orderdate + INTERVAL 100 DAY
    ),
    everyone AS (SELECT DISTINCT l_orderkey, l_suppkey FROM l)
    SELECT s_name, COUNT(*) AS numwait
    FROM late l1
    JOIN supplier ON l1.l_suppkey = s_suppkey
    WHERE EXISTS (SELECT 1 FROM everyone o
                  WHERE o.l_orderkey = l1.l_orderkey AND o.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM late l2
                      WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 20
    """,
    tags=("join:semi", "join:anti", "agg", "topk", "tpch:q21-shape"),
)
def q21_waiting_suppliers(spark, sf_dir) -> DataFrame:
    t = load_tables(spark, sf_dir, ["lineitem", "orders", "supplier"])
    base = (
        t["lineitem"]
        .join(t["orders"].filter(F.col("o_orderstatus") == "F"),
              F.col("o_orderkey") == F.col("l_orderkey"))
        .select("l_orderkey", "l_suppkey", "l_shipdate", "o_orderdate")
    )
    late = (
        base.filter(F.col("l_shipdate") > F.expr("o_orderdate + INTERVAL 100 DAY"))
        .select("l_orderkey", "l_suppkey")
        .distinct()
    )
    everyone = base.select("l_orderkey", "l_suppkey").distinct()
    oth = everyone.select(
        F.col("l_orderkey").alias("o_ok"), F.col("l_suppkey").alias("o_sk")
    )
    oth_late = late.select(
        F.col("l_orderkey").alias("x_ok"), F.col("l_suppkey").alias("x_sk")
    )
    lone_late = (
        late.join(
            oth,
            (F.col("l_orderkey") == F.col("o_ok")) & (F.col("l_suppkey") != F.col("o_sk")),
            "left_semi",
        ).join(
            oth_late,
            (F.col("l_orderkey") == F.col("x_ok")) & (F.col("l_suppkey") != F.col("x_sk")),
            "left_anti",
        )
    )
    agg = (
        lone_late.join(t["supplier"], F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )
    return top_k(agg, [F.col("numwait").desc(), F.col("s_name")], 20)
