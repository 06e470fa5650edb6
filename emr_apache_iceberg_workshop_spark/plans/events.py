"""CDC / incremental surface over the `events` table.

This is where the reference's actual engine-specific semantics live
(SURVEY.md §2.3 J1 merge, §2.5 W1 window dedup, §2.6 O1 top-1): `events`
stands in for the CDC stream (FIXTURES.md §B), `user_id` for the business
key, `ts` for `processed_time`.

All timestamps are emitted as µs-precision strings (functions.exact
TS_FMT_*) so Spark and DuckDB hash identically; ordering ties are broken
by `event_id` (the raw ns timestamp is not visible to DuckDB, which
truncates to µs on read — so it must never decide order alone).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..catalog import load_table
from ..functions import dsum, osum, TS_FMT_SPARK, TS_FMT_DUCK
from ..operators import dedup_latest, merge_upsert, top_k
from .registry import query

_CUTOFF = "2024-01-20 00:00:00"


# --------------------------------------------------------------------------
# W1 parity: latest event per user (window dedup, rn = 1)
@query(
    "q_latest_event_per_user",
    oracle=f"""
    SELECT user_id, event_id AS last_event_id,
           strftime(ts, '{TS_FMT_DUCK}') AS last_ts,
           event_type, value
    FROM (SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
          FROM events)
    WHERE rn = 1
    """,
    tags=("window", "reference:W1,P3"),
)
def q_latest_event_per_user(spark, sf_dir) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return dedup_latest(ev, ["user_id"], [F.col("ts").desc(), F.col("event_id").desc()]).select(
        "user_id",
        F.col("event_id").alias("last_event_id"),
        F.date_format("ts", TS_FMT_SPARK).alias("last_ts"),
        "event_type",
        "value",
    )


# --------------------------------------------------------------------------
# J1 parity: MERGE INTO emulation — upsert post-cutoff state into pre-cutoff
@query(
    "q_merge_upsert",
    oracle=f"""
    WITH tgt AS (
      SELECT user_id, event_id, ts, event_type, value FROM (
        SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        FROM events WHERE ts < TIMESTAMP '{_CUTOFF}') WHERE rn = 1
    ), src AS (
      SELECT user_id, event_id, ts, event_type, value FROM (
        SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        FROM events WHERE ts >= TIMESTAMP '{_CUTOFF}') WHERE rn = 1
    )
    SELECT COALESCE(src.user_id, tgt.user_id) AS user_id,
           CASE WHEN src.user_id IS NOT NULL THEN src.event_id ELSE tgt.event_id END AS event_id,
           strftime(CASE WHEN src.user_id IS NOT NULL THEN src.ts ELSE tgt.ts END, '{TS_FMT_DUCK}') AS ts,
           CASE WHEN src.user_id IS NOT NULL THEN src.event_type ELSE tgt.event_type END AS event_type,
           CASE WHEN src.user_id IS NOT NULL THEN src.value ELSE tgt.value END AS value,
           CASE WHEN src.user_id IS NOT NULL AND tgt.user_id IS NOT NULL THEN 'update'
                WHEN tgt.user_id IS NULL THEN 'insert'
                ELSE 'keep' END AS merge_action
    FROM tgt FULL JOIN src ON tgt.user_id = src.user_id
    """,
    tags=("merge", "reference:J1,C6"),
)
def q_merge_upsert(spark, sf_dir) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "ts", "event_type", "value"
    )
    cutoff = F.lit(_CUTOFF).cast("timestamp_ntz")
    order = [F.col("ts").desc(), F.col("event_id").desc()]
    target = dedup_latest(ev.filter(F.col("ts") < cutoff), ["user_id"], order)
    source = dedup_latest(ev.filter(F.col("ts") >= cutoff), ["user_id"], order)
    merged = merge_upsert(target, source, ["user_id"], action_col="merge_action")
    return merged.select(
        "user_id",
        "event_id",
        F.date_format("ts", TS_FMT_SPARK).alias("ts"),
        "event_type",
        "value",
        "merge_action",
    )


# --------------------------------------------------------------------------
# Tumbling-window aggregation (batch twin of the streaming job)
@query(
    "q_event_windows",
    oracle=f"""
    SELECT strftime(time_bucket(INTERVAL '1 hour', ts), '{TS_FMT_DUCK}') AS window_start,
           event_type,
           COUNT(*) AS n_events,
           {osum('value', 2)} AS sum_value,
           COUNT(DISTINCT user_id) AS n_users
    FROM events
    GROUP BY 1, 2
    """,
    tags=("window:tumbling", "streaming:batch-twin"),
)
def q_event_windows(spark, sf_dir) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dsum(F.col("value"), 2).alias("sum_value"),
            F.countDistinct("user_id").alias("n_users"),
        )
        .select(
            F.date_format(F.col("w.start"), TS_FMT_SPARK).alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
            "n_users",
        )
    )


# --------------------------------------------------------------------------
# O1 parity: global top-1 by timestamp (TakeOrderedAndProject)
@query(
    "q_latest_event",
    oracle=f"""
    SELECT event_id, strftime(ts, '{TS_FMT_DUCK}') AS ts, user_id, event_type
    FROM events ORDER BY ts DESC, event_id DESC LIMIT 1
    """,
    tags=("topk", "reference:O1"),
)
def q_latest_event(spark, sf_dir) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return top_k(ev, [F.col("ts").desc(), F.col("event_id").desc()], 1).select(
        "event_id",
        F.date_format("ts", TS_FMT_SPARK).alias("ts"),
        "user_id",
        "event_type",
    )


# --------------------------------------------------------------------------
# JSON property extraction (semi-structured scalar fns)
@query(
    "q_props_stats",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
           COUNT(DISTINCT CAST(json_extract_string(props, '$.k') AS BIGINT)) AS distinct_k
    FROM events
    GROUP BY event_type
    """,
    tags=("json", "agg"),
)
def q_props_stats(spark, sf_dir) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("bigint")
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(k).alias("sum_k"),
        F.countDistinct(k).alias("distinct_k"),
    )


# --------------------------------------------------------------------------
# Sessionization: gap-based sessions per user (lag + cumulative sum windows)
@query(
    "q_sessionization",
    oracle=f"""
    WITH flagged AS (
      SELECT user_id, ts, event_id,
             CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       > INTERVAL '30 minutes' OR
                       LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS new_sess
      FROM events
    ), sess AS (
      SELECT user_id, ts, event_id,
             SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS UNBOUNDED PRECEDING) AS session_no
      FROM flagged
    )
    SELECT user_id, CAST(session_no AS BIGINT) AS session_no, COUNT(*) AS n_events,
           strftime(MIN(ts), '{TS_FMT_DUCK}') AS session_start,
           strftime(MAX(ts), '{TS_FMT_DUCK}') AS session_end
    FROM sess GROUP BY user_id, session_no
    """,
    tags=("window:sessionization",),
)
def q_sessionization(spark, sf_dir) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # gap computed on the raw int64 ns column (ts_ns) — same ordering as ts,
    # avoids ntz→numeric casts; 30 min = 1.8e12 ns
    gap = F.col("ts_ns") - F.lag("ts_ns").over(w)
    flagged = ev.withColumn(
        "new_sess", F.when(gap.isNull() | (gap > F.lit(1_800_000_000_000)), 1).otherwise(0)
    )
    sess = flagged.withColumn(
        "session_no", F.sum("new_sess").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    return sess.groupBy("user_id", "session_no").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.date_format(F.min("ts"), TS_FMT_SPARK).alias("session_start"),
        F.date_format(F.max("ts"), TS_FMT_SPARK).alias("session_end"),
    )


# --------------------------------------------------------------------------
# Skew-resilient join, oracle-proof: the salted physical strategy must be
# OBSERVABLY identical to the plain equi-join. Events (the "skewed" fact)
# join customers (the dim, replicated salt ways) on user_id; output is a
# per-segment engagement profile. At 100 TB with a power-law user_id this
# is the strategy that keeps the hottest key off a single reducer; here the
# oracle proves salting changes nothing but the partitioning.
@query(
    "q_salted_engagement",
    oracle=f"""
    SELECT c.c_mktsegment AS segment,
           e.event_type,
           COUNT(*) AS n_events,
           CAST(COUNT(DISTINCT e.user_id) AS BIGINT) AS n_users,
           {osum('e.value', 2)} AS total_value
    FROM events e JOIN customer c ON c.c_custkey = e.user_id
    GROUP BY 1, 2
    """,
    tags=("join:salted", "skew"),
)
def q_salted_engagement(spark, sf_dir) -> DataFrame:
    from ..catalog import load_table
    from ..operators import salted_join

    events = load_table(spark, sf_dir, "events").select("user_id", "event_type", "value")
    cust = load_table(spark, sf_dir, "customer").selectExpr(
        "c_custkey AS user_id", "c_mktsegment AS segment"
    )
    joined = salted_join(events, cust, ["user_id"], salt=8)
    return joined.groupBy("segment", "event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
        dsum(F.col("value"), 2).alias("total_value"),
    )


# --------------------------------------------------------------------------
# Ordered conversion funnel: view → click (after the view) → purchase
# (after that click), strictly sequenced per user. Expressed as three
# user_id-keyed aggregations chained by joins — every shuffle is on the
# same high-cardinality key (AQE reuses the partitioning), each MIN is
# map-side partial, and nothing materializes per-event state. The shape
# survives 100 TB because each stage is filter → partial-agg → same-key
# join; no window over the whole event stream, no per-user arrays.
@query(
    "q_funnel_steps",
    oracle="""
    WITH v AS (SELECT user_id, MIN(epoch_ns(ts)) AS t_view_ns
               FROM events WHERE event_type = 'view' GROUP BY user_id),
         c AS (SELECT e.user_id, MIN(epoch_ns(e.ts)) AS t_click_ns
               FROM events e JOIN v USING (user_id)
               WHERE e.event_type = 'click' AND epoch_ns(e.ts) > v.t_view_ns
               GROUP BY e.user_id),
         p AS (SELECT e.user_id, MIN(epoch_ns(e.ts)) AS t_purchase_ns
               FROM events e JOIN c USING (user_id)
               WHERE e.event_type = 'purchase' AND epoch_ns(e.ts) > c.t_click_ns
               GROUP BY e.user_id)
    SELECT v.user_id, v.t_view_ns, c.t_click_ns, p.t_purchase_ns,
           CAST(1 + (c.user_id IS NOT NULL)::INT + (p.user_id IS NOT NULL)::INT
                AS BIGINT) AS steps_completed
    FROM v LEFT JOIN c USING (user_id) LEFT JOIN p USING (user_id)
    """,
    tags=("events:funnel", "analytics"),
)
def q_funnel_steps(spark, sf_dir) -> DataFrame:
    """Per-user strict-order funnel over the event stream: the first
    view, the first click AFTER that view, the first purchase AFTER that
    click; `steps_completed` counts how deep each user got."""
    ev = load_table(spark, sf_dir, "events").select("user_id", "event_type", "ts_ns")
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts_ns").alias("t_view_ns"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts_ns") > F.col("t_view_ns"))
        .groupBy("user_id")
        .agg(F.min("ts_ns").alias("t_click_ns"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts_ns") > F.col("t_click_ns"))
        .groupBy("user_id")
        .agg(F.min("ts_ns").alias("t_purchase_ns"))
    )
    return (
        v.join(c, "user_id", "left")
        .join(p, "user_id", "left")
        .selectExpr(
            "user_id",
            "t_view_ns",
            "t_click_ns",
            "t_purchase_ns",
            "CAST(1 + CAST(t_click_ns IS NOT NULL AS INT)"
            " + CAST(t_purchase_ns IS NOT NULL AS INT) AS BIGINT)"
            " AS steps_completed",
        )
    )


# --------------------------------------------------------------------------
# Weekly retention cohorts: users grouped by first-seen ISO week, counted
# in every subsequent week they were active. Two same-key shuffles
# (first-seen per user, distinct active weeks per user) + one join; the
# output is O(weeks²) regardless of event volume — the canonical
# retention triangle at any scale.
@query(
    "q_retention_cohorts",
    oracle="""
    WITH firsts AS (
      SELECT user_id, date_trunc('week', MIN(ts)) AS cohort_week
      FROM events GROUP BY user_id),
    active AS (
      SELECT DISTINCT user_id, date_trunc('week', ts) AS active_week
      FROM events)
    SELECT strftime(f.cohort_week, '%Y-%m-%d') AS cohort_week,
           CAST(date_diff('day', f.cohort_week, a.active_week) / 7 AS BIGINT)
             AS week_offset,
           CAST(COUNT(DISTINCT a.user_id) AS BIGINT) AS n_users
    FROM active a JOIN firsts f USING (user_id)
    GROUP BY 1, 2
    """,
    tags=("events:retention", "analytics"),
)
def q_retention_cohorts(spark, sf_dir) -> DataFrame:
    """Cohort retention triangle: first-seen ISO week per user × the
    weeks they came back, as (cohort_week, week_offset, n_users)."""
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts")
    firsts = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort_week")
    )
    active = ev.select(
        "user_id", F.date_trunc("week", F.col("ts")).alias("active_week")
    ).distinct()
    return (
        active.join(firsts, "user_id")
        .groupBy(
            F.date_format("cohort_week", "yyyy-MM-dd").alias("cohort_week"),
            (
                F.datediff(F.to_date("active_week"), F.to_date("cohort_week")) / 7
            ).cast("bigint").alias("week_offset"),
        )
        .agg(F.countDistinct("user_id").alias("n_users"))
    )
