"""Driver-checked Structured Streaming queries.

The six streaming jobs in `streaming/jobs.py` are pytest-verified against
their batch twins; the two queries here additionally put REAL streaming
executions under the driver's DuckDB-oracle gate: each runs a bounded
Structured Streaming query to completion (`Trigger.AvailableNow` → memory
sink) over the driver's parquet testdata and returns the sink table. The
oracle is plain batch SQL — streaming-vs-batch equivalence IS the check
(the strongest correctness statement Structured Streaming offers for
bounded input: same result as the batch query over the same data).

Determinism notes:
- AvailableNow over a single parquet file processes everything before the
  final watermark advance, so `complete`-mode aggregation emits every
  window and `dropDuplicatesWithinWatermark` holds every key in state —
  no row is dropped as late (the late-data PATH is still exercised: the
  watermark operator runs, state is keyed and evicted by the same code
  that runs unbounded).
- Double sums use the exact-decimal accumulator (`functions.dsum`) like
  every batch query, so state-update order cannot change the result.
- Each run gets a fresh checkpoint dir (mkdtemp) and a unique memory-sink
  name, so repeated in-process runs (bench pass 1/2, driver re-checks)
  restart from scratch instead of replaying a checkpoint.

Scale: the memory sink is the TEST harness, not the design — production
writes go to the parquet/table sinks in `streaming/jobs.py`. Watermarked
window state is bounded by (windows in horizon × event types); dedup
state by keys per horizon. Both shapes are the standard unbounded-stream
designs (SCALE.md §Streaming).
"""

from __future__ import annotations

import itertools
import tempfile

from pyspark.sql import DataFrame, functions as F

from ..functions import TS_FMT_DUCK, TS_FMT_SPARK, dsum, osum
from ..streaming.jobs import EVENTS_DDL
from .registry import query

_run_counter = itertools.count()

# The file streaming source requires a DIRECTORY; the testdata ships one
# parquet file per table. Stage a per-sf_dir temp directory holding a
# symlink to events.parquet (no copy — the source follows local links).
_stream_dir_cache: dict[str, str] = {}


def _events_stream_dir(sf_dir: str) -> str:
    import os

    key = os.path.abspath(sf_dir)
    d = _stream_dir_cache.get(key)
    if d is None or not os.path.isdir(d):
        d = tempfile.mkdtemp(prefix="eiws_stream_src_")
        os.symlink(os.path.join(key, "events.parquet"), os.path.join(d, "events.parquet"))
        _stream_dir_cache[key] = d
    return d


def _run_to_memory(stream_df: DataFrame, spark, mode: str, prefix: str) -> DataFrame:
    """Drive a streaming DataFrame to completion into a uniquely-named
    memory sink; returns the sink table."""
    name = f"{prefix}_{next(_run_counter)}"
    ck = tempfile.mkdtemp(prefix=f"eiws_{prefix}_ck_")
    q = (
        stream_df.writeStream.outputMode(mode)
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name)


@query(
    "q_stream_event_windows",
    # batch twin of the STREAMING execution — the same windows/counts/sums
    # the batch q_event_windows oracle computes
    oracle=f"""
    SELECT strftime(time_bucket(INTERVAL '1 hour', ts), '{TS_FMT_DUCK}') AS window_start,
           event_type,
           COUNT(*) AS n_events,
           {osum('value', 2)} AS sum_value
    FROM events
    GROUP BY 1, 2
    """,
    tags=("streaming:windowed-agg", "window:tumbling"),
)
def q_stream_event_windows(spark, sf_dir) -> DataFrame:
    """Watermarked tumbling-window aggregation executed AS A STREAM
    (AvailableNow, complete mode): per-hour event counts and exact value
    sums; must equal the batch aggregation over the same data."""
    stream = spark.readStream.schema(EVENTS_DDL).parquet(_events_stream_dir(sf_dir))
    agg = (
        stream.withColumn("ts", F.col("ts").cast("timestamp"))
        .withWatermark("ts", "2 hours")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dsum(F.col("value"), 2).alias("sum_value"),
        )
    )
    out = _run_to_memory(agg, spark, "complete", "stream_win")
    return out.select(
        F.date_format(F.col("w.start"), TS_FMT_SPARK).alias("window_start"),
        "event_type",
        "n_events",
        "sum_value",
    )


@query(
    "q_stream_dedup",
    # the stream re-delivers every event twice; first-wins dedup on the key
    # must reduce it back to exactly the distinct batch rows
    oracle=f"""
    SELECT event_id, strftime(ts, '{TS_FMT_DUCK}') AS ts, user_id, event_type
    FROM events
    """,
    tags=("streaming:dedup", "cdc"),
)
def q_stream_dedup(spark, sf_dir) -> DataFrame:
    """Streaming at-least-once dedup executed AS A STREAM: the source is
    unioned with itself (every event delivered twice — the re-delivery
    shape of at-least-once ingestion) and
    `dropDuplicatesWithinWatermark(event_id)` must restore exactly-once:
    one row per event, equal to the batch table."""
    src = spark.readStream.schema(EVENTS_DDL).parquet(_events_stream_dir(sf_dir))
    redelivered = src.union(src)
    dedup = (
        redelivered.withColumn("ts", F.col("ts").cast("timestamp"))
        .withWatermark("ts", "2 hours")
        .dropDuplicatesWithinWatermark(["event_id"])
    )
    out = _run_to_memory(dedup, spark, "append", "stream_dedup")
    return out.select(
        "event_id",
        F.date_format("ts", TS_FMT_SPARK).alias("ts"),
        "user_id",
        "event_type",
    )
