"""Testdata catalog: load the driver's parquet tables with stable schemas.

The `events` table has shipped in two layouts across testdata generations:
(a) parquet TIMESTAMP(NANOS) — Spark's vectorized reader rejects it, so it
is read with an explicit LONG schema and truncated ns → µs exactly as
DuckDB does on read; (b) native µs TIMESTAMP — read directly (Spark and
DuckDB see identical values). `load_table` detects the layout from the
footer schema (one driver-side file-listing, no data read) and always
exposes the same two columns: `ts` (µs TIMESTAMP_NTZ) and `ts_ns`
(int64 ns since epoch, for range frames and gap math in ns units).

Scale notes: reads are plain `spark.read.parquet` — column pruning and
predicate pushdown reach the scan via Catalyst. Filters on `events.ts`
should prefer `ts_ns` (raw int64) when pushdown matters, since the derived
timestamp column is a computed expression.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Truly constant-size dimensions — safe to broadcast-hint at ANY scale
# (5 / 25 rows regardless of SF). Everything else (customer, supplier,
# part, orders) grows linearly with SF: leave those joins unhinted and let
# AQE's runtime-size decision pick broadcast vs sort-merge.
BROADCAST_TABLES = ("region", "nation")

_EVENTS_RAW_SCHEMA = (
    "event_id long, ts long, user_id long, event_type string, value double, props string"
)


def _events_ts_unit(path: str) -> str:
    """Physical unit of events.ts, read from ONE parquet footer driver-side
    (pyarrow — Spark's own schema inference THROWS PARQUET_TYPE_ILLEGAL on
    the legacy TIMESTAMP(NANOS) layout, so detection cannot go through
    `spark.read`). Returns 'ns' for the legacy int64-ns layout, 'us' for
    the current native-µs layout."""
    import pyarrow.parquet as pq

    f = path
    if os.path.isdir(path):
        names = sorted(n for n in os.listdir(path) if n.endswith(".parquet"))
        f = os.path.join(path, names[0])
    t = str(pq.ParquetFile(f).schema_arrow.field("ts").type)
    return "ns" if t in ("timestamp[ns]", "int64") else "us"


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    path = f"{sf_dir}/{name}.parquet"
    if name == "events":
        if _events_ts_unit(path) == "ns":
            # legacy layout: int64 ns since epoch (TIMESTAMP(NANOS) parquet,
            # readable only with an explicit LONG schema); ns → µs
            # truncation (floor for positive epochs) = DuckDB's read
            raw = spark.read.schema(_EVENTS_RAW_SCHEMA).parquet(path)
            return (
                raw.withColumn("ts_ns", F.col("ts"))
                .withColumn("ts", F.expr("timestamp_micros(ts_ns div 1000)"))
            )
        # current layout: native µs TIMESTAMP. Normalize to NTZ (wall-clock,
        # session-tz independent — what DuckDB reads) and derive the
        # ns-granularity long DIRECTLY from the NTZ value: an NTZ-epoch
        # timestampdiff never round-trips through the session timezone, so
        # ts_ns is byte-identical whether the owning session runs UTC (the
        # repo factory) or not (an externally-owned driver session).
        raw = spark.read.parquet(path)
        ts_type = dict(raw.dtypes).get("ts", "")
        ts = F.col("ts") if ts_type.startswith("timestamp_ntz") else F.col("ts").cast("timestamp_ntz")
        return (
            raw.withColumn("ts", ts)
            .withColumn(
                "ts_ns",
                F.expr("timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts) * 1000"),
            )
        )
    return spark.read.parquet(path)


def load_tables(spark: SparkSession, sf_dir: str, names=TABLES) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in names}


def fan_out(df: DataFrame, partitions: int | None = None) -> DataFrame:
    """Round-robin repartition before compute-bound per-row work (hashing,
    shingling, vector math) — but ONLY when the input is under-split. A
    single small parquet file scans as ONE input split, so without this the
    expensive projection runs on one core. At 100 TB the scan already
    yields thousands of splits and the repartition would be a pure-cost
    extra shuffle — the split-count gate makes it a no-op there while
    keeping the fan-out for small-input/expensive-CPU stages. Explicit
    numPartitions → AQE won't coalesce it back down.
    """
    from .session import default_parallelism

    target = partitions or default_parallelism()
    # getNumPartitions reads the scan's split planning (file listing), no job
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)


def clone_store(src: str, dst: str) -> None:
    """Hardlink-clone a persisted SnapshotTable fixture (the `add_files`
    zero-copy trick applied to store staging): the directory tree is
    recreated but every file is an `os.link` to the fixture's inode —
    O(files) metadata ops instead of O(bytes) copies. Safe because every
    table mutation path either creates NEW files (data/delete/metadata
    emission) or swaps the metadata pointer via tmp-write +
    `os.replace` (tables.py `_commit`), which re-points the clone's
    directory entry without touching the shared inode; nothing opens an
    existing store file for in-place write. Clones must live on the same
    filesystem as the fixture (both under the process tempdir here).

    A `.commit.lock` left by a fixture build that crashed mid-commit is
    NOT cloned — each clone would otherwise inherit the orphan and pay
    the stale-lock-break wait on its first commit."""
    import shutil

    from .tables import _LOCK

    shutil.copytree(
        src, dst, copy_function=os.link, ignore=shutil.ignore_patterns(_LOCK)
    )


def persisted_store_for(
    spark, sf_dir: str, cache: dict, prefix: str, leaf: str, build
) -> str:
    """Shared per-sf_dir persisted-store fixture for the incremental
    (day-2) operator family: return the cached SnapshotTable root for
    `sf_dir`, building it once per process via `build(root)` when absent
    or stale. One implementation for every signature/fingerprint/
    assignment/benchmark store — the cache key is the absolute sf_dir,
    the existence guard re-validates a cached path whose temp dir was
    cleaned up externally."""
    import tempfile

    from .tables import SnapshotTable

    key = os.path.abspath(sf_dir)
    root = cache.get(key)
    if root and SnapshotTable.exists(root):
        return root
    root = os.path.join(tempfile.mkdtemp(prefix=prefix), leaf)
    build(root)
    cache[key] = root
    return root
