"""DSv2 format-surface queries: `spark.read.format("eiws")` driven through
the driver's DuckDB oracle gate. The reference exposes its tables through
`spark.read.format("iceberg")` with snapshot-range options
(`bronze-silver.py:146-149`); these queries prove the equivalent format
surface here — including the pyarrow read path's MOR delete resolution and
its filter pushdown — against an independent raw-parquet reconstruction
(same oracle doctrine as the q_meta_* family: the oracle never sees the
engine, only the committed files)."""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .registry import query
from .tablemeta import DEMO_ROOT, _demo_table


def _format_df(spark, **options) -> DataFrame:
    from ..sources import dsv2

    _demo_table(spark)  # deterministic fixture (append, append, MOR merge)
    dsv2.register(spark)
    r = spark.read.format(dsv2.FORMAT_NAME).option("table", DEMO_ROOT)
    for k, v in options.items():
        r = r.option(k.replace("_", "-"), str(v))
    return r.load()


# MOR resolution from raw files alone: the delete file committed at s3
# suppresses earlier-dir rows by key; s3's own upsert dir is unaffected.
_LIVE = f"""
    WITH base AS (
      SELECT id, category, qty
      FROM read_parquet('{DEMO_ROOT}/data/s1/*/*.parquet', hive_partitioning = true)
      UNION ALL
      SELECT id, category, qty
      FROM read_parquet('{DEMO_ROOT}/data/s2/*/*.parquet', hive_partitioning = true)),
    dels AS (SELECT id FROM read_parquet('{DEMO_ROOT}/deletes/s3/*.parquet')),
    live AS (
      SELECT * FROM base WHERE id NOT IN (SELECT id FROM dels)
      UNION ALL
      SELECT id, category, qty
      FROM read_parquet('{DEMO_ROOT}/data/s3/*/*.parquet', hive_partitioning = true))
""".strip()


@query(
    "q_dsv2_scan",
    oracle=f"""
    {_LIVE}
    SELECT id, category, qty FROM live
    """,
    tags=("dsv2", "tablemeta"),
)
def q_dsv2_scan(spark, sf_dir) -> DataFrame:
    """Current-state read through the registered format: the pyarrow
    executors resolve the MOR equality-delete state per file slice."""
    return _format_df(spark).select("id", "category", "qty")


@query(
    "q_dsv2_incremental",
    # (1, 2] holds exactly the s2 append — the reference's
    # start/end-snapshot-id option shape (`bronze-silver.py:146-149`)
    oracle=f"""
    SELECT id, category, qty
    FROM read_parquet('{DEMO_ROOT}/data/s2/*/*.parquet', hive_partitioning = true)
    """,
    tags=("dsv2", "incremental"),
)
def q_dsv2_incremental(spark, sf_dir) -> DataFrame:
    return _format_df(
        spark, start_snapshot_id=1, end_snapshot_id=2
    ).select("id", "category", "qty")


@query(
    "q_dsv2_pushdown",
    # the Spark side routes this filter through pushFilters (file-level
    # manifest pruning) AND Spark's own row filter; the oracle filters the
    # independent reconstruction — equal results prove pruning is lossless
    oracle=f"""
    {_LIVE}
    SELECT category, COUNT(*) AS n_rows, CAST(SUM(qty) AS BIGINT) AS total_qty,
           MIN(id) AS min_id, MAX(id) AS max_id
    FROM live WHERE qty >= 20 AND category IN ('a', 'b')
    GROUP BY category
    """,
    tags=("dsv2", "pushdown"),
)
def q_dsv2_pushdown(spark, sf_dir) -> DataFrame:
    return (
        _format_df(spark)
        .filter("qty >= 20 AND category IN ('a', 'b')")
        .groupBy("category")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("qty").cast("bigint").alias("total_qty"),
            F.min("id").alias("min_id"),
            F.max("id").alias("max_id"),
        )
    )
