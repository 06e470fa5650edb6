"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``emr_apache_iceberg_workshop_spark/``; queries
are registered in ``plans/`` as (Spark plan, DuckDB oracle) pairs.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from emr_apache_iceberg_workshop_spark.plans import registry  # noqa: E402
from emr_apache_iceberg_workshop_spark.session import tune_session  # noqa: E402

_SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    tune_session(spark)
    return registry()["q01_pricing_summary"].fn(spark, _SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for name, spec in registry().items():

        def run(spark: SparkSession, sf_dir: str, _spec=spec) -> DataFrame:
            tune_session(spark)
            return _spec.fn(spark, sf_dir)

        out[name] = run
    return out


def oracle_sql() -> dict[str, str]:
    return {n: s.oracle for n, s in registry().items() if s.oracle is not None}
