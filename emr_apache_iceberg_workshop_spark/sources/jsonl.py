"""JSONL (newline-delimited JSON) source — the interchange format LLM
training corpora actually ship in (Common Crawl derivatives, Dolma, The
Pile all distribute .jsonl/.jsonl.gz shards).

Beyond the reference's TSV surface (`raw-bronze.py:95-104` reads
tab-separated batches with a pinned DDL schema): same contract, JSONL
carrier. The design rules are the 100 TB ones:

- **Schema is REQUIRED, never inferred.** `spark.read.json` without a
  schema runs a full extra pass over the input just to infer types — at
  100 TB that doubles the scan before any work happens, and a single odd
  shard can flip a column's inferred type for the whole load. Callers
  pin a `StructType`/DDL exactly like the reference pins its TSV DDL.
- **Malformed lines are captured, not fatal.** PERMISSIVE mode routes
  unparseable lines into `_corrupt_record` (Spark null-fills the data
  columns), so one mangled record in a billion doesn't kill the job and
  the bad lines stay queryable for quarantine — the
  `badRecordsPath`-style contract expressed with built-in readers.
- **Line-splittable parallelism.** JSONL splits on newlines, so Spark
  assigns ordinary file splits; no single-reader bottleneck (unlike a
  JSON array document, which is one record to one task).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

CORRUPT_COL = "_corrupt_record"


def jsonl_schema(ddl: str) -> T.StructType:
    """Pinned read schema: the caller's DDL plus the corrupt-record
    capture column (Spark only captures bad lines into a column that is
    declared in the schema)."""
    base = T.StructType.fromDDL(ddl)
    if CORRUPT_COL in [f.name for f in base.fields]:
        raise ValueError(f"{CORRUPT_COL} is reserved")
    return T.StructType(list(base.fields) + [T.StructField(CORRUPT_COL, T.StringType())])


def read_jsonl(spark: SparkSession, path: str | list[str], ddl: str) -> DataFrame:
    """Read JSONL with a pinned schema. Valid rows carry NULL
    `_corrupt_record`; malformed lines carry the raw line there with data
    columns NULL. The returned frame is cached-free and lazy — callers
    that need BOTH data and corrupt counts from one pass should aggregate
    in one job (see `q_jsonl_scan`) rather than filter twice."""
    return (
        spark.read.schema(jsonl_schema(ddl))
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .json(path)
    )


def valid_rows(df: DataFrame) -> DataFrame:
    """Data rows only, corrupt capture dropped."""
    return df.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)


def quarantine_rows(df: DataFrame) -> DataFrame:
    """The quarantine feed: the raw text of every malformed line, plus
    the data columns (PERMISSIVE keeps any field it could still parse,
    so partially-valid records arrive with context). Keeping at least one
    data column in the projection is also what Spark REQUIRES — queries
    whose referenced columns are only the internal corrupt-record column
    are disallowed on raw JSON scans (QUERY_ONLY_CORRUPT_RECORD_COLUMN)."""
    data_cols = [c for c in df.columns if c != CORRUPT_COL]
    return df.filter(F.col(CORRUPT_COL).isNotNull()).select(
        F.col(CORRUPT_COL).alias("raw_line"), *data_cols
    )


def write_jsonl(df: DataFrame, path: str, n_files: int | None = None) -> None:
    """Export as JSONL shards (one file per task; `n_files` to bound)."""
    out = df if n_files is None else df.coalesce(n_files)
    out.write.mode("overwrite").json(path)
