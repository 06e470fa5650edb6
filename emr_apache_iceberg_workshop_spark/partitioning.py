"""Hidden-partitioning transforms (Iceberg partition specs).

Iceberg's flagship table feature is that partition values are DERIVED
from data columns by a transform (`days(ts)`, `bucket(16, id)`,
`truncate(4, s)`, ...) and never stored in the data: queries filter on
the SOURCE column and the engine maps the predicate onto the transform
for file pruning. The reference configures its tables through the
Iceberg runtime which provides this (the workshop's tables are
identity-partitioned, but the engine surface it targets — Athena,
Snowflake, StarRocks over Iceberg — all plan over transformed specs).

This module is the transform layer for `SnapshotTable`:

- `parse_field("days(ts)") -> PartitionField` — Iceberg spec syntax.
- `field_expr(field, schema) -> Column` — the Spark expression that
  derives the partition value from a data row (used at write time to
  `partitionBy`, and at read time to re-derive a row's partition for
  partition-scoped COW masks).
- `prune_keep(field, dir_value, lo, hi, ...)` — manifest-only file
  pruning: can a file whose partition value is `dir_value` contain a
  row with source value in [lo, hi]? Monotone transforms (days/hours/
  months/years/truncate) map the range into transform space; `bucket`
  (non-monotone) prunes only equality predicates.

Deviations from Iceberg, documented: `bucket` uses Spark's Murmur3
(`F.hash`, seed 42) rather than Iceberg's seed-0 Murmur3 of the
serialized value — consistent within this engine (write and prune use
the same function) but a table's bucket assignment is not exchangeable
with an Iceberg writer's. Null source values go to the null partition
(Iceberg semantics), including for bucket.
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from datetime import date, datetime

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

_SPEC_RE = re.compile(
    r"^\s*(?P<tf>identity|days|day|hours|hour|months|month|years|year)\s*"
    r"\(\s*(?P<col>\w+)\s*\)\s*$"
)
_SPEC2_RE = re.compile(
    r"^\s*(?P<tf>bucket|truncate)\s*\(\s*(?P<n>\d+)\s*,\s*(?P<col>\w+)\s*\)\s*$"
)

# singular aliases (Iceberg SQL uses day(ts); the spec JSON uses "day")
_CANON = {"day": "days", "hour": "hours", "month": "months", "year": "years"}


@dataclass(frozen=True)
class PartitionField:
    transform: str  # identity | days | hours | months | years | bucket | truncate
    source: str  # source data column
    param: int | None  # N for bucket, W for truncate
    name: str  # derived partition (directory) column name


def parse_field(spec: str) -> PartitionField:
    """One partition-spec entry → PartitionField. A bare column name is
    identity (backward compatible with every existing table)."""
    m = _SPEC_RE.match(spec)
    if m:
        tf = _CANON.get(m.group("tf"), m.group("tf"))
        col = m.group("col")
        if tf == "identity":
            return PartitionField("identity", col, None, col)
        return PartitionField(tf, col, None, f"{col}_{tf[:-1]}")
    m = _SPEC2_RE.match(spec)
    if m:
        tf, col, n = m.group("tf"), m.group("col"), int(m.group("n"))
        if n <= 0:
            raise ValueError(f"{tf} width must be positive: {spec!r}")
        suffix = "bucket" if tf == "bucket" else "trunc"
        return PartitionField(tf, col, n, f"{col}_{suffix}")
    if re.match(r"^\s*\w+\s*$", spec):
        return PartitionField("identity", spec.strip(), None, spec.strip())
    raise ValueError(f"unparseable partition spec entry: {spec!r}")


def parse_spec(specs: list[str]) -> list[PartitionField]:
    fields = [parse_field(s) for s in specs]
    names = [f.name for f in fields]
    if len(set(names)) != len(names):
        raise ValueError(f"duplicate partition field names in {specs!r}")
    return fields


def is_identity_spec(specs: list[str]) -> bool:
    return all(f.transform == "identity" for f in parse_spec(specs))


def _source_type(field: PartitionField, schema: T.StructType) -> T.DataType:
    for f in schema.fields:
        if f.name == field.source:
            return f.dataType
    raise ValueError(f"partition source column {field.source!r} not in schema")


def field_expr(field: PartitionField, schema: T.StructType) -> Column:
    """Spark expression deriving the partition value from a data row."""
    c = F.col(field.source)
    tf = field.transform
    if tf == "identity":
        return c
    if tf == "days":
        return F.to_date(c)
    if tf == "hours":
        return F.when(c.isNotNull(), F.date_format(c, "yyyy-MM-dd-HH"))
    if tf == "months":
        return F.when(c.isNotNull(), F.date_format(c, "yyyy-MM"))
    if tf == "years":
        return F.year(c)
    if tf == "bucket":
        # null → null partition; F.hash(null) would fold nulls into
        # bucket pmod(42, N) otherwise
        return F.when(c.isNotNull(), F.pmod(F.hash(c), F.lit(field.param)))
    if tf == "truncate":
        dt = _source_type(field, schema)
        if isinstance(dt, T.StringType):
            return F.substring(c, 1, field.param)
        if isinstance(dt, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
            w = F.lit(field.param)
            # Iceberg floor semantics: v - (((v % W) + W) % W), correct
            # for negative v (Spark's % is truncated, not floored)
            return c - (((c % w) + w) % w)
        raise ValueError(f"truncate unsupported for {dt.simpleString()} column {field.source!r}")
    raise AssertionError(tf)


def _py_transform(field: PartitionField, v):
    """The same transform, applied driver-side to a predicate bound.
    Returns the transform-space value in the DIRECTORY-STRING domain
    (the form `_list_partitions` / `_file_stats` record)."""
    if v is None:
        return None
    tf = field.transform
    if tf == "identity":
        return str(v)
    if tf == "days":
        if isinstance(v, datetime):
            return v.date().isoformat()
        if isinstance(v, date):
            return v.isoformat()
        return str(v)[:10]
    if tf == "hours":
        if isinstance(v, datetime):
            # explicit padding, not strftime: glibc's %Y does NOT zero-pad
            # years < 1000, which would misorder transform-space string
            # comparisons ('999-…' > '2000-…') and falsely prune files
            return f"{v.year:04d}-{v.month:02d}-{v.day:02d}-{v.hour:02d}"
        s = str(v)  # 'YYYY-MM-DD HH:MM:SS' → 'YYYY-MM-DD-HH'
        return s[:10] + "-" + s[11:13] if len(s) >= 13 else s
    if tf == "months":
        if isinstance(v, (datetime, date)):
            return f"{v.year:04d}-{v.month:02d}"
        return str(v)[:7]
    if tf == "years":
        if isinstance(v, (datetime, date)):
            return v.year
        return int(str(v)[:4])
    if tf == "truncate":
        if isinstance(v, str):
            return v[: field.param]
        w = field.param
        return int(v) - (((int(v) % w) + w) % w)
    raise AssertionError(tf)  # bucket handled by prune_keep directly


def prune_keep(
    field: PartitionField,
    dir_value: str | None,
    lo,
    hi,
    bucket_of=None,
) -> bool:
    """Manifest-only pruning decision for a file whose partition value
    (directory string form, None = null partition) is `dir_value`, under
    the predicate `lo <= source <= hi`. True = the file may contain
    matching rows; False = provably cannot.

    Monotone transforms: keep iff t(lo) <= value <= t(hi) in transform
    space. `bucket`: only equality predicates (lo == hi) prune, via
    `bucket_of(value) -> int` (supplied by the table layer — computed
    with the SAME Spark hash used at write time). Null partitions are
    pruned: every row there has a null source value, which cannot
    satisfy a range predicate."""
    if dir_value is None:
        return False
    tf = field.transform
    if tf == "bucket":
        if lo is not None and lo == hi and bucket_of is not None:
            return int(dir_value) == bucket_of(lo)
        return True  # range predicates can't prune a hash bucket
    tlo = _py_transform(field, lo)
    thi = _py_transform(field, hi)
    if tlo is None and thi is None:
        return True  # unbounded predicate prunes nothing
    # comparison domain from whichever bound exists (both transform to the
    # same domain): years / integer-truncate bounds are ints, everything
    # else compares as directory strings. Keying off `tlo` alone crashed
    # one-sided truncate(string) predicates (int('abcd') on the dir value).
    ref = tlo if tlo is not None else thi
    v: int | str = dir_value if isinstance(ref, str) else int(dir_value)
    if tlo is not None and v < tlo:
        return False
    if thi is not None and v > thi:
        return False
    return True
