"""Cross-engine-exact aggregation helpers.

Floating-point SUM is order-dependent, and Spark and DuckDB reduce in
different orders — so a naive SUM(double) differs in the last bits and
fails an exact value-hash comparison. Both engines implement *decimal*
arithmetic exactly, and casting the *same* IEEE double to the same decimal
type is deterministic in both. So:

    sum_exact(x) = CAST( SUM( CAST(x AS DECIMAL(38, s)) ) AS DOUBLE )

is bit-identical across engines as long as `s` has enough headroom above
the true decimal scale of the data (testdata money columns are 2dp;
products like price*(1-disc)*(1+tax) are ≤6dp; double representation error
~1e-13 ≪ the 0.5*10^-s rounding boundary for s ≤ 10).

This is not just an oracle trick — at 100 TB, decimal aggregation also
gives run-to-run deterministic results regardless of partitioning, which
plain double SUM does not.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Timestamp → string normalization (µs precision) — identical output text
# from Spark's date_format and DuckDB's strftime.
TS_FMT_SPARK = "yyyy-MM-dd HH:mm:ss.SSSSSS"
TS_FMT_DUCK = "%Y-%m-%d %H:%M:%S.%f"


def dsum(col: Column, scale: int = 2) -> Column:
    """Order-independent exact SUM of a double column (→ double)."""
    return F.sum(col.cast(f"decimal(38,{scale})")).cast("double")


def davg(col: Column, scale: int = 2) -> Column:
    """Exact-sum / count average (→ double); pair with `oavg`."""
    return F.sum(col.cast(f"decimal(38,{scale})")).cast("double") / F.count(F.lit(1))


def osum(expr: str, scale: int = 2) -> str:
    """DuckDB SQL twin of `dsum`."""
    return f"CAST(SUM(CAST({expr} AS DECIMAL(38,{scale}))) AS DOUBLE)"


def oavg(expr: str, scale: int = 2) -> str:
    """DuckDB SQL twin of `davg`."""
    return f"(CAST(SUM(CAST({expr} AS DECIMAL(38,{scale}))) AS DOUBLE) / COUNT(*))"
