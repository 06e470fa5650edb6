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


def sdot(a: str, b: str) -> str:
    """Spark SQL expr: exact dot product of two float arrays (→ double).

    Per-element products rounded to DECIMAL scale 12, then summed exactly —
    order-independent, so bit-identical to `odot` regardless of
    partitioning. DECIMAL(30,12), not (38,12): Spark's (38,12)+(38,12)
    addition would exceed precision 38 and silently drop scale to 11;
    (30,12)+(30,12) → (31,12) stays exact, and scale 12 matches the
    oracle's per-product rounding.
    """
    return (
        f"CAST(aggregate(zip_with({a}, {b}, (x, y) -> "
        "CAST(CAST(x AS DOUBLE) * CAST(y AS DOUBLE) AS DECIMAL(30,12))), "
        "CAST(0 AS DECIMAL(30,12)), "
        "(acc, v) -> CAST(acc + v AS DECIMAL(30,12))) AS DOUBLE)"
    )


def sdot_approx(a: str, b: str) -> str:
    """Spark SQL expr: fast double dot product (~20× cheaper than `sdot` —
    no BigDecimal churn). NOT cross-engine exact; use only to prefilter
    with a safety margin (float error over d≤1024 terms ≪ 1e-9) before an
    exact `sdot` on survivors."""
    return (
        f"aggregate(zip_with({a}, {b}, (x, y) -> "
        "CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), CAST(0 AS DOUBLE), (acc, v) -> acc + v)"
    )


def odot(a: str, b: str) -> str:
    """DuckDB SQL twin of `sdot` (list_sum of DECIMAL(38,12) products;
    same scale-12 per-product rounding, exact decimal sum)."""
    return (
        f"CAST(list_sum(list_transform(list_zip({a}, {b}), "
        "p -> CAST(CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE) AS DECIMAL(38,12)))) AS DOUBLE)"
    )


def oavg(expr: str, scale: int = 2) -> str:
    """DuckDB SQL twin of `davg`."""
    return f"(CAST(SUM(CAST({expr} AS DECIMAL(38,{scale}))) AS DOUBLE) / COUNT(*))"
