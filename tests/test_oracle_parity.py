"""Differential tests: every registered query vs its DuckDB oracle at
sf0.001 — the same comparison the driver runs at sf0.01 (SURVEY.md §5)."""

from __future__ import annotations

import pytest

from emr_apache_iceberg_workshop_spark.plans import registry

from conftest import SF_SMOKE

SPECS = registry()

# Default run mirrors the driver exactly: its correctness round checks
# the FIRST 50 names of queries() (plans/registry.py:_PREFIX_ORDER) at
# sf0.01; this suite's replica checks the same 50 at sf0.001. The
# remaining 147 run under -m slow (r16: the full 197-query sweep here is
# redundant with the driver's own oracle gate and tools/oracle_check.py
# — which is run in full every round — and pushed the default suite past
# the driver's verification window).
_DRIVER_WINDOW = set(list(SPECS)[:50])


@pytest.mark.parametrize(
    "name",
    [
        n if n in _DRIVER_WINDOW else pytest.param(n, marks=pytest.mark.slow)
        for n in sorted(SPECS)
    ],
)
def test_query_matches_oracle(spark, duck, name):
    from tools.oracle_check import compare_one

    spec = SPECS[name]
    if spec.oracle is None:
        # rows-only check (non-SQL-expressible op)
        assert spec.fn(spark, SF_SMOKE).count() >= 0
        return
    ok, problems = compare_one(spark, duck, spec, SF_SMOKE, verbose=False)
    assert ok, f"{name}: {problems}"


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    assert set(e.oracle_sql()) <= set(e.queries())
