"""Differential tests: every registered query vs its DuckDB oracle at
sf0.001 — the same comparison the driver runs at sf0.01 (SURVEY.md §5)."""

from __future__ import annotations

import pytest

from emr_apache_iceberg_workshop_spark.plans import registry

from conftest import SF_SMOKE

SPECS = registry()


@pytest.mark.parametrize("name", sorted(SPECS))
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
