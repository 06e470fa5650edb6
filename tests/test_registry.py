"""Registry invariants: the bounded verification-window prefix must name
real queries (phantom names are silently skipped by registry()'s guard,
so they fail HERE instead — the failure mode that burned round 6)."""

from emr_apache_iceberg_workshop_spark.plans.registry import _PREFIX_ORDER, registry


def test_prefix_names_all_registered():
    regs = registry()
    missing = [n for n in _PREFIX_ORDER if n not in regs]
    assert not missing, f"_PREFIX_ORDER lists unregistered queries: {missing}"


def test_prefix_has_no_duplicates():
    dupes = [n for n in set(_PREFIX_ORDER) if _PREFIX_ORDER.count(n) > 1]
    assert not dupes, f"duplicate _PREFIX_ORDER entries: {dupes}"


def test_every_query_has_callable_and_name_key():
    regs = registry()
    for name, spec in regs.items():
        assert spec.name == name
        assert callable(spec.fn)
