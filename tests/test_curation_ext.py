"""Properties of the round-4 curation operators that the value-hash oracle
can't express: packing bounds, stratum caps, and rerun determinism."""

from __future__ import annotations

from tests.conftest import SF_SMOKE


def test_pack_sequences_bin_bound(spark):
    """Offset packing overflows a bin by at most ONE document: every bin's
    token total stays under budget + that bin's largest doc."""
    from emr_apache_iceberg_workshop_spark.plans.curation import (
        PACK_BUDGET,
        c_pack_sequences,
    )
    from emr_apache_iceberg_workshop_spark.plans.textops import TOKS_S
    from emr_apache_iceberg_workshop_spark.catalog import load_table

    bins = c_pack_sequences(spark, SF_SMOKE).collect()
    max_doc = (
        load_table(spark, SF_SMOKE, "documents")
        .selectExpr(f"max(size({TOKS_S})) AS m")
        .collect()[0].m
    )
    assert bins, "packing produced no bins"
    for r in bins:
        assert r.bin_tokens < PACK_BUDGET + max_doc
    # bins are dense per (lang, shard): 0..max with no gaps
    by_group: dict = {}
    for r in bins:
        by_group.setdefault((r.lang, r.shard), []).append(r.bin_id)
    for ids in by_group.values():
        assert sorted(ids) == list(range(len(ids)))


def test_stratified_sample_caps_and_determinism(spark):
    from emr_apache_iceberg_workshop_spark.plans.curation import (
        STRATUM_CAP,
        c_stratified_sample,
    )

    a = {r.lang: r for r in c_stratified_sample(spark, SF_SMOKE).collect()}
    b = {r.lang: r for r in c_stratified_sample(spark, SF_SMOKE).collect()}
    assert a.keys() == b.keys()
    for lang, r in a.items():
        # hash-rate sampling: expectation = cap; allow binomial spread
        assert r.n_sampled <= 2 * STRATUM_CAP
        if r.stratum_size <= STRATUM_CAP:
            assert r.n_sampled <= r.stratum_size
        # pure function of doc_id → rerun is bit-identical
        assert (r.n_sampled, r.total_tokens) == (b[lang].n_sampled, b[lang].total_tokens)


def test_mix_corpora_tiers_downsample(spark):
    """Lower-weight tiers keep a smaller fraction of their docs."""
    from emr_apache_iceberg_workshop_spark.plans.curation import c_mix_corpora, _mix_tier
    from emr_apache_iceberg_workshop_spark.catalog import load_table
    from pyspark.sql import functions as F

    kept = {
        (r.tier): kept_n
        for r in c_mix_corpora(spark, SF_SMOKE).collect()
        for kept_n in [r.n_docs]
    }
    mixed = c_mix_corpora(spark, SF_SMOKE).groupBy("tier").sum("n_docs").collect()
    kept = {r.tier: r["sum(n_docs)"] for r in mixed}
    totals = (
        load_table(spark, SF_SMOKE, "documents")
        .withColumn("tier", F.expr(_mix_tier("spark")))
        .groupBy("tier")
        .count()
        .collect()
    )
    total = {r.tier: r["count"] for r in totals}
    assert kept["high"] == total["high"]  # weight 1.0 keeps everything
    assert kept["mid"] < total["mid"]
    assert kept["low"] / total["low"] < kept["mid"] / total["mid"]
