"""Scale-safety tests for the dedup candidate generators: the properties
that matter at 100 TB (no quadratic hot keys, no driver materialization)
checked on synthetic skew fixtures small enough for CI."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from emr_apache_iceberg_workshop_spark.plans.dedup import (
    SHINGLES_S,
    _jaccard_scored_pairs,
)


@pytest.fixture(scope="module")
def skewed_docs(spark):
    """200 docs all sharing one viral boilerplate sentence (a hot shingle in
    every doc), plus two genuine near-dup pairs whose overlap is unique."""
    viral = "click here to subscribe now"
    rows = [(i, f"{viral} document body number {i} talks about topic {i % 7}") for i in range(200)]
    rows += [
        (1001, "alpha beta gamma delta epsilon zeta eta theta"),
        (1002, "alpha beta gamma delta epsilon zeta eta iota"),
        (2001, "one two three four five six seven eight nine"),
        (2002, "one two three four five six seven eight ten"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _shingles(text: str) -> set[str]:
    toks = text.split()
    return {" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)}


def test_df_cap_drops_hot_shingles_from_candidates(spark, skewed_docs, monkeypatch):
    import emr_apache_iceberg_workshop_spark.plans.dedup as dd

    s = skewed_docs.selectExpr("doc_id", f"{SHINGLES_S} AS sh")
    monkeypatch.setattr(dd, "MAX_SHINGLE_DF", 10**9)
    n_uncapped = _jaccard_scored_pairs(s).count()  # >= C(200,2) from the hot key
    # With the cap forced below the viral shingle's DF (200), the quadratic
    # candidate blowup from boilerplate disappears (what remains are pairs
    # from legitimate sub-cap shingles, e.g. the ~29-doc topic groups)...
    monkeypatch.setattr(dd, "MAX_SHINGLE_DF", 50)
    capped = _jaccard_scored_pairs(s)
    n_capped = capped.count()
    assert n_uncapped >= 19900
    assert n_capped < n_uncapped / 4
    # ...while the genuine near-dup pairs still survive verification.
    verified = {(r.doc_a, r.doc_b) for r in capped.collect()}
    assert (1001, 1002) in verified
    assert (2001, 2002) in verified


def test_scored_pairs_count_full_intersection_including_hot(
    spark, skewed_docs, monkeypatch
):
    """n_common/jaccard must equal the FULL set intersection even when part
    of the overlap is hot (capped out of the candidate index): the capped
    join counts the sub-cap term, the per-doc hot arrays supply the rest."""
    import emr_apache_iceberg_workshop_spark.plans.dedup as dd

    monkeypatch.setattr(dd, "MAX_SHINGLE_DF", 50)
    s = skewed_docs.selectExpr("doc_id", f"{SHINGLES_S} AS sh")
    rows = {(r.doc_a, r.doc_b): (r.n_common, r.jaccard) for r in _jaccard_scored_pairs(s).collect()}

    # docs 0 and 7 share topic 0: candidates via the sub-cap topic shingle,
    # but most of their overlap is viral boilerplate with DF=200 > cap
    a = _shingles("click here to subscribe now document body number 0 talks about topic 0")
    b = _shingles("click here to subscribe now document body number 7 talks about topic 0")
    expect_common = len(a & b)
    expect_jaccard = expect_common / len(a | b)
    got = rows[(0, 7)]
    assert got[0] == expect_common
    assert got[1] == pytest.approx(expect_jaccard, abs=0)


def test_verify_values_independent_of_cap(spark, skewed_docs, monkeypatch):
    """jaccard/n_common must come from the FULL shingle sets, so the cap
    changes candidate generation only — never the emitted values."""
    import emr_apache_iceberg_workshop_spark.plans.dedup as dd

    s = skewed_docs.filter(F.col("doc_id") > 1000).selectExpr("doc_id", f"{SHINGLES_S} AS sh")
    out = {}
    for cap in (10_000, 1):
        monkeypatch.setattr(dd, "MAX_SHINGLE_DF", cap)
        rows = _jaccard_scored_pairs(s).collect()
        out[cap] = {(r.doc_a, r.doc_b): (r.n_common, round(r.jaccard, 12)) for r in rows}
    # cap=1 excludes shared shingles (DF=2) from the index -> no candidates;
    # generous cap finds the pairs with exact full-set values
    assert out[1] == {}
    assert (1001, 1002) in out[10_000] and (2001, 2002) in out[10_000]
    for (a, b), (n_common, jac) in out[10_000].items():
        assert n_common >= 2 and 0.3 <= jac <= 1.0


def test_connected_components_long_chain_logarithmic_rounds(spark):
    """Adversarial diameter: a 100k-node path graph. Star contraction must
    converge in O(log d) rounds — the property that makes the 100 TB
    dup-graph tractable (label propagation would need d = 100k rounds,
    i.e. 100k full edge-set shuffles). Budget: 2·log2(d) + 4 rounds, with
    every node labeled by the chain's minimum id."""
    import math

    from emr_apache_iceberg_workshop_spark.operators.graph import connected_components

    n = 100_000
    edges = spark.range(n - 1).selectExpr("id AS u", "id + 1 AS v")
    labels, rounds = connected_components(edges, max_rounds=50)
    budget = int(2 * math.log2(n)) + 4
    assert rounds <= budget, f"{rounds} rounds > budget {budget}"
    got = labels.groupBy("label").count().collect()
    assert len(got) == 1 and got[0].label == 0 and got[0]["count"] == n


def test_connected_components_forest_of_chains(spark):
    """Many medium chains at once (the realistic dup-graph shape: lots of
    small components): 200 disjoint 500-node chains — every component
    labeled by its own minimum, round count still logarithmic in the
    component diameter, not the graph size."""
    import math

    from emr_apache_iceberg_workshop_spark.operators.graph import connected_components

    chains, length = 200, 500
    edges = spark.range(chains * (length - 1)).selectExpr(
        f"id DIV {length - 1} AS c", f"id % {length - 1} AS i"
    ).selectExpr(f"c * {length} + i AS u", f"c * {length} + i + 1 AS v")
    labels, rounds = connected_components(edges, max_rounds=50)
    assert rounds <= int(2 * math.log2(length)) + 4
    comp = labels.groupBy("label").count()
    rows = comp.collect()
    assert len(rows) == chains
    assert all(r["count"] == length and r.label % length == 0 for r in rows)
