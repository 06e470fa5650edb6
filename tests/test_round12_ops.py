"""Round-12 operator tests: bounded MinHash verdict twin, incremental
store retraction, store-backed LM scoring.

Reference parity note: the reference repo (soumilshah1995/
emr-apache-iceberg-workshop) has no dedup surface; these operators are
north-star extensions whose ground truth is the full-recompute oracle in
plans/dedup.py (driver-checked via oracle_sql)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def spark():
    from emr_apache_iceberg_workshop_spark.session import build_session

    return build_session()


DDL = "doc_id bigint, text string"
BASE = "the quick brown fox jumps over the lazy dog again and again"


def _docs_fixture(spark, tmp_path):
    corpus = spark.createDataFrame(
        [
            (1, BASE),
            (2, BASE + " with a small tail of extra words"),
            (3, "completely different corpus words drawn from an entirely"
                " separate vocabulary and domain altogether"),
        ],
        DDL,
    )
    batch = spark.createDataFrame(
        [
            (10, BASE),
            (11, BASE),
            (12, "unique new batch content with its own vocabulary and no"
                 " overlap whatsoever with anything else"),
        ],
        DDL,
    )
    corpus.write.parquet(str(tmp_path / "corpus_docs"))
    batch.write.parquet(str(tmp_path / "batch_docs"))
    return (
        spark.read.parquet(str(tmp_path / "corpus_docs")),
        spark.read.parquet(str(tmp_path / "batch_docs")),
    )


def test_minhash_verdicts_bounded_twin(spark, tmp_path):
    """The verdict form agrees with the pair form on partner sets, emits
    one row per batch doc, dominates same-signature partners, and never
    rescans corpus text."""
    from emr_apache_iceberg_workshop_spark.plans.dedup import (
        build_signature_store,
        dedup_batch_incremental,
        minhash_batch_verdicts,
    )
    from emr_apache_iceberg_workshop_spark.tables import SnapshotTable

    corpus, batch = _docs_fixture(spark, tmp_path)
    store_root = str(tmp_path / "sigs")
    build_signature_store(spark, corpus, store_root)
    store = SnapshotTable(spark, store_root)

    v = minhash_batch_verdicts(spark, batch, store, append=True)
    rows = {r.doc_id: r for r in v.collect()}

    # 10 and 11 share doc 1's exact signature: bucket {1, 10, 11}
    for d in (10, 11):
        assert d in rows
        assert rows[d].best_sim == 1.0
        assert rows[d].best_partner == 1  # smallest same-sig partner
        assert rows[d].n_partners >= 2
    # the unrelated batch doc has no partner row (bounded output)
    assert 12 not in rows
    assert len(store.snapshots()) == 2

    # replay idempotence: append=False against the already-appended store
    # reproduces the verdicts exactly
    v2 = minhash_batch_verdicts(spark, batch, store, append=False)
    assert sorted(map(tuple, v2.collect())) == sorted(map(tuple, v.collect()))

    # partner-count parity with the pair form on the same store state
    pairs = dedup_batch_incremental(spark, batch, store, append=False)
    pc = (
        pairs.selectExpr("doc_a AS d", "doc_b AS p")
        .unionByName(pairs.selectExpr("doc_b AS d", "doc_a AS p"))
        .filter(F.col("d").isin(10, 11, 12))
        .groupBy("d")
        .agg(F.countDistinct("p").alias("n"))
    )
    pair_counts = {r.d: r.n for r in pc.collect()}
    for d, r in rows.items():
        assert pair_counts.get(d, 0) == r.n_partners, (d, r)

    # plan audit: corpus text parquet never scanned
    spark.conf.set("spark.sql.maxMetadataStringLength", "2000")
    plan = v2._jdf.queryExecution().executedPlan().toString()
    assert "corpus_docs" not in plan
