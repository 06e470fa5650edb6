"""Round-11 late additions: the incremental EXACT dedup tier, the
streaming (foreachBatch) incremental dedup shape, and signature-store
maintenance invariance (compact/expire must not change dedup verdicts)."""

from __future__ import annotations

import os
import shutil
import tempfile

import pytest


DDL = "doc_id bigint, text string"
BASE = "the quick brown fox jumps over the lazy dog again and again"


def _mk_store(spark, tmp_path, rows, name="hashes"):
    from emr_apache_iceberg_workshop_spark.plans.dedup import (
        build_exact_hash_store,
    )
    from emr_apache_iceberg_workshop_spark.tables import SnapshotTable

    root = str(tmp_path / name)
    build_exact_hash_store(spark, spark.createDataFrame(rows, DDL), root)
    return SnapshotTable(spark, root)


# -- incremental exact tier -------------------------------------------------
def test_incremental_exact_matches_full_recompute(spark, tmp_path):
    """Batch verdicts ≡ the full-corpus d_exact_dup window over
    store ∪ batch restricted to batch docs (the d_incremental_exact
    oracle contract, asserted engine-side on a controlled fixture
    including a batch doc whose canonical is ANOTHER batch doc)."""
    from pyspark.sql import functions as F

    from emr_apache_iceberg_workshop_spark.plans.dedup import (
        dedup_batch_incremental_exact,
    )

    corpus = [(1, BASE), (2, "corpus only text"), (3, BASE)]
    batch = [(10, BASE), (11, "batch only text"), (12, "batch only text")]
    store = _mk_store(spark, tmp_path, corpus)
    got = {
        (r.doc_id, r.group_size, r.canonical_id, r.is_dup)
        for r in dedup_batch_incremental_exact(
            spark, spark.createDataFrame(batch, DDL), store, append=False
        ).collect()
    }
    # full recompute over the union, restricted to batch ids
    all_df = spark.createDataFrame(corpus + batch, DDL).withColumn(
        "text_hash", F.md5("text")
    )
    g = all_df.groupBy("text_hash").agg(
        F.count(F.lit(1)).alias("group_size"),
        F.min("doc_id").alias("canonical_id"),
    )
    want = {
        (r.doc_id, r.group_size, r.canonical_id, r.is_dup)
        for r in all_df.join(g, "text_hash")
        .filter("doc_id >= 10")
        .select(
            "doc_id", "group_size", "canonical_id",
            (F.col("doc_id") != F.col("canonical_id")).alias("is_dup"),
        )
        .collect()
    }
    assert got == want
    # spot semantics: 10 groups with corpus 1/3 (canonical 1, dup);
    # 11/12 group intra-batch (canonical 11; 12 is the dup)
    assert (10, 3, 1, True) in got
    assert (11, 2, 11, False) in got and (12, 2, 11, True) in got


def test_incremental_exact_never_rescans_corpus_text(spark, tmp_path):
    """The batch run's plan reads batch text + the hash store's parquet
    ONLY; appends commit a snapshot the NEXT batch sees."""
    import re

    from emr_apache_iceberg_workshop_spark.plans.dedup import (
        build_exact_hash_store,
        dedup_batch_incremental_exact,
    )
    from emr_apache_iceberg_workshop_spark.tables import SnapshotTable

    corpus_pq = str(tmp_path / "corpus_docs")
    batch_pq = str(tmp_path / "batch_docs")
    spark.createDataFrame([(1, BASE), (2, "other")], DDL).write.parquet(corpus_pq)
    spark.createDataFrame([(10, BASE), (11, "new")], DDL).write.parquet(batch_pq)

    root = str(tmp_path / "hstore")
    build_exact_hash_store(spark, spark.read.parquet(corpus_pq), root)
    store = SnapshotTable(spark, root)
    assert len(store.snapshots()) == 1

    batch = spark.read.parquet(batch_pq)
    out = dedup_batch_incremental_exact(spark, batch, store, append=True)
    assert {(r.doc_id, r.is_dup) for r in out.collect()} == {
        (10, True), (11, False),
    }
    assert len(store.snapshots()) == 2  # batch hashes committed

    spark.conf.set("spark.sql.maxMetadataStringLength", "2000")
    out2 = dedup_batch_incremental_exact(spark, batch, store, append=False)
    plan = out2._jdf.queryExecution().executedPlan().toString()
    scanned = " ".join(
        set(re.findall(r"Location:[^\[]*\[([^\]]*)\]", plan))
        | set(re.findall(r"file:[^\s,\]]*", plan))
    )
    assert "corpus_docs" not in scanned, scanned
    assert "batch_docs" in scanned or "hstore" in scanned

    # next batch sees the appended hashes: 20 dups against 10 (and 1)
    m2 = dedup_batch_incremental_exact(
        spark, spark.createDataFrame([(20, BASE)], DDL), store, append=False
    ).collect()
    assert [(r.group_size, r.canonical_id, r.is_dup) for r in m2] == [(3, 1, True)]


# -- streaming incremental dedup ---------------------------------------------
def test_stream_incremental_equals_one_shot(spark, tmp_path):
    """The union of per-micro-batch verdicts equals the ONE-SHOT
    incremental run over the concatenated batches (batching invariance:
    cross-batch pairs emit once via the store, intra-batch pairs once via
    the self-join), and each micro-batch appends a store snapshot."""
    from emr_apache_iceberg_workshop_spark.plans.dedup import (
        build_signature_store,
        dedup_batch_incremental,
    )
    from emr_apache_iceberg_workshop_spark.plans.streamingq import (
        stream_incremental_dedup,
    )
    from emr_apache_iceberg_workshop_spark.tables import SnapshotTable

    corpus = [(1, BASE), (2, "corpus only original text here")]
    b1 = [(10, BASE), (11, "totally unrelated fresh content one")]
    b2 = [(20, BASE + " tail"), (21, BASE)]

    sig_root = str(tmp_path / "sigs")
    build_signature_store(spark, spark.createDataFrame(corpus, DDL), sig_root)

    # streamed: two files -> two micro-batches against a CLONE
    clone = str(tmp_path / "sigs_stream")
    shutil.copytree(sig_root, clone)
    feed = str(tmp_path / "feed")
    os.makedirs(feed)
    for k, rows in ((0, b1), (1, b2)):
        sub = str(tmp_path / f"p{k}")
        spark.createDataFrame(rows, DDL).coalesce(1).write.parquet(sub)
        for fn in sorted(os.listdir(sub)):
            if fn.endswith(".parquet"):
                shutil.copy(os.path.join(sub, fn), os.path.join(feed, f"b{k}.parquet"))
    store = SnapshotTable(spark, clone)
    src = spark.readStream.schema(DDL).option("maxFilesPerTrigger", "1").parquet(feed)
    streamed = {
        (r.doc_a, r.doc_b, r.est_sim)
        for r in stream_incremental_dedup(
            spark, src, store, str(tmp_path / "verdicts"), str(tmp_path / "cp")
        ).collect()
    }
    assert len(store.snapshots()) == 3  # day-1 + one per micro-batch

    # one-shot: the SAME docs as a single batch against a fresh clone
    clone2 = str(tmp_path / "sigs_oneshot")
    shutil.copytree(sig_root, clone2)
    oneshot = {
        (r.doc_a, r.doc_b, r.est_sim)
        for r in dedup_batch_incremental(
            spark,
            spark.createDataFrame(b1 + b2, DDL),
            SnapshotTable(spark, clone2),
            append=False,
        ).collect()
    }
    assert streamed == oneshot and len(oneshot) > 0
    # the cross-micro-batch pair (10, 21) must be present: 21 arrived in
    # batch 2 and found 10 only through the store append from batch 1
    assert any(a == 10 and b in (20, 21) for a, b, _ in streamed)


def test_stream_incremental_dedup_replay_exactly_once(spark, tmp_path):
    """A replayed micro-batch (same scope + batch id — the crash-restart
    shape) must NOT double-append signatures, must rewrite the same
    verdict partition instead of duplicating rows, and must return the
    ORIGINAL verdicts (the store-side anti-join makes recomputation
    against the already-appended signatures idempotent). A LATER batch id
    under the same scope still commits."""
    from emr_apache_iceberg_workshop_spark.plans.dedup import (
        build_signature_store,
    )
    from emr_apache_iceberg_workshop_spark.plans.streamingq import (
        incremental_dedup_stream_batch,
    )
    from emr_apache_iceberg_workshop_spark.tables import SnapshotTable

    root = str(tmp_path / "sigs")
    build_signature_store(
        spark, spark.createDataFrame([(1, BASE), (2, "unrelated corpus")], DDL), root
    )
    store = SnapshotTable(spark, root)
    out = str(tmp_path / "verdicts")
    b1 = spark.createDataFrame([(10, BASE), (11, BASE)], DDL)

    assert incremental_dedup_stream_batch(spark, b1, 0, store, out, scope="q1")
    first = sorted(
        (r.doc_a, r.doc_b, r.est_sim)
        for r in spark.read.parquet(out).select("doc_a", "doc_b", "est_sim").collect()
    )
    assert len(store.snapshots()) == 2 and len(first) > 0

    # replay batch 0: no new snapshot, verdicts identical (not doubled)
    assert not incremental_dedup_stream_batch(spark, b1, 0, store, out, scope="q1")
    again = sorted(
        (r.doc_a, r.doc_b, r.est_sim)
        for r in spark.read.parquet(out).select("doc_a", "doc_b", "est_sim").collect()
    )
    assert len(store.snapshots()) == 2
    assert again == first

    # a LATER batch commits and sees batch 0's docs through the store
    b2 = spark.createDataFrame([(20, BASE)], DDL)
    assert incremental_dedup_stream_batch(spark, b2, 1, store, out, scope="q1")
    assert len(store.snapshots()) == 3
    partners = {
        r.doc_a
        for r in spark.read.parquet(out).filter("doc_b = 20").collect()
    }
    assert {1, 10, 11} <= partners


# -- store maintenance invariance ---------------------------------------------
def test_signature_store_maintenance_invariance(spark, tmp_path):
    """compact() + expire_snapshots() on the signature store must leave
    incremental dedup verdicts IDENTICAL — maintenance rewrites layout,
    never state. (The store is an ordinary SnapshotTable, so the table
    maintenance surface composes with the incremental dedup family.)"""
    from emr_apache_iceberg_workshop_spark.plans.dedup import (
        build_signature_store,
        dedup_batch_incremental,
        minhash_signature_df,
    )
    from emr_apache_iceberg_workshop_spark.tables import SnapshotTable

    corpus = [(i, BASE + f" v{i % 3}") for i in range(1, 7)]
    day2 = [(10, BASE + " v1"), (11, "nothing in common with anything")]
    root = str(tmp_path / "sigs")
    build_signature_store(spark, spark.createDataFrame(corpus, DDL), root)
    store = SnapshotTable(spark, root)
    # a second day of appends so expire has history to drop
    store.write(minhash_signature_df(spark.createDataFrame(day2, DDL)))

    pristine = str(tmp_path / "sigs_pristine")
    shutil.copytree(root, pristine)

    batch = spark.createDataFrame([(100, BASE + " v2"), (101, BASE + " v1")], DDL)
    store.compact()
    expired = store.expire_snapshots(keep_last=1)
    assert expired  # history actually dropped
    got = {
        (r.doc_a, r.doc_b, r.est_sim)
        for r in dedup_batch_incremental(spark, batch, store, append=False).collect()
    }
    want = {
        (r.doc_a, r.doc_b, r.est_sim)
        for r in dedup_batch_incremental(
            spark, batch, SnapshotTable(spark, pristine), append=False
        ).collect()
    }
    assert got == want and len(want) > 0


# -- parent-relative counters: true parent, not wall-order predecessor --------
def test_snapshot_summary_cherry_pick_no_intervening_write(spark, tmp_path):
    """A cherry-pick IMMEDIATELY following its staged snapshot (no main
    write in between) must still report the picked files as added:
    meta["snapshots"] wall order is [s1, staged, pick], so a
    predecessor-relative diff would see the staged state (which already
    holds the picked file) and report added=0 — while the emitted
    metadata, which walks the main lineage, reports it added. Both
    surfaces must agree counter-for-counter."""
    import json

    from emr_apache_iceberg_workshop_spark.iceberg_meta import (
        write_iceberg_metadata,
    )
    from emr_apache_iceberg_workshop_spark.tables import SnapshotTable

    ddl = "k long, v string"
    t = SnapshotTable.create(spark, str(tmp_path / "cp2"), ddl)
    t.write(spark.createDataFrame([(1, "a")], ddl).coalesce(1))
    staged = t.write(
        spark.createDataFrame([(2, "b"), (3, "c")], ddl).coalesce(1),
        branch="audit",
    )
    pick_sid = t.cherry_pick_snapshot(staged)  # no main write in between

    st = {r.snapshot_id: r for r in t.snapshots_table().collect()}
    assert st[pick_sid].added_files == 1
    assert st[pick_sid].added_rows == 2
    assert st[pick_sid].total_records == 3
    # parent_id is the TRUE parent (the main head it was applied onto),
    # not the staged wall-order predecessor
    assert st[pick_sid].parent_id == 1

    md = write_iceberg_metadata(t)
    with open(md) as f:
        doc = json.load(f)
    summ = {s["snapshot-id"]: s["summary"] for s in doc["snapshots"]}[pick_sid]
    assert int(summ["added-data-files"]) == st[pick_sid].added_files
    assert int(summ["added-records"]) == st[pick_sid].added_rows


def test_stream_incremental_dedup_ignores_foreign_unscoped_ids(spark, tmp_path):
    """A scoped streaming query consuming a store whose batch-id stamps
    were written UNSCOPED (a manual/foreign writer) must not adopt them
    as its own history: its batch 0 commits instead of being classified
    a replay (the dsv2 legacy-adoption hazard, kept out of this new
    surface by exact-scope matching)."""
    from emr_apache_iceberg_workshop_spark.plans.dedup import (
        build_signature_store,
    )
    from emr_apache_iceberg_workshop_spark.plans.streamingq import (
        incremental_dedup_stream_batch,
    )
    from emr_apache_iceberg_workshop_spark.tables import SnapshotTable

    root = str(tmp_path / "sigs")
    build_signature_store(
        spark, spark.createDataFrame([(1, BASE)], DDL), root
    )
    store = SnapshotTable(spark, root)
    out = str(tmp_path / "verdicts")
    # foreign writer: unscoped stamps for batch ids 0 and 1
    assert incremental_dedup_stream_batch(
        spark, spark.createDataFrame([(10, BASE)], DDL), 0, store, out, scope=None
    )
    assert incremental_dedup_stream_batch(
        spark, spark.createDataFrame([(11, BASE)], DDL), 1, store, out, scope=None
    )
    assert len(store.snapshots()) == 3

    # a SCOPED query starting at batch 0 must still append (not a replay)
    assert incremental_dedup_stream_batch(
        spark, spark.createDataFrame([(20, BASE)], DDL), 0, store,
        str(tmp_path / "v2"), scope="q-scoped",
    )
    assert len(store.snapshots()) == 4
    # and ITS OWN replay of batch 0 is still skipped
    assert not incremental_dedup_stream_batch(
        spark, spark.createDataFrame([(20, BASE)], DDL), 0, store,
        str(tmp_path / "v2"), scope="q-scoped",
    )
    assert len(store.snapshots()) == 4


# -- SQL facade: CALL system.dedup_batch ---------------------------------------
def test_call_dedup_batch_facade_parity(spark, tmp_path):
    """CALL system.dedup_batch must return exactly what the library call
    returns, for both algos, and append => true must commit the batch's
    signatures (visible as a new store snapshot)."""
    from emr_apache_iceberg_workshop_spark.plans.dedup import (
        build_exact_hash_store,
        build_signature_store,
        dedup_batch_incremental,
        dedup_batch_incremental_exact,
    )
    from emr_apache_iceberg_workshop_spark.sqlext import SqlCatalog
    from emr_apache_iceberg_workshop_spark.tables import SnapshotTable

    corpus = [(1, BASE), (2, "corpus only text"), (3, BASE)]
    batch = [(10, BASE), (11, "fresh batch content")]
    mh_root = str(tmp_path / "mh_store")
    ex_root = str(tmp_path / "ex_store")
    build_signature_store(spark, spark.createDataFrame(corpus, DDL), mh_root)
    build_exact_hash_store(spark, spark.createDataFrame(corpus, DDL), ex_root)

    cat = SqlCatalog(spark)
    cat.register("mh_sigs", mh_root)
    cat.register("ex_hashes", ex_root)
    spark.createDataFrame(batch, DDL).createOrReplaceTempView("day2_batch")

    got_mh = cat.sql(
        "CALL system.dedup_batch('mh_sigs', source => 'day2_batch')"
    )
    want_mh = dedup_batch_incremental(
        spark, spark.table("day2_batch"), SnapshotTable(spark, mh_root),
        append=False,
    )
    assert sorted(map(tuple, got_mh.collect())) == sorted(map(tuple, want_mh.collect()))

    got_ex = cat.sql(
        "CALL system.dedup_batch('ex_hashes', source => 'day2_batch', algo => 'exact')"
    )
    want_ex = dedup_batch_incremental_exact(
        spark, spark.table("day2_batch"), SnapshotTable(spark, ex_root),
        append=False,
    )
    assert sorted(map(tuple, got_ex.collect())) == sorted(map(tuple, want_ex.collect()))

    # append => true commits the batch signatures
    assert len(SnapshotTable(spark, mh_root).snapshots()) == 1
    cat.sql(
        "CALL system.dedup_batch('mh_sigs', source => 'day2_batch', append => true)"
    ).collect()
    assert len(SnapshotTable(spark, mh_root).snapshots()) == 2

    with pytest.raises(ValueError, match="unknown algo"):
        cat.sql("CALL system.dedup_batch('mh_sigs', source => 'day2_batch', algo => 'nope')")
    with pytest.raises(ValueError, match="requires"):
        cat.sql("CALL system.dedup_batch('mh_sigs')")


# -- incremental decontamination ------------------------------------------------
def test_incremental_decontam_never_rescans_benchmark_text(spark, tmp_path):
    """The batch check's plan reads batch text + the benchmark-gram
    store's parquet ONLY; appending a NEW benchmark as a store snapshot
    catches previously-clean docs."""
    import re

    from emr_apache_iceberg_workshop_spark.plans.textops import (
        build_benchmark_store,
        decontaminate_batch,
    )
    from emr_apache_iceberg_workshop_spark.tables import SnapshotTable

    bench_pq = str(tmp_path / "bench_docs")
    batch_pq = str(tmp_path / "batch_docs")
    eval_text = "the quick brown fox jumps over the lazy dog near the river bank"
    spark.createDataFrame([(1, eval_text)], DDL).write.parquet(bench_pq)
    spark.createDataFrame(
        [
            (10, eval_text + " and beyond"),  # contaminated
            (11, "completely novel training content with original phrasing"
                 " that shares no four gram with any benchmark at all"),
        ],
        DDL,
    ).write.parquet(batch_pq)

    root = str(tmp_path / "grams")
    build_benchmark_store(spark, spark.read.parquet(bench_pq), root)
    store = SnapshotTable(spark, root)
    assert len(store.snapshots()) == 1

    batch = spark.read.parquet(batch_pq)
    rep = {r.doc_id: r for r in decontaminate_batch(spark, batch, store).collect()}
    assert 10 in rep and rep[10].contamination_ratio > 0.5
    assert 11 not in rep  # clean doc: no benchmark gram

    # plan audit: benchmark TEXT is never rescanned
    spark.conf.set("spark.sql.maxMetadataStringLength", "2000")
    rep2 = decontaminate_batch(spark, batch, store)
    plan = rep2._jdf.queryExecution().executedPlan().toString()
    scanned = " ".join(
        set(re.findall(r"Location:[^\[]*\[([^\]]*)\]", plan))
        | set(re.findall(r"file:[^\s,\]]*", plan))
    )
    assert "bench_docs" not in scanned, scanned

    # a NEW benchmark lands: append its grams; doc 11 is now caught
    new_bench = spark.createDataFrame(
        [(2, "completely novel training content with original phrasing")], DDL
    )
    rep3 = {
        r.doc_id: r
        for r in decontaminate_batch(
            spark, batch, store, append_bench=new_bench
        ).collect()
    }
    assert len(store.snapshots()) == 2
    assert 11 in rep3 and rep3[11].n_contaminated > 0
    assert rep3[10].n_contaminated == rep[10].n_contaminated  # unchanged


# -- incremental token-frequency maintenance --------------------------------------
def test_update_token_freq_sequential_batches(spark, tmp_path):
    """Two sequential batch merges into the MOR frequency store must
    leave state equal to the from-scratch recount over all docs; each
    update is a merge commit (no table rewrite), and untouched tokens'
    rows are not rewritten."""
    from pyspark.sql import functions as F

    from emr_apache_iceberg_workshop_spark.plans.textops import (
        build_token_freq_store,
        update_token_freq,
    )

    corpus = [(1, "alpha beta beta gamma"), (2, "alpha delta")]
    b1 = [(10, "beta epsilon epsilon")]
    b2 = [(20, "alpha beta zeta")]
    root = str(tmp_path / "freqs")
    store = build_token_freq_store(
        spark, spark.createDataFrame(corpus, DDL), root
    )
    assert store.properties()["write.merge.mode"] == "merge-on-read"

    update_token_freq(spark, spark.createDataFrame(b1, DDL), store)
    update_token_freq(spark, spark.createDataFrame(b2, DDL), store)

    got = {r.token: r.freq for r in store.scan().collect()}
    all_docs = spark.createDataFrame(corpus + b1 + b2, DDL)
    want = {
        r.token: r.freq
        for r in all_docs.selectExpr(
            "explode(regexp_extract_all(text, '[a-z0-9]+', 0)) AS token"
        ).groupBy("token").agg(F.count(F.lit(1)).alias("freq")).collect()
    }
    assert got == want
    # three commits: day-1 append + two MOR merges
    ops = [s.operation for s in store.snapshots()]
    assert ops == ["append", "merge", "merge"]
