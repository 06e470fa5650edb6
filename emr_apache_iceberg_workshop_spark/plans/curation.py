"""Corpus-curation operators — the end-to-end statements a training-data
pipeline runs between raw documents and a training shard (north-star
extension alongside dedup/similarity/text analysis).

- `c_hash_sample`: DETERMINISTIC sampling via a multiplicative hash mod a
  Mersenne prime — reproducible across runs/engines (unlike
  `df.sample()`, whose output depends on partitioning), overflow-safe at
  any key scale (`key % P` first, multiplier < 2^30 → product < 2^61),
  and evaluated inside the scan filter (no shuffle, no extra pass).
- `c_train_split`: the same hash family bucketed into train/val/test —
  the canonical leak-proof split assignment: a document's split is a pure
  function of its id, stable as the corpus grows.
- `c_dup_groups`: connected components over the near-dup pair graph
  (n-gram Jaccard >= 0.3 edges, same pair semantics as d_ngram_jaccard).
  Spark side is alternating large-star/small-star contraction
  (operators/graph.py) — O(log diameter) edge-set shuffles, robust even
  to adversarially long duplicate chains. The DuckDB oracle is the same
  fixpoint via WITH RECURSIVE.
- `c_curated_corpus`: the full curation funnel in one statement — quality
  gate (token count + type-token ratio), language agreement (n-gram-free
  langid heuristic vs the labeled lang), exact-dup removal (min doc_id
  per md5(text) — one window pass), then per-language corpus stats. Every
  stage is codegen'd scan-side work except the dedup window (one shuffle
  on the text hash) and the final agg.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..catalog import fan_out, load_table
from ..functions import dsum, osum
from .registry import query
from .dedup import SHINGLES_D, MAX_SHINGLE_DF
from .textops import TOKS_S, TOKS_D, LANG_MARKERS, _LANG_ORDER, NGRAM4_D, _predicted

# Two-round minstd multiplicative hash mod the Mersenne prime 2^31-1.
# `key % P` BEFORE the first multiply keeps every intermediate < 2^48
# (int64-safe for arbitrarily large keys); both engines do identical
# BIGINT arithmetic. TWO rounds matter: a single multiply never wraps P
# for keys < P/A (e.g. dense doc_ids on a small corpus), leaving the
# "hash" monotone in the key — thresholds then keep a key-range, not a
# uniform sample. The second multiply pushes every nonzero key past P,
# so the output is well-mixed at fixture scale AND 100 TB scale.
_P = 2147483647
_A = 48271
_A2 = 69621  # independent multiplier pair: mixing/stratification decisions
# must not correlate with c_hash_sample/c_train_split assignments


def _hash_expr(key: str) -> str:
    return f"(((({key} % {_P}) * {_A}) % {_P}) * {_A2}) % {_P}"


def _hash2_expr(key: str) -> str:
    return f"(((({key} % {_P}) * {_A2}) % {_P}) * {_A}) % {_P}"


# --------------------------------------------------------------------------
@query(
    "c_hash_sample",
    oracle=f"""
    SELECT o_orderpriority,
           COUNT(*) AS n_sampled,
           {osum('o_totalprice', 2)} AS sampled_spend,
           MIN(o_orderkey) AS min_key,
           MAX(o_orderkey) AS max_key
    FROM orders
    WHERE {_hash_expr('o_orderkey')} < {_P // 10}
    GROUP BY o_orderpriority
    """,
    tags=("curation:sample", "pushdown"),
)
def c_hash_sample(spark, sf_dir) -> DataFrame:
    """~10% deterministic sample of orders; the hash predicate runs inside
    the scan stage (column-pruned, codegen'd), so the sample costs one
    linear pass and the tiny post-filter agg."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.filter(F.expr(f"{_hash_expr('o_orderkey')} < {_P // 10}"))
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_sampled"),
            dsum(F.col("o_totalprice"), 2).alias("sampled_spend"),
            F.min("o_orderkey").alias("min_key"),
            F.max("o_orderkey").alias("max_key"),
        )
    )


# --------------------------------------------------------------------------
@query(
    "c_train_split",
    oracle=f"""
    SELECT CASE WHEN {_hash_expr('doc_id')} % 10 < 8 THEN 'train'
                WHEN {_hash_expr('doc_id')} % 10 = 8 THEN 'val'
                ELSE 'test' END AS split,
           lang,
           COUNT(*) AS n_docs,
           CAST(SUM(len({TOKS_D})) AS BIGINT) AS total_tokens,
           COUNT(DISTINCT source) AS n_sources
    FROM documents
    GROUP BY 1, 2
    """,
    tags=("curation:split", "agg"),
)
def c_train_split(spark, sf_dir) -> DataFrame:
    """80/10/10 train/val/test assignment as a pure function of doc_id —
    no shuffle to assign (scan-side CASE), one hash-agg to report."""
    docs = fan_out(load_table(spark, sf_dir, "documents"))
    split = F.expr(f"{_hash_expr('doc_id')} % 10")
    return (
        docs.withColumn(
            "split",
            F.when(split < 8, F.lit("train")).when(split == 8, F.lit("val")).otherwise(F.lit("test")),
        )
        .groupBy("split", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.expr(f"size({TOKS_S})")).cast("long").alias("total_tokens"),
            F.countDistinct("source").alias("n_sources"),
        )
    )


# --------------------------------------------------------------------------
@query(
    "c_dup_groups",
    oracle=f"""
    WITH RECURSIVE
      s AS (SELECT doc_id, {SHINGLES_D} AS sh FROM documents),
      e AS (SELECT doc_id, unnest(sh) AS shingle FROM s),
      hot AS (SELECT shingle FROM e GROUP BY shingle
              HAVING COUNT(*) > {MAX_SHINGLE_DF}),
      ec AS (SELECT doc_id, shingle FROM e
             WHERE shingle NOT IN (SELECT shingle FROM hot)),
      cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
               FROM ec a JOIN ec b ON a.shingle = b.shingle AND a.doc_id < b.doc_id),
      edges AS (SELECT doc_a, doc_b
                FROM cand JOIN s sa ON sa.doc_id = doc_a JOIN s sb ON sb.doc_id = doc_b
                WHERE CAST(len(sa.sh) + len(sb.sh)
                           - len(list_distinct(list_concat(sa.sh, sb.sh))) AS DOUBLE)
                      / len(list_distinct(list_concat(sa.sh, sb.sh))) >= 0.3),
      sym AS (SELECT doc_a AS u, doc_b AS v FROM edges
              UNION ALL SELECT doc_b, doc_a FROM edges),
      reach(doc_id, label) AS (
        SELECT DISTINCT u, u FROM sym
        UNION
        SELECT s.v, r.label FROM reach r JOIN sym s ON s.u = r.doc_id
      )
    SELECT group_id, COUNT(*) AS n_docs, MAX(doc_id) AS max_doc
    FROM (SELECT doc_id, MIN(label) AS group_id FROM reach GROUP BY doc_id)
    GROUP BY group_id
    """,
    tags=("curation:components", "iterative"),
)
def c_dup_groups(spark, sf_dir) -> DataFrame:
    """Duplicate GROUPS (not just pairs): connected components of the
    near-dup graph, labeled by the component's min doc_id. Components come
    from alternating large-star/small-star contraction
    (operators/graph.py): O(log diameter) rounds instead of min-label
    propagation's O(diameter) — the round count is the number of full
    edge-set shuffles, so the exponent is what survives 100 TB."""
    from ..operators.graph import connected_components
    from .dedup import jaccard_pairs_for

    pairs = jaccard_pairs_for(spark, sf_dir)
    labels, _rounds = connected_components(pairs.selectExpr("doc_a AS u", "doc_b AS v"))
    return labels.groupBy(F.col("label").alias("group_id")).agg(
        F.count(F.lit(1)).alias("n_docs"), F.max("doc_id").alias("max_doc")
    )


# --------------------------------------------------------------------------
@query(
    "c_curated_corpus",
    oracle=f"""
    WITH scored AS (
      SELECT doc_id, lang, source, text,
             len({TOKS_D}) AS n_tokens,
             CASE WHEN len({TOKS_D}) > 0
                  THEN CAST(len(list_distinct({TOKS_D})) AS DOUBLE) / len({TOKS_D})
                  ELSE 0.0 END AS ttr,
             {_predicted('duck')} AS pred_lang
      FROM documents
    ),
    gated AS (
      SELECT * FROM scored WHERE n_tokens >= 20 AND ttr >= 0.2
    ),
    deduped AS (
      SELECT * FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
        FROM gated) WHERE rn = 1
    )
    SELECT lang,
           COUNT(*) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
           COUNT(DISTINCT source) AS n_sources,
           CAST(SUM(CASE WHEN pred_lang = lang THEN 1 ELSE 0 END) AS BIGINT) AS n_lang_agree,
           MIN(doc_id) AS min_doc
    FROM deduped GROUP BY lang
    """,
    tags=("curation:pipeline", "window", "agg"),
)
def c_curated_corpus(spark, sf_dir) -> DataFrame:
    """The whole curation funnel: quality gate -> exact-dup removal ->
    per-language shard stats incl. langid agreement. Scan-side scoring
    (codegen'd array exprs), ONE shuffle for the dedup window (partition
    by md5(text)), one final agg."""
    from pyspark.sql import Window

    docs = fan_out(load_table(spark, sf_dir, "documents"))
    # Tokenize ONCE into a column, score each language over it, then take
    # the argmax over the score COLUMNS — inlining `_predicted` here would
    # repeat the regexp tokenizer ~40x inside one CASE (codegen blowup).
    # materialized so project-collapse can't inline the regexp tokenizer
    # into every downstream __toks reference (see dedup.py: same pitfall)
    toked = docs.selectExpr(
        "doc_id", "lang", "source", "text", f"{TOKS_S} AS __toks"
    ).localCheckpoint(eager=True)
    scored = toked.selectExpr(
        "doc_id",
        "lang",
        "source",
        "text",
        "CAST(size(__toks) AS BIGINT) AS n_tokens",
        """CASE WHEN size(__toks) > 0
             THEN CAST(size(array_distinct(__toks)) AS DOUBLE) / size(__toks)
             ELSE 0.0D END AS ttr""",
        *[
            "size(filter(__toks, x -> x IN ({}))) AS __s_{}".format(
                ", ".join(f"'{w}'" for w in LANG_MARKERS[lg]), lg
            )
            for lg in _LANG_ORDER
        ],
    )
    argmax = "CASE " + " ".join(
        "WHEN "
        + " AND ".join(f"__s_{lg} >= __s_{o}" for o in _LANG_ORDER if o != lg)
        + f" THEN '{lg}'"
        for lg in _LANG_ORDER
    ) + " ELSE 'und' END"
    scored = scored.withColumn("pred_lang", F.expr(argmax))
    gated = scored.filter((F.col("n_tokens") >= 20) & (F.col("ttr") >= 0.2))
    w = Window.partitionBy(F.md5("text")).orderBy("doc_id")
    deduped = gated.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1)
    return deduped.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
        F.countDistinct("source").alias("n_sources"),
        F.sum((F.col("pred_lang") == F.col("lang")).cast("long")).alias("n_lang_agree"),
        F.min("doc_id").alias("min_doc"),
    )


# --------------------------------------------------------------------------
# Corpus mixing: weighted union of sources into one training mixture.
# Weights are applied as DETERMINISTIC per-document hash thresholds (same
# minstd family as c_hash_sample, independent multiplier), so the mixture
# is reproducible across runs/engines and membership is a pure function of
# (source tier, doc_id). At 100 TB this is a scan-side predicate per
# source — no shuffle to mix, one agg to report; upweighting (>1.0, i.e.
# repeating epochs of a source) is done downstream by the data loader, so
# weights here are capped at 1.0.
MIX_WEIGHTS = {
    # tier boundaries chosen to exercise all paths: keep-all, downsample,
    # heavy downsample. Tiering by source index keeps the CASE tiny (3
    # branches) regardless of source count.
    "high": 1.0,  # src0-src6
    "mid": 0.5,  # src7-src13
    "low": 0.2,  # src14+
}


def _mix_tier(dialect: str) -> str:
    num = "CAST(substr(source, 4) AS BIGINT)" if dialect == "duck" else "CAST(substring(source, 4) AS BIGINT)"
    return f"CASE WHEN {num} <= 6 THEN 'high' WHEN {num} <= 13 THEN 'mid' ELSE 'low' END"


def _mix_keep(dialect: str) -> str:
    h = _hash2_expr("doc_id")
    tier = _mix_tier(dialect)
    thr_mid = int(_P * MIX_WEIGHTS["mid"])
    thr_low = int(_P * MIX_WEIGHTS["low"])
    return (
        f"(({tier}) = 'high' OR (({tier}) = 'mid' AND {h} < {thr_mid})"
        f" OR (({tier}) = 'low' AND {h} < {thr_low}))"
    )


@query(
    "c_mix_corpora",
    oracle=f"""
    SELECT {_mix_tier('duck')} AS tier,
           lang,
           COUNT(*) AS n_docs,
           CAST(SUM(len({TOKS_D})) AS BIGINT) AS total_tokens,
           COUNT(DISTINCT source) AS n_sources,
           MIN(doc_id) AS min_doc
    FROM documents
    WHERE {_mix_keep('duck')}
    GROUP BY 1, 2
    """,
    tags=("curation:mix", "pushdown"),
)
def c_mix_corpora(spark, sf_dir) -> DataFrame:
    """Weighted corpus mixture: per-tier deterministic downsampling fused
    into the scan filter (codegen'd, no Python), then per (tier, lang)
    mixture stats. The membership predicate references only (source,
    doc_id), so with the corpus partitioned by source the filter prunes
    entire partitions for weight-0 tiers and runs scan-side otherwise."""
    docs = fan_out(load_table(spark, sf_dir, "documents"))
    return (
        docs.filter(F.expr(_mix_keep("spark")))
        .withColumn("tier", F.expr(_mix_tier("spark")))
        .groupBy("tier", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.expr(f"size({TOKS_S})")).cast("long").alias("total_tokens"),
            F.countDistinct("source").alias("n_sources"),
            F.min("doc_id").alias("min_doc"),
        )
    )


# --------------------------------------------------------------------------
# Temperature-scaled corpus mixing — the multilingual sampling scheme of
# mT5/XLM-R (and GPT-3's corpus weighting): sample stratum l with
# probability ∝ n_l^α, α = 0.5, flattening the raw distribution so
# low-resource languages are upweighted relative to their share. With a
# token budget T = 60% of the corpus, stratum l's sampling rate is
# r_l = T · w_l / n_l (w_l the temperature weight), capped at 1; membership
# is the usual deterministic hash gate, so the "sampler" is a scan-side
# predicate like c_hash_sample's.
#
# Cross-engine determinism: α = 0.5 makes the power a sqrt — IEEE-exact
# correctly-rounded in both engines (general pow() is libm-dependent) —
# then round(·1000) pins the weight to integer per-mille before ALL
# downstream arithmetic, which is pure BIGINT (multiply/DIV), so the
# per-stratum threshold is bit-identical across engines. Operand order in
# the DIV chain is part of the spec: both sides compute
# ((sq_kilo·P) DIV S)·T DIV n_l.
#
# Scale shape: stratum stats are one tiny agg (rows = distinct langs,
# broadcast back at any corpus size); the gate is a pure function of
# (doc_id, stratum stats) evaluated scan-side — one linear pass, no
# quadratic term, same as c_stratified_sample.
_TMIX_HASH = _hash_expr("(d.doc_id * 31 + 7)")  # decorrelated from the
# c_hash_sample/_hash2 streams: distinct affine pre-mix of the key
_TMIX_BUDGET_NUM, _TMIX_BUDGET_DEN = 6, 10  # T = 60% of corpus


@query(
    "c_temperature_mix",
    oracle=f"""
    WITH counts AS (
      SELECT lang, COUNT(*) AS n FROM documents GROUP BY lang
    ), tot AS (
      SELECT CAST(SUM(n) AS BIGINT) AS nn,
             CAST(SUM(CAST(round(sqrt(n) * 1000) AS BIGINT)) AS BIGINT) AS s
      FROM counts
    ), rates AS (
      SELECT c.lang, c.n, tot.nn,
             CAST(round(sqrt(c.n) * 1000) AS BIGINT) AS sq_kilo, tot.s,
             ((CAST(round(sqrt(c.n) * 1000) AS BIGINT) * {_P}) // tot.s)
               * ((tot.nn * {_TMIX_BUDGET_NUM}) // {_TMIX_BUDGET_DEN}) // c.n
               AS r_scaled
      FROM counts c CROSS JOIN tot
    )
    SELECT r.lang,
           CAST(r.n AS BIGINT) AS n_docs,
           ROUND(CAST(r.n AS DOUBLE) / r.nn, 9) AS raw_share,
           ROUND(CAST(r.sq_kilo AS DOUBLE) / r.s, 9) AS temp_weight,
           ROUND(CAST(r.r_scaled AS DOUBLE) / {_P}, 9) AS effective_epochs,
           ROUND(CAST(LEAST(r.r_scaled, {_P}) AS DOUBLE) / {_P}, 9) AS sample_rate,
           COUNT(CASE WHEN {_TMIX_HASH} < LEAST(r.r_scaled, {_P}) THEN 1 END)
             AS n_sampled,
           CAST(SUM(CASE WHEN {_TMIX_HASH} < LEAST(r.r_scaled, {_P})
                         THEN len({TOKS_D.replace('text', 'd.text')}) END) AS BIGINT)
             AS sampled_tokens
    FROM documents d JOIN rates r ON d.lang = r.lang
    GROUP BY r.lang, r.n, r.nn, r.sq_kilo, r.s, r.r_scaled
    """,
    tags=("curation:mix", "agg"),
)
def c_temperature_mix(spark, sf_dir) -> DataFrame:
    """Per-language temperature-sampling report: raw share, α=0.5 weight,
    effective epochs at a 60% token budget, realized sample via the
    deterministic hash gate."""
    docs = fan_out(load_table(spark, sf_dir, "documents")).alias("d")
    counts = docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n"))
    tot = counts.agg(
        F.sum("n").cast("bigint").alias("nn"),
        F.sum(F.expr("CAST(round(sqrt(n) * 1000) AS BIGINT)")).cast("bigint").alias("s"),
    )
    rates = (
        counts.crossJoin(F.broadcast(tot))  # 1-row scalar: corpus totals
        .selectExpr(
            "lang",
            "n",
            "nn",
            "CAST(round(sqrt(n) * 1000) AS BIGINT) AS sq_kilo",
            "s",
            f"""((CAST(round(sqrt(n) * 1000) AS BIGINT) * {_P}) DIV s)
                * ((nn * {_TMIX_BUDGET_NUM}) DIV {_TMIX_BUDGET_DEN}) DIV n
                AS r_scaled""",
        )
    )
    keep = F.expr(_TMIX_HASH) < F.expr(f"LEAST(r_scaled, CAST({_P} AS BIGINT))")
    return (
        docs.join(rates, "lang")
        .groupBy("lang", "n", "nn", "sq_kilo", "s", "r_scaled")
        .agg(
            F.count(F.when(keep, 1)).alias("n_sampled"),
            F.sum(F.when(keep, F.expr(f"size({TOKS_S})"))).cast("bigint").alias(
                "sampled_tokens"
            ),
        )
        .selectExpr(
            "lang",
            "CAST(n AS BIGINT) AS n_docs",
            "ROUND(CAST(n AS DOUBLE) / nn, 9) AS raw_share",
            "ROUND(CAST(sq_kilo AS DOUBLE) / s, 9) AS temp_weight",
            f"ROUND(CAST(r_scaled AS DOUBLE) / {_P}, 9) AS effective_epochs",
            f"ROUND(CAST(LEAST(r_scaled, CAST({_P} AS BIGINT)) AS DOUBLE) / {_P}, 9)"
            " AS sample_rate",
            "n_sampled",
            "sampled_tokens",
        )
    )


# --------------------------------------------------------------------------
# Stratified rebalancing: cap every language stratum at STRATUM_CAP docs
# via a per-stratum deterministic sampling rate (cap / stratum size).
# Two-pass shape: a tiny per-stratum count agg (5 rows here; bounded by
# distinct langs at any scale) broadcast back onto the scan, then the same
# hash-threshold predicate as c_hash_sample. Inclusion is a pure function
# of (doc_id, stratum size), reproducible across engines. The threshold is
# computed in BIGINT ((cap * P) DIV n — cap*P < 2^39, overflow-safe) so
# Spark and DuckDB agree bit-for-bit; float rates would round differently.
STRATUM_CAP = 60


@query(
    "c_stratified_sample",
    oracle=f"""
    WITH counts AS (SELECT lang, COUNT(*) AS n FROM documents GROUP BY lang)
    SELECT d.lang,
           COUNT(*) AS n_sampled,
           MAX(c.n) AS stratum_size,
           CAST(SUM(len({TOKS_D})) AS BIGINT) AS total_tokens,
           MIN(d.doc_id) AS min_doc,
           MAX(d.doc_id) AS max_doc
    FROM documents d JOIN counts c ON d.lang = c.lang
    WHERE {_hash2_expr('d.doc_id')} < ({STRATUM_CAP} * CAST({_P} AS BIGINT)) // c.n
    GROUP BY d.lang
    """,
    tags=("curation:stratified", "agg"),
)
def c_stratified_sample(spark, sf_dir) -> DataFrame:
    """Rebalance the corpus: downsample each language to ~STRATUM_CAP docs
    with a deterministic per-stratum rate. The counts side is one row per
    stratum — broadcast by AQE at any corpus size — and the filter stays
    scan-side, so the whole operator is one small agg + one linear pass."""
    docs = fan_out(load_table(spark, sf_dir, "documents"))
    counts = docs.groupBy("lang").agg(F.count(F.lit(1)).alias("__n"))
    thr = F.expr(f"CAST({STRATUM_CAP} * CAST({_P} AS BIGINT) DIV __n AS BIGINT)")
    return (
        docs.join(counts, "lang")
        .filter(F.expr(_hash2_expr("doc_id")) < thr)
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_sampled"),
            F.max("__n").alias("stratum_size"),
            F.sum(F.expr(f"size({TOKS_S})")).cast("long").alias("total_tokens"),
            F.min("doc_id").alias("min_doc"),
            F.max("doc_id").alias("max_doc"),
        )
    )


# --------------------------------------------------------------------------
# Sequence packing: assign documents to fixed token-budget bins for LLM
# training batches. Docs are sharded by an independent hash (bounded
# packing domains — a per-(lang) total order would funnel each language
# through ONE reducer at 100 TB; 64-way sharding caps partition size and
# the shuffle stays balanced), then packed greedily in doc_id order by
# exclusive-prefix-sum DIV budget ("offset packing": a bin may overflow by
# at most one document — the standard streaming-packing tradeoff that
# keeps assignment a pure window function, no sequential state).
PACK_BUDGET = 512  # tokens per bin
PACK_SHARDS = 8  # fixture-sized; 100 TB uses O(cores) shards


@query(
    "c_pack_sequences",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, lang,
             {_hash2_expr('doc_id')} % {PACK_SHARDS} AS shard,
             len({TOKS_D}) AS n_tokens
      FROM documents
    ),
    packed AS (
      SELECT lang, shard, n_tokens,
             COALESCE(SUM(n_tokens) OVER (
               PARTITION BY lang, shard ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
             // {PACK_BUDGET} AS bin_id
      FROM toks
    )
    SELECT lang, shard, CAST(bin_id AS BIGINT) AS bin_id,
           COUNT(*) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS bin_tokens
    FROM packed
    GROUP BY lang, shard, bin_id
    """,
    tags=("curation:packing", "window"),
)
def c_pack_sequences(spark, sf_dir) -> DataFrame:
    """Token-budget sequence packing: per (lang, shard), docs are packed in
    doc_id order into ~PACK_BUDGET-token bins via exclusive prefix sum DIV
    budget — one bounded-partition window shuffle, one agg, deterministic
    across engines."""
    from pyspark.sql import Window

    docs = fan_out(load_table(spark, sf_dir, "documents"))
    toks = docs.selectExpr(
        "doc_id",
        "lang",
        f"{_hash2_expr('doc_id')} % {PACK_SHARDS} AS shard",
        f"CAST(size({TOKS_S}) AS BIGINT) AS n_tokens",
    )
    w = (
        Window.partitionBy("lang", "shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    packed = toks.withColumn(
        "bin_id",
        (F.coalesce(F.sum("n_tokens").over(w), F.lit(0)) / F.lit(PACK_BUDGET))
        .cast("bigint"),
    )
    return packed.groupBy("lang", "shard", "bin_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("bin_tokens"),
    )


# --------------------------------------------------------------------------
# Per-source frequency capping — the "no single domain dominates the
# corpus" rule every web-scale training set applies (cap documents per
# domain/source before mixing).
#
# The naive plan is ROW_NUMBER() OVER (PARTITION BY source ORDER BY hash)
# ≤ cap — correct, but at 100 TB a viral domain's entire document set
# lands on ONE window reducer (windows are exempt from AQE skew
# splitting). This implementation computes the IDENTICAL kept-set
# distributively:
#   1. bucket each doc by `h % B` (B=1024 hash buckets);
#   2. per-(source, bucket) histogram (map-side-combinable groupBy — the
#      skew-safe aggregation shape) + tiny per-source cumulative sum
#      (#sources × B rows);
#   3. keep buckets whose cumulative count stays under the cap outright,
#      drop buckets past it, and ROW_NUMBER only inside each surviving
#      bucket (≤ n_source/B rows per window partition — bounded).
# The kept set equals rank ≤ cap under the lexicographic order
# (h % B, h, doc_id) — which is what the single-window oracle ranks by —
# and since h is a uniform hash, bucket-major order is just as unbiased
# as h-major order.

SOURCE_CAP = 18
_CAP_BUCKETS = 1024


@query(
    "c_source_cap",
    oracle=f"""
    WITH d AS (
      SELECT source, n_chars, doc_id,
             {_hash_expr('doc_id')} AS h,
             {_hash_expr('doc_id')} % {_CAP_BUCKETS} AS bkt
      FROM documents),
    r AS (
      SELECT source, n_chars,
             ROW_NUMBER() OVER (PARTITION BY source ORDER BY bkt, h, doc_id) AS rn
      FROM d)
    SELECT source,
           COUNT(*) AS n_docs,
           COUNT(*) FILTER (WHERE rn <= {SOURCE_CAP}) AS n_kept,
           CAST(SUM(n_chars) FILTER (WHERE rn <= {SOURCE_CAP}) AS BIGINT) AS kept_chars
    FROM r GROUP BY source
    """,
    tags=("curation:cap", "skew-safe"),
)
def c_source_cap(spark, sf_dir) -> DataFrame:
    """Cap each source at SOURCE_CAP docs (deterministic hash-order
    selection), skew-safely: histogram + cumulative bucket cutoff, then
    windows only inside surviving ≤ n/B-row buckets."""
    from pyspark.sql import Window

    docs = fan_out(load_table(spark, sf_dir, "documents")).selectExpr(
        "doc_id",
        "source",
        "n_chars",
        f"{_hash_expr('doc_id')} AS h",
        f"{_hash_expr('doc_id')} % {_CAP_BUCKETS} AS bkt",
    )
    hist = docs.groupBy("source", "bkt").agg(F.count(F.lit(1)).alias("c"))
    wcum = (
        Window.partitionBy("source")
        .orderBy("bkt")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    # buckets with `before >= cap` are fully past the cutoff — dropped
    # BEFORE their rows are ever shuffled or windowed
    bounds = (
        hist.withColumn("before", F.coalesce(F.sum("c").over(wcum), F.lit(0)))
        .filter(F.col("before") < SOURCE_CAP)
        .select("source", "bkt", "before")
    )
    wb = Window.partitionBy("source", "bkt").orderBy("h", "doc_id")
    kept = (
        docs.join(bounds, ["source", "bkt"])
        .withColumn("rn", F.row_number().over(wb))
        .filter(F.col("before") + F.col("rn") <= SOURCE_CAP)
    )
    tot = docs.groupBy("source").agg(F.count(F.lit(1)).alias("n_docs"))
    ks = kept.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.sum("n_chars").cast("bigint").alias("kept_chars"),
    )
    return tot.join(ks, "source")


# --------------------------------------------------------------------------
_CHUNK, _STRIDE = 16, 12  # tokens per chunk, step between chunk starts


@query(
    "c_chunk_documents",
    # overlapping fixed-size token windows (the pretraining chunker):
    # starts at 1, 1+stride, ... while start <= n_tokens; each chunk is
    # slice(tokens, start, CHUNK) — last chunks are short, never empty
    oracle=f"""
    WITH t AS (SELECT doc_id, {TOKS_D} AS toks FROM documents),
         c AS (SELECT doc_id,
                      unnest(generate_series(1, greatest(len(toks), 1), {_STRIDE}))
                          AS start_token,
                      toks
               FROM t WHERE len(toks) > 0)
    SELECT doc_id,
           CAST((start_token - 1) / {_STRIDE} AS INT) AS chunk_id,
           CAST(start_token AS INT) AS start_token,
           CAST(least({_CHUNK}, len(toks) - start_token + 1) AS INT) AS chunk_len,
           array_to_string(list_slice(toks, start_token,
                                      start_token + {_CHUNK} - 1), ' ') AS chunk_text
    FROM c
    """,
    tags=("curation:chunking", "explode"),
)
def c_chunk_documents(spark, sf_dir) -> DataFrame:
    """Fixed-size overlapping token chunks per document ({C} tokens,
    stride {S}) — the windowing step that turns variable-length documents
    into training-sized sequences while keeping overlap for context
    continuity.

    Scale shape: pure per-row explode of a generated start-index
    sequence — no shuffle, no state; output size is a constant factor of
    input tokens. At 100 TB this is a map-only job."""
    docs = fan_out(load_table(spark, sf_dir, "documents"))
    t = docs.selectExpr("doc_id", f"{TOKS_S} AS toks").filter(F.expr("size(toks) > 0"))
    c = t.select(
        "doc_id",
        F.explode(
            F.expr(f"sequence(1, greatest(size(toks), 1), {_STRIDE})")
        ).alias("start_token"),
        "toks",
    )
    return c.select(
        "doc_id",
        F.expr(f"CAST((start_token - 1) / {_STRIDE} AS INT)").alias("chunk_id"),
        F.col("start_token").cast("int"),
        F.expr(f"CAST(least({_CHUNK}, size(toks) - start_token + 1) AS INT)").alias(
            "chunk_len"
        ),
        F.expr(f"concat_ws(' ', slice(toks, start_token, {_CHUNK}))").alias(
            "chunk_text"
        ),
    )


# --------------------------------------------------------------------------
# Gopher-rules-style quality funnel: the ordered rejection cascade a web
# pipeline runs before training (Rae et al. 2021 §A1 'quality filtering',
# C4's heuristics) — each document is attributed to the FIRST rule it
# fails, survivors pass, and the report is per-rule rejection accounting
# (the number every curation run publishes to justify its retention rate).
#
# Scale design (100 TB): the whole cascade is a single scan-side CASE over
# per-row token arrays (codegen'd, no UDF, no join) followed by one tiny
# hash aggregate on the verdict label (≤ 6 groups); the share column is a
# window over those ≤ 6 rows. One linear pass, one negligible shuffle.

_FUNNEL_RULES = (
    # (label, spark predicate, duck predicate) — evaluated in order
    ("1_too_short", "n_toks < 25", "n_toks < 25"),
    ("2_too_long", "n_toks > 2000", "n_toks > 2000"),
    ("3_word_len", "mwl < 2.5 OR mwl > 8.0", "mwl < 2.5 OR mwl > 8.0"),
    ("4_low_ttr", "ttr < 0.4", "ttr < 0.4"),
    ("5_lang_mismatch", "pred != lang", "pred <> lang"),
)


def _funnel_verdict(dialect: str) -> str:
    branches = " ".join(
        f"WHEN {sp if dialect == 'spark' else dk} THEN '{label}'"
        for label, sp, dk in _FUNNEL_RULES
    )
    return f"CASE {branches} ELSE 'pass' END"


@query(
    "c_quality_funnel",
    oracle=f"""
    WITH m AS (SELECT lang,
                      len({TOKS_D}) AS n_toks,
                      CASE WHEN len({TOKS_D}) > 0
                           THEN CAST(list_sum(list_transform({TOKS_D}, x -> length(x))) AS DOUBLE)
                                / len({TOKS_D}) ELSE 0.0 END AS mwl,
                      CASE WHEN len({TOKS_D}) > 0
                           THEN CAST(len(list_distinct({TOKS_D})) AS DOUBLE)
                                / len({TOKS_D}) ELSE 0.0 END AS ttr,
                      {_predicted('duck')} AS pred,
                      n_chars
               FROM documents),
         v AS (SELECT {_funnel_verdict('duck')} AS verdict, n_chars FROM m)
    SELECT verdict,
           COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           ROUND(CAST(COUNT(*) AS DOUBLE)
                 / SUM(COUNT(*)) OVER (), 6) AS share
    FROM v GROUP BY verdict
    """,
    tags=("curation:quality", "agg"),
)
def c_quality_funnel(spark, sf_dir) -> DataFrame:
    """First-failed-rule rejection accounting for the five-rule quality
    cascade (length floor/ceiling, mean word length band, type-token
    ratio floor, langid agreement). Single codegen'd scan pass + a ≤6-row
    aggregate; see the cascade notes above."""
    from pyspark.sql import Window

    docs = fan_out(load_table(spark, sf_dir, "documents"))
    m = docs.selectExpr(
        "lang",
        "n_chars",
        f"size({TOKS_S}) AS n_toks",
        f"""CASE WHEN size({TOKS_S}) > 0
             THEN CAST(aggregate({TOKS_S}, 0L, (acc, x) -> acc + length(x)) AS DOUBLE)
                  / size({TOKS_S}) ELSE 0.0 END AS mwl""",
        f"""CASE WHEN size({TOKS_S}) > 0
             THEN CAST(size(array_distinct({TOKS_S})) AS DOUBLE)
                  / size({TOKS_S}) ELSE 0.0 END AS ttr""",
        f"{_predicted('spark')} AS pred",
    )
    agg = (
        m.selectExpr(f"{_funnel_verdict('spark')} AS verdict", "n_chars")
        .groupBy("verdict")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").cast("long").alias("total_chars"),
        )
    )
    total = F.sum("n_docs").over(Window.partitionBy())
    return agg.withColumn(
        "share", F.round(F.col("n_docs").cast("double") / total, 6)
    )


# --------------------------------------------------------------------------
# Deterministic per-epoch shuffle: training runs need a DIFFERENT document
# order each epoch that is nonetheless REPRODUCIBLE across runs, engines,
# and restarts — df.sample()/orderBy(rand()) give neither. Ordering by the
# two-round multiplicative hash of (epoch-offset + doc_id) gives every
# epoch an independent well-mixed permutation as a pure function of
# (epoch, doc_id).
#
# Scale design (100 TB): the permutation RANK is a global sort — the one
# operation a training-data exporter genuinely pays (range-partitioned
# TakeOrdered / sort for the shard writer); everything upstream is
# scan-side hash arithmetic. The graded query keeps k small (top-20 per
# epoch) so the plan is the TakeOrderedAndProject shape, not a full sort;
# the full-shard export form is the same expression feeding
# repartitionByRange(epoch, shuffle_key).

_EPOCHS = 3
_SHUFFLE_TOP = 20


@query(
    "c_epoch_shuffle",
    oracle=f"""
    WITH e AS (SELECT unnest(generate_series(1, {_EPOCHS})) AS epoch),
         keyed AS (SELECT epoch, doc_id,
                          {_hash_expr(f'(epoch * 1000003 + doc_id)')} AS shuffle_key
                   FROM e CROSS JOIN documents)
    SELECT epoch, doc_id, shuffle_key,
           row_number() OVER (PARTITION BY epoch
                              ORDER BY shuffle_key, doc_id) AS rank
    FROM keyed
    QUALIFY rank <= {_SHUFFLE_TOP}
    """,
    tags=("curation:shuffle", "window"),
)
def c_epoch_shuffle(spark, sf_dir) -> DataFrame:
    """First 20 documents of each epoch's deterministic permutation —
    the reproducible-reshuffle contract graded directly (same doc must
    land at the same rank in both engines, different ranks across
    epochs)."""
    from pyspark.sql import Window

    docs = fan_out(load_table(spark, sf_dir, "documents"))
    epochs = spark.range(1, _EPOCHS + 1).selectExpr("id AS epoch")
    keyed = epochs.crossJoin(docs.select("doc_id")).selectExpr(
        "epoch",
        "doc_id",
        f"{_hash_expr('(epoch * 1000003 + doc_id)')} AS shuffle_key",
    )
    w = Window.partitionBy("epoch").orderBy("shuffle_key", "doc_id")
    return (
        keyed.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= _SHUFFLE_TOP)
    )


# --------------------------------------------------------------------------
# The END-TO-END corpus build (VERDICT r12 task 6): every stage of the
# training-data pipeline — benchmark holdout, the five-rule quality
# funnel, exact dedup, decontamination against the persisted benchmark
# gram store, token-budget sequence packing — composed into ONE connected
# DataFrame plan over `documents`. No intermediate action runs between
# stages (the only materialized state is the day-1 benchmark store the
# decontamination tier already owns); Catalyst sees the whole pipeline,
# so column pruning and filter placement cross stage boundaries exactly
# as they would in the production job. At 100 TB the shape is: one
# codegen'd scan pass (funnel metrics), one hash shuffle (md5 dedup
# window — dup groups are small so the window partitions are bounded),
# one gram equi-join against the store (AQE sizes it), one window shuffle
# per (lang, shard) packing domain, one final agg.

# a survivor sharing >= this many distinct-position 4-grams with any
# benchmark doc is dropped as contaminated (absolute-count gate: scale-
# free, no per-doc n_ngrams recompute alongside the explode)
DECON_MIN_HITS = 4


@query(
    "c_corpus_build",
    # staged CTEs of the existing stage oracles: funnel verdict
    # (c_quality_funnel), min-doc_id-per-md5 dedup (c_curated_corpus),
    # gram-hit gate (t_decontaminate's join, absolute-count form),
    # prefix-sum packing (c_pack_sequences)
    oracle=f"""
    WITH m AS (
      SELECT doc_id, lang, text,
             len({TOKS_D}) AS n_toks,
             CASE WHEN len({TOKS_D}) > 0
                  THEN CAST(list_sum(list_transform({TOKS_D}, x -> length(x))) AS DOUBLE)
                       / len({TOKS_D}) ELSE 0.0 END AS mwl,
             CASE WHEN len({TOKS_D}) > 0
                  THEN CAST(len(list_distinct({TOKS_D})) AS DOUBLE)
                       / len({TOKS_D}) ELSE 0.0 END AS ttr,
             {_predicted('duck')} AS pred
      FROM documents WHERE doc_id % 20 <> 0
    ),
    p AS (SELECT doc_id, lang, text FROM m
          WHERE {_funnel_verdict('duck')} = 'pass'),
    d AS (SELECT doc_id, lang, text FROM (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY md5(text)
                                         ORDER BY doc_id) AS rn
            FROM p) WHERE rn = 1),
    bench AS (
      SELECT DISTINCT unnest({NGRAM4_D}) AS g
      FROM documents WHERE doc_id % 20 = 0
    ),
    tr AS (SELECT doc_id, unnest({NGRAM4_D}) AS g FROM d),
    contaminated AS (
      SELECT doc_id FROM tr JOIN bench USING (g)
      GROUP BY doc_id HAVING COUNT(*) >= {DECON_MIN_HITS}
    ),
    clean AS (SELECT * FROM d
              WHERE doc_id NOT IN (SELECT doc_id FROM contaminated)),
    toks AS (
      SELECT doc_id, lang,
             {_hash2_expr('doc_id')} % {PACK_SHARDS} AS shard,
             len({TOKS_D}) AS n_tokens
      FROM clean
    ),
    packed AS (
      SELECT lang, shard, n_tokens,
             COALESCE(SUM(n_tokens) OVER (
               PARTITION BY lang, shard ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
             // {PACK_BUDGET} AS bin_id
      FROM toks
    )
    SELECT lang, shard, CAST(bin_id AS BIGINT) AS bin_id,
           COUNT(*) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS bin_tokens
    FROM packed
    GROUP BY lang, shard, bin_id
    """,
    tags=("curation:corpus-build", "pipeline", "window", "snapshot-table"),
)
def c_corpus_build(spark, sf_dir) -> DataFrame:
    """The composed corpus build: benchmark holdout (doc_id % 20) →
    quality funnel (keep 'pass') → exact dedup (min doc_id per
    md5(text)) → decontamination gate (drop docs sharing >=
    DECON_MIN_HITS 4-grams with the persisted benchmark store) →
    sequence packing — one connected plan, per-bin stats out."""
    from pyspark.sql import Window

    from ..tables import SnapshotTable
    from .textops import NGRAM4_S, _benchmark_store_for

    store = SnapshotTable(spark, _benchmark_store_for(spark, sf_dir))
    docs = fan_out(load_table(spark, sf_dir, "documents")).filter(
        "doc_id % 20 != 0"
    )
    m = docs.selectExpr(
        "doc_id",
        "lang",
        "text",
        f"size({TOKS_S}) AS n_toks",
        f"""CASE WHEN size({TOKS_S}) > 0
             THEN CAST(aggregate({TOKS_S}, 0L, (acc, x) -> acc + length(x)) AS DOUBLE)
                  / size({TOKS_S}) ELSE 0.0 END AS mwl""",
        f"""CASE WHEN size({TOKS_S}) > 0
             THEN CAST(size(array_distinct({TOKS_S})) AS DOUBLE)
                  / size({TOKS_S}) ELSE 0.0 END AS ttr""",
        f"{_predicted('spark')} AS pred",
    )
    passed = m.filter(
        F.expr(f"{_funnel_verdict('spark')} = 'pass'")
    ).select("doc_id", "lang", "text")
    w = Window.partitionBy(F.md5("text")).orderBy("doc_id")
    deduped = (
        passed.withColumn("rn", F.row_number().over(w)).filter("rn = 1").drop("rn")
    )
    # gram gate: NGRAM4_S evaluates once per input row inside the
    # Generate; the drop set is an aggregate over matched grams only
    train = deduped.selectExpr("doc_id", f"explode({NGRAM4_S}) AS g")
    contaminated = (
        train.join(store.scan(), "g")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_hits"))
        .filter(F.col("n_hits") >= DECON_MIN_HITS)
        .select("doc_id")
    )
    clean = deduped.join(contaminated, "doc_id", "left_anti")
    toks = clean.selectExpr(
        "doc_id",
        "lang",
        f"{_hash2_expr('doc_id')} % {PACK_SHARDS} AS shard",
        f"CAST(size({TOKS_S}) AS BIGINT) AS n_tokens",
    )
    w2 = (
        Window.partitionBy("lang", "shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    packed = toks.withColumn(
        "bin_id",
        (F.coalesce(F.sum("n_tokens").over(w2), F.lit(0)) / F.lit(PACK_BUDGET))
        .cast("bigint"),
    )
    return packed.groupBy("lang", "shard", "bin_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("bin_tokens"),
    )
