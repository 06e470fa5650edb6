"""Similarity search over the `embeddings` table (north-star extension).

Three tiers, all exact-decimal dot products (see functions/exact.py for
why that is bit-identical to the DuckDB oracle):

- `s_cosine_topk` — brute-force top-k: the correctness baseline. The
  Spark plan is matmul-as-join: posexplode once → equi-join on position →
  partial-agg dot products. Scales as |Q|·|N| but distributes perfectly
  (shuffle keys are (pos) then (qid, vid)); at 100 TB you bound |Q| or
  move to the bucketed variants below.
- `s_lsh_topk` — random-hyperplane-style LSH, deterministically derived
  from sign bits of 8 fixed dimensions: query only compares within its
  bucket. The scale path: the candidate join is an equi-join on
  `bucket`, so cost is Σ bucket²  ≪ n².
- `s_ivf_topk` — IVF-style: `label` is the cluster id (a real IVF would
  k-means; the routing/search structure is identical): assign each query
  to its own partition's centroid list, search only that partition.

A vectorized Pandas-UDF fast path (float64, not oracle-exact) is in
operators/similarity_fast.py and benchmarked separately.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from ..catalog import load_table, fan_out
from .registry import query

TOPK = 10
QUERY_FILTER = "vec_id % 100 = 0"  # deterministic query subset

_DOT_D = (
    "CAST(list_sum(list_transform(list_zip({a}, {b}), "
    "p -> CAST(CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE) AS DECIMAL(38,12)))) AS DOUBLE)"
)

# sign-bit bucket over 8 fixed dims (1-based in both engines)
_BUCKET_S = "concat(" + ", ".join(
    f"CASE WHEN element_at(embedding, {i}) >= 0 THEN '1' ELSE '0' END" for i in range(1, 9)
) + ")"
_BUCKET_D = "concat(" + ", ".join(
    f"CASE WHEN embedding[{i}] >= 0 THEN '1' ELSE '0' END" for i in range(1, 9)
) + ")"


def _flat_norms(emb):
    """(vec_id, pos, v) positional explode + per-vector L2 norms."""
    flat = emb.select("vec_id", F.posexplode("embedding").alias("pos", "v")).withColumn(
        "v", F.col("v").cast("double")
    )
    nrm = (
        flat.groupBy("vec_id")
        .agg(F.sum((F.col("v") * F.col("v")).cast("decimal(38,12)")).cast("double").alias("sq"))
        .selectExpr("vec_id", "sqrt(sq) AS nrm")
    )
    return flat, nrm


def _topk_join(queries_flat, cand_flat, nrm, extra_keys=()):
    """Exact cosine top-k: join on position, decimal-sum dots, rank."""
    q = queries_flat.selectExpr("vec_id AS q_id", "pos", "v AS qv", *extra_keys)
    c = cand_flat.selectExpr("vec_id AS c_id", "pos", "v AS cv", *extra_keys)
    on = ["pos", *extra_keys]
    dots = (
        q.join(c, on)
        .filter(F.col("q_id") != F.col("c_id"))
        .groupBy("q_id", "c_id")
        .agg(F.sum((F.col("qv") * F.col("cv")).cast("decimal(38,12)")).cast("double").alias("dot"))
    )
    scored = (
        dots.join(F.broadcast(nrm.selectExpr("vec_id AS q_id", "nrm AS q_nrm")), "q_id")
        .join(F.broadcast(nrm.selectExpr("vec_id AS c_id", "nrm AS c_nrm")), "c_id")
        .withColumn("cosine", F.col("dot") / (F.col("q_nrm") * F.col("c_nrm")))
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cosine").desc(), F.col("c_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= TOPK)
        .select("q_id", "c_id", "cosine", "rank")
    )


# --------------------------------------------------------------------------
@query(
    "s_cosine_topk",
    oracle=f"""
    WITH n AS (SELECT vec_id, embedding AS e,
                      sqrt({_DOT_D.format(a='embedding', b='embedding')}) AS nrm
               FROM embeddings),
         scored AS (
           SELECT q.vec_id AS q_id, c.vec_id AS c_id,
                  {_DOT_D.format(a='q.e', b='c.e')} / (q.nrm * c.nrm) AS cosine
           FROM n q JOIN n c ON q.vec_id % 100 = 0 AND q.vec_id <> c.vec_id)
    SELECT q_id, c_id, cosine,
           row_number() OVER (PARTITION BY q_id ORDER BY cosine DESC, c_id) AS rank
    FROM scored
    QUALIFY rank <= {TOPK}
    """,
    tags=("similarity:brute-force", "topk"),
)
def s_cosine_topk(spark, sf_dir) -> DataFrame:
    emb = fan_out(load_table(spark, sf_dir, "embeddings"))
    flat, nrm = _flat_norms(emb)
    qf = flat.filter(F.expr(QUERY_FILTER))
    return _topk_join(qf, flat, nrm)


# --------------------------------------------------------------------------
@query(
    "s_lsh_topk",
    oracle=f"""
    WITH n AS (SELECT vec_id, embedding AS e, {_BUCKET_D} AS bucket,
                      sqrt({_DOT_D.format(a='embedding', b='embedding')}) AS nrm
               FROM embeddings),
         scored AS (
           SELECT q.vec_id AS q_id, c.vec_id AS c_id, q.bucket,
                  {_DOT_D.format(a='q.e', b='c.e')} / (q.nrm * c.nrm) AS cosine
           FROM n q JOIN n c ON q.bucket = c.bucket
                 AND q.vec_id % 100 = 0 AND q.vec_id <> c.vec_id)
    SELECT q_id, c_id, bucket, cosine,
           row_number() OVER (PARTITION BY q_id ORDER BY cosine DESC, c_id) AS rank
    FROM scored
    QUALIFY rank <= {TOPK}
    """,
    tags=("similarity:lsh", "topk"),
)
def s_lsh_topk(spark, sf_dir) -> DataFrame:
    emb = fan_out(load_table(spark, sf_dir, "embeddings")).withColumn("bucket", F.expr(_BUCKET_S))
    flat = emb.select("vec_id", "bucket", F.posexplode("embedding").alias("pos", "v")).withColumn(
        "v", F.col("v").cast("double")
    )
    nrm = (
        flat.groupBy("vec_id")
        .agg(F.sum((F.col("v") * F.col("v")).cast("decimal(38,12)")).cast("double").alias("sq"))
        .selectExpr("vec_id", "sqrt(sq) AS nrm")
    )
    q = flat.filter(F.expr(QUERY_FILTER)).selectExpr("vec_id AS q_id", "bucket", "pos", "v AS qv")
    c = flat.selectExpr("vec_id AS c_id", "bucket", "pos", "v AS cv")
    dots = (
        q.join(c, ["bucket", "pos"])
        .filter(F.col("q_id") != F.col("c_id"))
        .groupBy("q_id", "c_id", "bucket")
        .agg(F.sum((F.col("qv") * F.col("cv")).cast("decimal(38,12)")).cast("double").alias("dot"))
    )
    scored = (
        dots.join(F.broadcast(nrm.selectExpr("vec_id AS q_id", "nrm AS q_nrm")), "q_id")
        .join(F.broadcast(nrm.selectExpr("vec_id AS c_id", "nrm AS c_nrm")), "c_id")
        .withColumn("cosine", F.col("dot") / (F.col("q_nrm") * F.col("c_nrm")))
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cosine").desc(), F.col("c_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= TOPK)
        .select("q_id", "c_id", "bucket", "cosine", "rank")
    )


# --------------------------------------------------------------------------
@query(
    "s_ivf_topk",
    oracle=f"""
    WITH n AS (SELECT vec_id, label, embedding AS e,
                      sqrt({_DOT_D.format(a='embedding', b='embedding')}) AS nrm
               FROM embeddings),
         scored AS (
           SELECT q.vec_id AS q_id, c.vec_id AS c_id, q.label,
                  {_DOT_D.format(a='q.e', b='c.e')} / (q.nrm * c.nrm) AS cosine
           FROM n q JOIN n c ON q.label = c.label
                 AND q.vec_id % 100 = 0 AND q.vec_id <> c.vec_id)
    SELECT q_id, c_id, label, cosine,
           row_number() OVER (PARTITION BY q_id ORDER BY cosine DESC, c_id) AS rank
    FROM scored
    QUALIFY rank <= {TOPK}
    """,
    tags=("similarity:ivf", "topk"),
)
def s_ivf_topk(spark, sf_dir) -> DataFrame:
    emb = fan_out(load_table(spark, sf_dir, "embeddings"))
    flat = emb.select("vec_id", "label", F.posexplode("embedding").alias("pos", "v")).withColumn(
        "v", F.col("v").cast("double")
    )
    nrm = (
        flat.groupBy("vec_id")
        .agg(F.sum((F.col("v") * F.col("v")).cast("decimal(38,12)")).cast("double").alias("sq"))
        .selectExpr("vec_id", "sqrt(sq) AS nrm")
    )
    q = flat.filter(F.expr(QUERY_FILTER)).selectExpr("vec_id AS q_id", "label", "pos", "v AS qv")
    c = flat.selectExpr("vec_id AS c_id", "label", "pos", "v AS cv")
    dots = (
        q.join(c, ["label", "pos"])
        .filter(F.col("q_id") != F.col("c_id"))
        .groupBy("q_id", "c_id", "label")
        .agg(F.sum((F.col("qv") * F.col("cv")).cast("decimal(38,12)")).cast("double").alias("dot"))
    )
    scored = (
        dots.join(F.broadcast(nrm.selectExpr("vec_id AS q_id", "nrm AS q_nrm")), "q_id")
        .join(F.broadcast(nrm.selectExpr("vec_id AS c_id", "nrm AS c_nrm")), "c_id")
        .withColumn("cosine", F.col("dot") / (F.col("q_nrm") * F.col("c_nrm")))
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cosine").desc(), F.col("c_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= TOPK)
        .select("q_id", "c_id", "label", "cosine", "rank")
    )
