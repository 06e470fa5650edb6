"""Similarity search over the `embeddings` table (north-star extension).

Three tiers, all exact-decimal dot products (see functions/exact.py for
why that is bit-identical to the DuckDB oracle):

- `s_cosine_topk` — brute-force top-k: the correctness baseline.
- `s_lsh_topk` — random-hyperplane-style LSH, deterministically derived
  from sign bits of 8 fixed dimensions: a query only compares within its
  bucket, so cost is Σ bucket² ≪ n².
- `s_ivf_topk` — IVF-style: `label` is the cluster id (a real IVF would
  k-means; the routing/search structure is identical).

Plan shape (the 100 TB story): the QUERY set is broadcast and the
CANDIDATE corpus streams through the join — no corpus shuffle, cost is one
scan of the corpus regardless of its size. The query set is BOUNDED
(fixed id list, constant size at any corpus scale) so the broadcast side
cannot grow with the corpus. Dot products run per-pair via
zip_with/aggregate (JVM-side array lambdas), not a posexplode position
join (which would shuffle |corpus|·d rows). Ranking is a per-query
window over the scored candidates — partial top-k could push into the
scan with an `applyInPandas` per-bucket heap if k·|Q| ever dominates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from ..catalog import load_table, fan_out
from ..functions import sdot, odot
from .registry import query

TOPK = 10
# Deterministic FIXED-SIZE query set: 5 ids present at every SF (ids are
# dense from 0). A corpus-relative predicate (plain `% 100`) would grow the
# broadcast side linearly with the corpus; this stays 5 rows at 100 TB.
QUERY_FILTER = "vec_id % 100 = 0 AND vec_id < 500"

# sign-bit bucket over 8 fixed dims (1-based in both engines)
_BUCKET_S = "concat(" + ", ".join(
    f"CASE WHEN element_at(embedding, {i}) >= 0 THEN '1' ELSE '0' END" for i in range(1, 9)
) + ")"
_BUCKET_D = "concat(" + ", ".join(
    f"CASE WHEN embedding[{i}] >= 0 THEN '1' ELSE '0' END" for i in range(1, 9)
) + ")"


def _normed(spark, sf_dir, extra_exprs: tuple[str, ...] = ()) -> DataFrame:
    """(vec_id, e, nrm, *extras) with exact-decimal L2 norms."""
    emb = fan_out(load_table(spark, sf_dir, "embeddings"))
    return emb.selectExpr(
        "vec_id",
        "embedding AS e",
        f"sqrt({sdot('embedding', 'embedding')}) AS nrm",
        *extra_exprs,
    )


def _topk_pairs(n: DataFrame, bucket_col: str | None) -> DataFrame:
    """Broadcast the query subset against the candidate stream, score with
    the exact dot, rank per query."""
    extra = [bucket_col] if bucket_col else []
    q = n.filter(F.expr(QUERY_FILTER)).selectExpr(
        "vec_id AS q_id", "e AS qe", "nrm AS q_nrm", *extra
    )
    c = n.selectExpr("vec_id AS c_id", "e AS ce", "nrm AS c_nrm", *extra)
    cond = F.col("q_id") != F.col("c_id")
    joined = (
        c.join(F.broadcast(q.withColumnRenamed(bucket_col, "__qb")), F.col(bucket_col) == F.col("__qb"))
        if bucket_col
        else c.join(F.broadcast(q), F.lit(True))
    )
    scored = (
        joined.filter(cond)
        .withColumn("cosine", F.expr(sdot("qe", "ce")) / (F.col("q_nrm") * F.col("c_nrm")))
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cosine").desc(), F.col("c_id"))
    out_extra = [bucket_col] if bucket_col else []
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= TOPK)
        .select("q_id", "c_id", *out_extra, "cosine", "rank")
    )


# --------------------------------------------------------------------------
@query(
    "s_cosine_topk",
    oracle=f"""
    WITH n AS (SELECT vec_id, embedding AS e,
                      sqrt({odot('embedding', 'embedding')}) AS nrm
               FROM embeddings),
         scored AS (
           SELECT q.vec_id AS q_id, c.vec_id AS c_id,
                  {odot('q.e', 'c.e')} / (q.nrm * c.nrm) AS cosine
           FROM n q JOIN n c ON q.vec_id % 100 = 0 AND q.vec_id < 500 AND q.vec_id <> c.vec_id)
    SELECT q_id, c_id, cosine,
           row_number() OVER (PARTITION BY q_id ORDER BY cosine DESC, c_id) AS rank
    FROM scored
    QUALIFY rank <= {TOPK}
    """,
    tags=("similarity:brute-force", "topk"),
)
def s_cosine_topk(spark, sf_dir) -> DataFrame:
    return _topk_pairs(_normed(spark, sf_dir), bucket_col=None)


# --------------------------------------------------------------------------
@query(
    "s_lsh_topk",
    oracle=f"""
    WITH n AS (SELECT vec_id, embedding AS e, {_BUCKET_D} AS bucket,
                      sqrt({odot('embedding', 'embedding')}) AS nrm
               FROM embeddings),
         scored AS (
           SELECT q.vec_id AS q_id, c.vec_id AS c_id, q.bucket,
                  {odot('q.e', 'c.e')} / (q.nrm * c.nrm) AS cosine
           FROM n q JOIN n c ON q.bucket = c.bucket
                 AND q.vec_id % 100 = 0 AND q.vec_id < 500 AND q.vec_id <> c.vec_id)
    SELECT q_id, c_id, bucket, cosine,
           row_number() OVER (PARTITION BY q_id ORDER BY cosine DESC, c_id) AS rank
    FROM scored
    QUALIFY rank <= {TOPK}
    """,
    tags=("similarity:lsh", "topk"),
)
def s_lsh_topk(spark, sf_dir) -> DataFrame:
    n = _normed(spark, sf_dir, (f"{_BUCKET_S} AS bucket",))
    return _topk_pairs(n, bucket_col="bucket")


# --------------------------------------------------------------------------
@query(
    "s_ivf_topk",
    oracle=f"""
    WITH n AS (SELECT vec_id, label, embedding AS e,
                      sqrt({odot('embedding', 'embedding')}) AS nrm
               FROM embeddings),
         scored AS (
           SELECT q.vec_id AS q_id, c.vec_id AS c_id, q.label,
                  {odot('q.e', 'c.e')} / (q.nrm * c.nrm) AS cosine
           FROM n q JOIN n c ON q.label = c.label
                 AND q.vec_id % 100 = 0 AND q.vec_id < 500 AND q.vec_id <> c.vec_id)
    SELECT q_id, c_id, label, cosine,
           row_number() OVER (PARTITION BY q_id ORDER BY cosine DESC, c_id) AS rank
    FROM scored
    QUALIFY rank <= {TOPK}
    """,
    tags=("similarity:ivf", "topk"),
)
def s_ivf_topk(spark, sf_dir) -> DataFrame:
    n = _normed(spark, sf_dir, ("label",))
    return _topk_pairs(n, bucket_col="label")
