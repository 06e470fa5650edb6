"""Core relational operators generalized from the reference pipeline.

- `dedup_latest`: W1 window dedup (`bronze-silver.py:252-261`), corrected to
  partition by the FULL business key (SURVEY.md §2.5 notes the reference
  partitions by `invoiceid` only while merging on `(invoiceid, itemid)` —
  we default to the full key; pass a narrower key for bit-parity).
- `merge_upsert`: J1 MERGE INTO emulation (`bronze-silver.py:249-285`)
  without the Iceberg runtime: latest-wins upsert of `source` into
  `target` expressed as a full-outer join + coalesce. Optionally applies
  CDC deletes (`Op = 'D'`), the branch the reference generates data for
  but never executes (SURVEY.md §2.11 C6).
- `top_k`: O1 ordered limit (`bronze-silver.py:133-138`) — Spark plans
  this as TakeOrderedAndProject (no global sort materialization).

Scale notes (100 TB):
- `dedup_latest` is a single hash-shuffle on the key; skewed keys are
  handled by AQE skew-join/partition splitting. For a 1000-executor run,
  ensure the key has enough cardinality or pre-salt upstream.
- `merge_upsert` shuffles both sides on the merge key. If `source` is a
  small incremental batch (the common CDC case), pass
  `broadcast_source=True` to turn the full-outer into a broadcast-able
  plan is NOT possible (full-outer can't broadcast); instead Spark picks
  sort-merge — the right call when target is huge. Iceberg/Delta MOR would
  write delete files instead of rewriting; our versioned-parquet tables
  (tables.py) rewrite — COW semantics, same observable states.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def dedup_latest(
    df: DataFrame,
    keys: Sequence[str],
    order_by: Sequence,
) -> DataFrame:
    """Keep the single latest row per `keys`, ordered by `order_by` columns
    (pass Columns like F.col('ts').desc(); include a unique tiebreaker for
    determinism)."""
    w = Window.partitionBy(*keys).orderBy(*order_by)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def merge_upsert(
    target: DataFrame,
    source: DataFrame,
    keys: Sequence[str],
    action_col: str | None = None,
    op_col: str | None = None,
    delete_value: str = "D",
) -> DataFrame:
    """MERGE INTO emulation: source rows override matched target rows
    (WHEN MATCHED THEN UPDATE), unmatched source rows are inserted
    (WHEN NOT MATCHED THEN INSERT), unmatched target rows are kept.

    `source` must be pre-deduplicated to one row per key (reference
    requirement for Iceberg MERGE; use `dedup_latest`).
    If `op_col` is given, source rows whose op equals `delete_value` delete
    the matched target row (WHEN MATCHED AND op='D' THEN DELETE).
    If `action_col` is given, adds a column with 'update'/'insert'/'keep'
    (or 'delete' rows are simply absent).
    """
    value_cols = [c for c in target.columns if c not in keys]
    src_value_cols = [c for c in source.columns if c not in keys]
    s = source.select(
        *[F.col(k) for k in keys],
        *[F.col(c).alias(f"__src_{c}") for c in src_value_cols],
        F.lit(True).alias("__in_src"),
    )
    t = target.withColumn("__in_tgt", F.lit(True))
    j = t.join(s, on=list(keys), how="full_outer")

    if op_col is not None:
        j = j.filter(
            ~(F.coalesce(F.col(f"__src_{op_col}"), F.lit("")) == F.lit(delete_value))
        )

    out_cols = [F.col(k) for k in keys]
    for c in value_cols:
        if c in src_value_cols:
            # Gate on row PRESENCE (__in_src), not value nullness: Iceberg's
            # WHEN MATCHED THEN UPDATE SET t.c = s.c overwrites with NULL
            # when the source legitimately carries NULL (e.g. a CDC update
            # clearing a nullable column). coalesce(src, tgt) would silently
            # keep the stale target value in that case.
            out_cols.append(
                F.when(F.col("__in_src").isNotNull(), F.col(f"__src_{c}"))
                .otherwise(F.col(c))
                .alias(c)
            )
        else:
            out_cols.append(F.col(c))
    if action_col is not None:
        out_cols.append(
            F.when(F.col("__in_src").isNotNull() & F.col("__in_tgt").isNotNull(), "update")
            .when(F.col("__in_tgt").isNull(), "insert")
            .otherwise("keep")
            .alias(action_col)
        )
    return j.select(*out_cols)


def top_k(df: DataFrame, order_by: Sequence, k: int) -> DataFrame:
    """Ordered limit → TakeOrderedAndProject (per-partition top-k + driver
    merge; no full sort, no single-partition shuffle)."""
    return df.orderBy(*order_by).limit(k)


_SALTED_SAFE_HOW = {
    "inner", "left", "left_outer", "leftouter",
    "left_semi", "leftsemi", "semi",
    "left_anti", "leftanti", "anti", "cross",
}


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    keys: Sequence[str],
    how: str = "inner",
    salt: int = 16,
) -> DataFrame:
    """Equi-join resilient to hot keys: spreads each skewed-side key across
    `salt` sub-partitions and replicates the other side `salt`× so every
    sub-partition can complete the join locally.

    AQE's skew-join splitting (enabled in session.py) handles most cases at
    runtime; use this when skew is known ahead of time (power-law user_id,
    null-heavy keys) or when AQE is unavailable (streaming joins). The
    salt column is derived from spark_partition_id + a per-row counter.
    Cost: `other` inflates salt× (keep it the smaller side).

    Only skewed-side-preserving joins are supported: because `other` is
    replicated salt×, a right/full outer join would emit salt× duplicates
    for each unmatched `other` key. `how` is validated against
    inner/left/semi/anti; right/full raise.
    """
    if how not in _SALTED_SAFE_HOW:
        raise ValueError(
            f"salted_join: how={how!r} is not skewed-side-preserving; the "
            f"replicated side would duplicate unmatched rows. Allowed: "
            f"{sorted(_SALTED_SAFE_HOW)}"
        )
    skw = skewed.withColumn(
        "__salt",
        F.pmod(
            F.spark_partition_id().cast("long") * 1_000_003 + F.monotonically_increasing_id(),
            F.lit(salt),
        ).cast("int"),
    )
    oth = other.withColumn("__salt", F.explode(F.array(*[F.lit(i) for i in range(salt)])))
    return skw.join(oth, [*keys, "__salt"], how).drop("__salt")
