"""Query registry: every operator from SURVEY.md §2 (and the north-star
extensions) is registered here as a (Spark plan, DuckDB oracle SQL) pair.

`__spark_entry__.queries()` / `oracle_sql()` are thin views over this.
"""

from __future__ import annotations

import importlib
from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

_MODULES = [
    "dedup",
    "similarity",
    "bucketed",
    "multimodal",
    "temporal",
    "profiling",
    "curation",
    "tablemeta",
    "dsv2q",
    "tpch",
    "events",
    "textops",
    "streamingq",
]

# Registration order matters to external harnesses that check a bounded
# 50-name prefix of the registry per round. The prefix below rotates the
# verification window each round so every query gets a fresh correctness
# row at least every other round: r01 covered tpch/events/textops, r02
# front-loaded the extension surface, r03 covered tablemeta + the r01-only
# names, r04 covered event-time + the r04-new operators, r05 covered the
# 45 names outside r04's window + 5 result-touched names, r09 covered the
# round-9 additions + the r05-aged overflow + the r09 code-touched names,
# r10 covered the r10 additions + the 44 r06-stale names, r13 covered the
# r15 rotation (per the r14 verdict's task 6): leads with (a) the 5
# queries NEW or code-touched this round (q_ntile_deciles — the
# range-rank NTILE rewrite; the cluster streaming twins + semantic
# retraction pair touched by the fixed-cost/compaction tasks), then
# (b) ALL 15 r10-stale names (the union freshness floor — after this
# window the floor rises to r11), then (c) the first 30 of the 47-name
# r11 cohort, oldest-first alphabetical. 5 + 15 + 30 = 50; the remaining
# 17 r11 names spill just below the window and driver-sign at r16.
_PREFIX_ORDER = [
    # (a) r15 new/touched — includes every query whose EXECUTION PATH the
    # r15 fold fast-paths / _microbatch_confs rewrote (their r14
    # signatures predate the change and are stale)
    "q_ntile_deciles",
    "q_stream_cluster_cdc",
    "q_stream_cluster_maintain",
    "s_incremental_semdedup_retract",
    "s_incremental_semdedup",
    "d_incremental_clusters",
    "d_incremental_cluster_retract",
    "q_stream_cdc_store",
    "q_stream_incremental_dedup",
    # (b) the full r10-stale cohort — union freshness floor clears to r11
    "q_meta_rollback",
    "q_meta_snapshots",
    "q_retention_cohorts",
    "q_stream_join",
    "q_stream_sessionize",
    "q_table_counts",
    "s_quantized_topk",
    "s_semdedup",
    "s_topic_clusters",
    "t_boilerplate",
    "t_hashed_classifier",
    "t_langid_confusion",
    "t_quality_score",
    "t_tfidf_keywords",
    "t_token_stats",
    # (c) r11 cohort, first 30 oldest-first alphabetical
    "c_curated_corpus",
    "c_dup_groups",
    "c_mix_corpora",
    "c_stratified_sample",
    "m_extract_features",
    "m_frame_sample",
    "m_modality_stats",
    "m_resize_plan",
    "q_asof_join",
    "q_bucketed_join",
    "q_event_windows",
    "q_latest_event",
    "q_meta_bounds",
    "q_meta_bucket",
    "q_meta_cherrypick",
    "q_meta_compaction",
    "q_meta_expire",
    "q_meta_expire_age",
    "q_meta_files",
    "q_meta_hidden",
    "q_meta_iceberg",
    "q_meta_metadata_log_reloc",
    "q_meta_multispec",
    "q_meta_name_mapping",
    "q_meta_partitions",
    "q_meta_pruning",
    # --- below the 50-slot window: the remaining r11 names
    # (driver-sign at r16), oldest-first alphabetical — the last four of
    # the original r11 fill (q_meta_snapshot_summary, q_meta_v2_travel,
    # q_part_revenue_share, q_range_join) moved here to make room for the
    # four r15-code-touched re-signs above; union floor stays r11
    "q_meta_snapshot_summary",
    "q_meta_v2_travel",
    "q_part_revenue_share",
    "q_range_join",
    "q_rollup_revenue",
    "q_semi_anti",
    "q_sessionization",
    "q_set_ops",
    "q_sketch_distinct",
    "q_sql_ctas",
    "q_stream_cdc",
    "q_top_customers",
    "q_trailing_window",
    "s_dup_clusters",
    "s_knn_graph",
    "t_bpe_tokens",
    "t_decontaminate",
    "t_fingerprint",
    "t_lang_profile",
    "t_scrub_pii",
    "t_token_freq",
]

_REGISTRY: dict[str, "QuerySpec"] = {}


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # DuckDB-runnable ANSI SQL twin; None → rows-only check
    tags: tuple[str, ...] = ()
    bench: bool = True  # include in bench.py headline run


def query(name: str, oracle: str | None = None, tags: tuple[str, ...] = (), bench: bool = True):
    def deco(fn):
        _REGISTRY[name] = QuerySpec(name, fn, oracle, tuple(tags), bench)
        return fn

    return deco


def registry() -> dict[str, QuerySpec]:
    for m in _MODULES:
        importlib.import_module(f"{__package__}.{m}")
    ordered: dict[str, QuerySpec] = {}
    for name in _PREFIX_ORDER:
        if name in _REGISTRY:
            ordered[name] = _REGISTRY[name]
    for name, spec in _REGISTRY.items():
        ordered.setdefault(name, spec)
    return ordered
