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
# r12-late + r13-new/touched names + 40 r09-stale names.
#
# r14 rotation (per the r13 verdict's task 3): leads with (a) the one
# never-driver-signed query (q_stream_cluster_maintain, r13-late,
# judge-verified at both SFs) and the two r09-stale spillovers
# (t_heavy_hitters, t_repetition), then (b) the 3 queries NEW this round
# (d_incremental_simhash_retract / s_incremental_semdedup_retract — the
# retraction twins closing VERDICT r13 task 5 — and the late addition
# q_stream_cluster_cdc, the I/U/D lifecycle through the label tier),
# then (c) the 14 names
# whose CODE changed this round (the cluster-fold restructure + AQE-off
# fix: d_incremental_clusters, d_incremental_cluster_retract; the
# single-load ANALYZE: q_meta_analyze; the emitter-walk lineage guard:
# q_meta_summary_lifecycle; the branch-scoped replay-guard stamping:
# q_meta_wap, q_stream_append, q_stream_cdc_store; the facade
# retract-handle return: q_sql_surface; the hardlink store clone:
# q_stream_incremental_dedup; the MOR-merge key-write reuse:
# q_meta_incr_agg, q_stream_incr_agg, t_incremental_token_freq,
# t_incremental_bm25, t_incremental_lm), then (d) 30 of the 45 remaining
# r10-stale names, oldest-first alphabetical (q_meta_rollback plus the
# other 14 spill just below the window — they driver-sign at r15).
# 3 + 3 + 14 + 30 = 50; after this window the union freshness floor is
# r10 (the 15 spilled r10 names) with everything else >= r11.
_PREFIX_ORDER = [
    # (a) never-signed + r09-stale spillovers
    "q_stream_cluster_maintain",
    "t_heavy_hitters",
    "t_repetition",
    # (b) new in r14
    "d_incremental_simhash_retract",
    "s_incremental_semdedup_retract",
    "q_stream_cluster_cdc",
    # (c) r14 code-touched
    "d_incremental_clusters",
    "d_incremental_cluster_retract",
    "q_meta_analyze",
    "q_meta_summary_lifecycle",
    "q_meta_wap",
    "q_stream_append",
    "q_stream_cdc_store",
    "q_sql_surface",
    "q_stream_incremental_dedup",
    "q_meta_incr_agg",
    "q_stream_incr_agg",
    "t_incremental_token_freq",
    "t_incremental_bm25",
    "t_incremental_lm",
    # (d) 30 oldest r10-stale names, alphabetical
    "c_chunk_documents",
    "c_hash_sample",
    "c_pack_sequences",
    "c_source_cap",
    "c_train_split",
    "d_minhash_accuracy",
    "d_span_dup",
    "q01_pricing_summary",
    "q03_shipping_priority",
    "q04_order_priority",
    "q05_region_revenue",
    "q06_forecast_revenue",
    "q_avro_roundtrip",
    "q_bloom_join",
    "q_dsv2_stream",
    "q_filter_project",
    "q_funnel_steps",
    "q_jsonl_scan",
    "q_latest_event_per_user",
    "q_merge_upsert",
    "q_meta_add_files",
    "q_meta_as_of",
    "q_meta_avro_java",
    "q_meta_entries",
    "q_meta_evolution",
    "q_meta_history",
    "q_meta_maintain",
    "q_meta_manifests",
    "q_meta_metadata_log",
    "q_meta_pos_delete",
    # --- below the 50-slot window: q_meta_rollback slipped out when the
    # late r14 addition q_stream_cluster_cdc took a (b) slot, then the 14
    # r10-stale names the window could not fit (driver-sign at r15),
    # oldest-first alphabetical
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
