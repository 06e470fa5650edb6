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
# r10 covered the r10 additions + the 44 r06-stale names.
#
# r13 rotation (per the r12 verdict's task 1): leads with (a) the 2
# r12-late additions battery-verified by the judge but never
# driver-signed (t_incremental_bm25, q_stream_cdc_store), then (b) the
# 3 queries NEW this round (d_incremental_clusters — persisted
# component labels folded per batch; c_corpus_build — the composed
# funnel→dedup→decontam→pack pipeline; d_incremental_cluster_retract —
# the cluster tier's deletion path), then (c) the 5 names whose
# CODE changed this round (q_meta_analyze's snapshot-scoped stats
# short-circuit; q_meta_summary_lifecycle's both-ways freshness guard;
# q_stream_incremental_dedup + q_stream_append through the O(1)
# replay-guard property lookup; d_incremental_retract through the
# delete_keys summary_extra path), then (d) 40 of the 43 names whose
# most-recent driver confirmation is r09, oldest-first alphabetical
# (q_meta_analyze is already in (c); t_heavy_hitters + t_repetition
# spill just below the window — they driver-sign at r14).
# 2 + 3 + 5 + 40 = 50; after this window the union freshness floor is
# r10 for every name except those two spilled r09 stragglers.
_PREFIX_ORDER = [
    # (a) r12-late, awaiting first driver signature
    "t_incremental_bm25",
    "q_stream_cdc_store",
    # (b) new in r13
    "d_incremental_clusters",
    "c_corpus_build",
    "d_incremental_cluster_retract",
    # (c) r13 code-touched
    "q_meta_analyze",
    "q_meta_summary_lifecycle",
    "q_stream_incremental_dedup",
    "q_stream_append",
    "d_incremental_retract",
    # (d) 40 oldest r09-stale names, alphabetical
    "d_exact_dup",
    "d_minhash_lsh",
    "d_simhash64",
    "d_simhash_clusters",
    "d_url_dedup",
    "m_bmp_pixels",
    "m_decode_metadata",
    "m_exif_parse",
    "m_gif_pixels",
    "m_jpeg_coeffs",
    "m_pcm_features",
    "m_png_pixels",
    "m_real_codecs",
    "q_catalog_format_read",
    "q_dsv2_incremental",
    "q_dsv2_pushdown",
    "q_dsv2_scan",
    "q_dsv2_write",
    "q_meta_dml",
    "q_meta_dyn_overwrite",
    "q_meta_iceberg_v2",
    "q_meta_position_deletes",
    "q_meta_stats_puffin",
    "q_pivot_status",
    "q_props_stats",
    "q_salted_engagement",
    "q_sketch_quantiles",
    "q_sql_surface",
    "q_stream_dedup",
    "q_stream_event_windows",
    "q_stream_heavy_hitters",
    "q_string_funcs",
    "s_ann_recall",
    "s_cosine_topk",
    "s_ivf_topk",
    "s_lsh_topk",
    "s_rp_quality",
    "t_bigram_logprob",
    "t_bm25_topk",
    "t_entropy",
    # --- below the 50-slot window: q_stream_cluster_maintain is
    # r13-late (battery-verified at both SFs; driver-signs at r14) and
    # t_heavy_hitters / t_repetition are the two r09-stale names the
    # window could not fit (driver-sign at r14), then the prior prefix
    # order.
    "q_stream_cluster_maintain",
    "t_heavy_hitters",
    "t_repetition",
    "d_incremental_verdicts",
    "t_incremental_lm",
    "s_incremental_semdedup",
    "d_incremental_exact",
    "t_incremental_decontam",
    "t_incremental_token_freq",
    "d_incremental_simhash",
    "d_incremental",
    "t_unigram_logprob",
    "t_ccnet_buckets",
    "d_ngram_jaccard",
    "d_simhash",
    "q02_min_cost_supplier",
    "q07_volume_shipping",
    "q08_market_share",
    "q09_product_profit",
    "q10_returned_items",
    "q11_important_stock",
    "q12_late_shipments",
    "q13_custdist",
    "q14_promo_revenue",
    "q15_top_supplier",
    "q16_parts_supplier",
    "q17_small_quantity",
    "q18_large_orders",
    "q19_bracket_discounts",
    "q20_heavy_shippers",
    "q21_waiting_suppliers",
    "q22_global_sales_opportunity",
    "q_above_avg_orders",
    "q_column_profile",
    "q_cube_orders",
    "q_first_last_order",
    "q_grouping_sets",
    "q_meta_changes",
    "q_meta_incremental",
    "q_meta_refs",
    "q_meta_time_travel",
    "q_ntile_deciles",
    "q_order_gaps",
    "q_percentiles",
    "c_epoch_shuffle",
    "c_quality_funnel",
    "c_temperature_mix",
    "d_containment",
    "d_embedding_neardup",
    "q_meta_metadata_log_reloc",
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
    "q_meta_multispec",
    "q_meta_name_mapping",
    "q_meta_partitions",
    "q_meta_pruning",
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
    "q_meta_snapshot_summary",
    "s_semdedup",
    "q_meta_metadata_log",
    "q_meta_add_files",
    "q_meta_avro_java",
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
    "q_filter_project",
    "q_funnel_steps",
    "q_jsonl_scan",
    "q_latest_event_per_user",
    "q_merge_upsert",
    "q_meta_as_of",
    "q_meta_entries",
    "q_meta_evolution",
    "q_meta_history",
    "q_meta_incr_agg",
    "q_meta_maintain",
    "q_meta_manifests",
    "q_meta_pos_delete",
    "q_meta_rollback",
    "q_meta_snapshots",
    "q_meta_wap",
    "q_retention_cohorts",
    "q_stream_incr_agg",
    "q_stream_join",
    "q_stream_sessionize",
    "q_table_counts",
    "s_quantized_topk",
    "s_topic_clusters",
    "t_boilerplate",
    "t_hashed_classifier",
    "t_langid_confusion",
    "t_quality_score",
    "t_tfidf_keywords",
    "t_token_stats",
    "q_dsv2_stream",
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
