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
    "tpch",
    "events",
    "textops",
]

# Registration order matters to external harnesses that check a bounded
# 50-name prefix of the registry per round. The prefix below rotates the
# verification window each round so every query gets a fresh correctness
# row at least every other round: r01 covered tpch/events/textops, r02
# front-loaded the extension surface, r03 covered tablemeta + the r01-only
# names. r03 exposed a testdata-layout change (events.ts ns-int64 → native
# µs TIMESTAMP) that broke 8 event-time queries; r04 leads with (a) those
# 8, now fixed by layout autodetection in catalog.load_table, (b) the two
# queries that have never had a driver row, (c) queries NEW this round,
# then (d) the names unchecked in r03. Unlisted names follow in
# module-registration order (all green in r03).
_PREFIX_ORDER = [
    # (a) broken by the r03 testdata layout change, fixed this round
    "q_event_windows",
    "q_sessionization",
    "q_trailing_window",
    "q_latest_event_per_user",
    "q_merge_upsert",
    "q_latest_event",
    "q_asof_join",
    "q_range_join",
    # (b) never driver-checked
    "t_repetition",
    "t_decontaminate",
    # (c) new this round — inserted here as they land
    "c_mix_corpora",
    "c_pack_sequences",
    "c_stratified_sample",
    "q_meta_compaction",
    "q_meta_expire",
    "s_knn_graph",
    "s_dup_clusters",
    "q_bucketed_join",
    "q_meta_pruning",
    "q_meta_changes",
    "q_meta_partitions",
    "q_sketch_distinct",
    "q_sketch_quantiles",
    "t_unigram_logprob",
    # hash family strengthened to two rounds this round — results changed
    "c_hash_sample",
    "c_train_split",
    # (d) not checked in r03
    "t_token_stats",
    "t_quality_score",
    "t_langid_confusion",
    "t_fingerprint",
    "t_token_freq",
    "t_lang_profile",
    "t_bpe_tokens",
    "t_scrub_pii",
    "m_frame_sample",
    "m_modality_stats",
    "m_extract_features",
    "m_resize_plan",
    "q01_pricing_summary",
    "q03_shipping_priority",
    "q05_region_revenue",
    "q_top_customers",
    "q_filter_project",
    "q_table_counts",
    "q_semi_anti",
    "q_set_ops",
    "q_rollup_revenue",
    "q04_order_priority",
    "q_part_revenue_share",
    "q06_forecast_revenue",
    "q_above_avg_orders",
    "q_cube_orders",
    "q_string_funcs",
    "q13_custdist",
    "q18_large_orders",
    # (e) re-verify on any remaining slots (events-table queries whose
    # inputs changed layout but whose r03 rows were already green)
    "q_salted_engagement",
    "q_props_stats",
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
