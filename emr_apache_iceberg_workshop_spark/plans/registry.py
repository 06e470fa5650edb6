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
# 50-name prefix of the registry per round (the driver's correctness
# window). The prefix rotates each round so every query gets a fresh
# driver-signed correctness row on a bounded cadence: r01 tpch/events/
# textops, r02 the extension surface, r03 tablemeta + r01-only names,
# r04-r05 event-time + aged overflow, r09/r10/r13 their additions + the
# then-stale cohorts, r15 the fast-path/_microbatch_confs rewrites + the
# r10-stale cohort + 26 of the 47 r11 names.
#
# r16 rotation: (a) the 7 queries whose EXECUTION PATH round 16 rewrote
# (est_sim riding the band join: d_incremental + its streaming twin;
# the single-evaluation op-column MOR merge + fused/2x-cap probes: the
# CDC store drain, both cluster drains, the cluster one-shot pair) —
# their r15 signatures predate the change; then (b) ALL 21 names whose
# last driver signature is r11 (the union freshness floor rises to r12;
# q_stream_cdc is in this group AND r16-touched — its MOR merge rides
# the single-eval source); then (c) the first 22 of the 41 r12-stale
# names, oldest-first alphabetical. 7 + 21 + 22 = 50; the remaining 19
# r12 names spill just below the window and driver-sign next rotation.
_PREFIX_ORDER = [
    # (a) r16 code-touched
    "q_stream_incremental_dedup",
    "q_stream_cdc_store",
    "q_stream_cluster_cdc",
    "q_stream_cluster_maintain",
    "d_incremental",
    "d_incremental_clusters",
    "d_incremental_cluster_retract",
    # (b) the full r11-stale cohort — union freshness floor clears to r12
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
    # (c) r12-stale cohort, first 22 oldest-first alphabetical
    "c_epoch_shuffle",
    "c_quality_funnel",
    "c_temperature_mix",
    "d_containment",
    "d_embedding_neardup",
    "d_incremental_exact",
    "d_incremental_simhash",
    "d_incremental_verdicts",
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
    # --- below the 50-slot window: the remaining 19 r12-stale names
    # (driver-sign next rotation), oldest-first alphabetical
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
    "q_order_gaps",
    "q_percentiles",
    "t_ccnet_buckets",
    "t_incremental_decontam",
    "t_unigram_logprob",
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
