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
    "streamingq",
]

# Registration order matters to external harnesses that check a bounded
# 50-name prefix of the registry per round. The prefix below rotates the
# verification window each round so every query gets a fresh correctness
# row at least every other round: r01 covered tpch/events/textops, r02
# front-loaded the extension surface, r03 covered tablemeta + the r01-only
# names, r04 covered event-time + the r04-new operators, r05 covered the
# 45 names outside r04's window + 5 result-touched names.
#
# r07 leads with (a) the names last driver-signed in r04 (oldest rows —
# no name should go more than ~2 rounds unsigned), then (b) names whose
# CODE this round changes (cherry-pick ancestor refusal; CDC run-scoped
# exactly-once; quote-aware SQL-facade rewrites; Iceberg-parity bucket
# hash behind every bucket() spec; cheaper connected-components fixpoint
# probe behind the dup-cluster queries), then (c) round-7-NEW queries —
# each added here in the same commit that registers it (a
# test_registry_prefix test fails loudly on any name missing from the
# registry). Unlisted names follow in module-registration order (all
# green in r05/r06).
_PREFIX_ORDER = [
    # (a) last signed r04 (32 names)
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
    "q_meta_compaction",
    "q_meta_expire",
    "q_meta_partitions",
    "q_meta_pruning",
    "q_part_revenue_share",
    "q_range_join",
    "q_rollup_revenue",
    "q_semi_anti",
    "q_sessionization",
    "q_set_ops",
    "q_sketch_distinct",
    "q_top_customers",
    "q_trailing_window",
    "s_dup_clusters",
    "s_knn_graph",
    "t_bpe_tokens",
    "t_decontaminate",
    "t_fingerprint",
    "t_lang_profile",
    "t_repetition",
    "t_scrub_pii",
    "t_token_freq",
    # (b) code-touched this round (not already in (a))
    "q_meta_cherrypick",
    "q_stream_cdc",
    "q_sql_surface",
    "q_sql_ctas",
    "q_meta_hidden",
    "c_dup_groups",
    "c_curated_corpus",
    # (c) round-7-new queries, added as each lands
    "q_meta_bucket",
    "q_meta_iceberg_v2",
    "q_meta_v2_travel",
    "q_meta_bounds",
    "q_meta_expire_age",
    "q_meta_multispec",
    "q_stream_append",
    "q_meta_name_mapping",
    "m_real_codecs",
    # (d) r05-signed names whose fixtures/emission path this round's
    # commit-protocol and metadata changes touch (fills the 50 slots)
    "q_meta_iceberg",
    "q_meta_files",
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
