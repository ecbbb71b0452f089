"""Declared query inventory — the contract surface the driver verifies.

Each :class:`QueryDef` pairs a Spark DataFrame builder with an equivalent
ANSI-SQL oracle (DuckDB dialect) over the same parquet tables. The driver
runs both at sf=0.01 and compares row count + schema + order-insensitive
value hash, so:

- every computed column is aliased identically on both sides;
- float aggregates are rounded on both sides (summation order differs
  between engines — rounding makes the comparison stable);
- LIMIT queries carry a deterministic ORDER BY on a unique key;
- no output column depends on the session timezone (epoch arithmetic /
  NTZ-derived dates only).

Queries whose semantics SQL cannot express (hash-seeded MinHash/SimHash
sketches, LSH bucketing) set ``oracle=None`` → the driver records a weaker
rows-only check, which is the honest label for them.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class QueryDef:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB SQL, or None → rows-only check
    doc: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)
    bench: bool = False  # include in bench.py headline set


_REGISTRY: dict[str, QueryDef] = {}


def query(
    name: str,
    oracle: str | None,
    doc: str = "",
    tags: tuple[str, ...] = (),
    bench: bool = False,
) -> Callable[[QueryFn], QueryFn]:
    """Decorator: register a (spark, sf_dir) -> DataFrame builder."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        _REGISTRY[name] = QueryDef(name, fn, oracle, doc or (fn.__doc__ or ""), tags, bench)
        return fn

    return deco


# Names with NO driver CORRECTNESS row after rounds 1-3 (the driver's
# per-round run is capped at 50 queries; CORRECTNESS_r0{1,2,3}.json
# together cover 100 of 113). Enumerate these first so round 4 verifies
# them; already-green queries re-verify after.
_DRIVER_PRIORITY = (
    "ann_recall_eval",
    "doc_length_deciles",
    "embedding_quantize_int8",
    "events_time_rollup",
    "histogram_order_totals",
    "q2_min_cost_supplier",
    "q11_important_parts",
    "q18_large_volume_customers",
    "q19_disjunctive_revenue",
    "q21_sole_late_supplier",
    "q22_idle_rich_customers",
    "revenue_weekly_growth",
    "topn_orders_per_segment",
)

# Names with a green driver row in any of rounds 1-3 (union of
# CORRECTNESS_r01/r02/r03 keys) — re-verify these last so queries added
# since (no row yet) sort ahead of them.
_DRIVER_CHECKED = frozenset((
    "agg_approx_count_distinct",
    "agg_count_distinct",
    "agg_orders_by_status",
    "ann_ivf_top10",
    "ann_lsh_top10",
    "array_agg_suppliers_by_nation",
    "case_when_price_buckets",
    "corpus_mix_weighted",
    "cube_order_counts",
    "decontam_eval_overlap",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard_top20",
    "dedup_simhash",
    "dedup_survivors",
    "distinct_flag_status",
    "doc_repetition_filter",
    "dup_cluster_components",
    "embedding_centroids_by_label",
    "embedding_near_pairs",
    "embedding_norms",
    "events_asof_purchase_signup",
    "events_funnel",
    "events_hourly_profile",
    "events_json_extract",
    "events_latest_per_user",
    "events_pivot_type_counts",
    "events_rate_by_type",
    "events_retention_weekly",
    "events_session_windows",
    "events_sliding_hour",
    "events_tumbling_hour",
    "exists_subquery_sql",
    "grouping_sets_sql",
    "having_nation_counts",
    "join_anti_customers_without_orders",
    "join_broadcast_star",
    "join_full_outer_nation_presence",
    "join_outer_customer_order_counts",
    "join_salted_skew",
    "join_semi_customers_with_big_orders",
    "knn_cosine_top20",
    "lsh_bucket_histogram",
    "multimodal_image_features",
    "pack_greedy_bins",
    "pivot_order_priority",
    "point_lookup_key",
    "profile_orders_columns",
    "q10_returned_items",
    "q13_customer_order_distribution",
    "q14_promo_revenue_share",
    "q15_top_supplier",
    "q17_small_quantity_revenue",
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q4_late_shipments",
    "q5_local_supplier_volume",
    "q6_forecast_revenue",
    "q7_volume_shipping",
    "q8_market_share",
    "q9_profit_by_nation_year",
    "range_join_event_pairs",
    "rollup_revenue",
    "sample_hash_split",
    "sample_token_budget",
    "scalar_date_funcs",
    "scalar_levenshtein",
    "scalar_math_funcs",
    "scalar_string_funcs",
    "search_name_exact",
    "search_name_partial",
    "set_except_nations",
    "set_intersect_nations",
    "set_union_nations",
    "snapshot_diff_orders",
    "source_vocab_overlap_top20",
    "stats_corr_covar",
    "stats_percentiles",
    "stopword_pruned_stats",
    "stratified_sample_per_source",
    "subquery_above_avg_orders",
    "subquery_correlated_max_order",
    "text_bigram_top20",
    "text_chunk_windows",
    "text_fingerprint",
    "text_fingerprint_rolling",
    "text_lang_id",
    "text_quality_score",
    "text_source_lang_profile",
    "text_token_count_bpe",
    "text_token_stats",
    "tfidf_top20",
    "top_terms_per_lang",
    "topk_orders",
    "udaf_geometric_mean",
    "window_moving_avg",
    "window_rank_orders_per_customer",
    "window_running_revenue",
    "window_share_of_nation",
    "window_spend_rank",
))


def all_queries() -> dict[str, QueryDef]:
    # Import side-effect modules on first use so the registry is populated.
    from . import (  # noqa: F401
        corpus,
        events,
        relational,
        relational_deep,
        similarity,
        stats,
        text,
    )

    ordered: dict[str, QueryDef] = {}
    for name in _DRIVER_PRIORITY:
        if name in _REGISTRY:
            ordered[name] = _REGISTRY[name]
    # Then queries with no driver row at all (added since round 3), then
    # the already-green rest.
    for name, qd in _REGISTRY.items():
        if name not in _DRIVER_CHECKED:
            ordered.setdefault(name, qd)
    for name, qd in _REGISTRY.items():
        ordered.setdefault(name, qd)
    return ordered


def queries_callables() -> dict[str, QueryFn]:
    return {name: qd.fn for name, qd in all_queries().items()}


def oracles() -> dict[str, str]:
    return {name: qd.oracle for name, qd in all_queries().items() if qd.oracle is not None}


def bench_queries() -> dict[str, QueryDef]:
    return {name: qd for name, qd in all_queries().items() if qd.bench}
