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


# Names the driver's capped correctness run did NOT reach in round 1
# (CORRECTNESS_r01.json stopped at 50 of 77). Enumerate these first so the
# next driver round verifies them; already-green queries re-verify after.
_DRIVER_PRIORITY = (
    "stats_corr_covar",
    "array_agg_suppliers_by_nation",
    "grouping_sets_sql",
    "exists_subquery_sql",
    "scalar_levenshtein",
    "range_join_event_pairs",
    "q6_forecast_revenue",
    "window_moving_avg",
    "window_spend_rank",
    "events_hourly_profile",
    "udaf_geometric_mean",
    "join_salted_skew",
    "multimodal_image_features",
    "distinct_flag_status",
    "text_token_stats",
    "text_quality_score",
    "text_lang_id",
    "text_fingerprint",
    "dedup_exact",
    "dedup_ngram_jaccard_top20",
    "text_token_count_bpe",
    "text_fingerprint_rolling",
    "text_chunk_windows",
    "text_bigram_top20",
    "text_source_lang_profile",
    "dedup_minhash_lsh",
    "dedup_simhash",
)

# Names with a green round-1 driver row — re-verify these last.
_R1_CHECKED = frozenset((
    "agg_approx_count_distinct",
    "agg_count_distinct",
    "agg_orders_by_status",
    "ann_ivf_top10",
    "ann_lsh_top10",
    "case_when_price_buckets",
    "cube_order_counts",
    "embedding_centroids_by_label",
    "embedding_near_pairs",
    "embedding_norms",
    "events_asof_purchase_signup",
    "events_json_extract",
    "events_latest_per_user",
    "events_pivot_type_counts",
    "events_rate_by_type",
    "events_session_windows",
    "events_sliding_hour",
    "events_tumbling_hour",
    "having_nation_counts",
    "join_anti_customers_without_orders",
    "join_broadcast_star",
    "join_full_outer_nation_presence",
    "join_outer_customer_order_counts",
    "join_semi_customers_with_big_orders",
    "knn_cosine_top20",
    "lsh_bucket_histogram",
    "pivot_order_priority",
    "point_lookup_key",
    "q10_returned_items",
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q4_late_shipments",
    "q5_local_supplier_volume",
    "q7_volume_shipping",
    "rollup_revenue",
    "scalar_date_funcs",
    "scalar_math_funcs",
    "scalar_string_funcs",
    "search_name_exact",
    "search_name_partial",
    "set_except_nations",
    "set_intersect_nations",
    "set_union_nations",
    "stats_percentiles",
    "subquery_above_avg_orders",
    "subquery_correlated_max_order",
    "topk_orders",
    "window_rank_orders_per_customer",
    "window_running_revenue",
    "window_share_of_nation",
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
    # Then queries with no round-1 row at all (added since), then the
    # already-green rest.
    for name, qd in _REGISTRY.items():
        if name not in _R1_CHECKED:
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
