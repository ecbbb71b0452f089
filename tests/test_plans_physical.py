"""Physical-plan assertions — the 100 TB guardrails.

Correctness says the query returns the right rows; these tests pin the
*plan shape* that keeps it viable at scale: filters reaching the parquet
scan, column pruning, dimension broadcasts (no fact-side shuffle), top-k
without a global sort, and whole-stage codegen in the hot paths. A
regression here is a performance bug even while results stay green.
"""

from __future__ import annotations

import pytest

from data_pipeline_challenge_spark.plans import all_queries

SF = "/root/testdata/sf0.001"


def plan_of(spark, name: str) -> str:
    df = all_queries()[name].fn(spark, SF)
    return spark._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")


def plan_simple(spark, name: str) -> str:
    df = all_queries()[name].fn(spark, SF)
    return spark._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "simple")


def test_q1_filter_pushdown_and_pruning(spark):
    plan = plan_of(spark, "q1_pricing_summary")
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan
    # column pruning: the scan must not read the join keys we never use
    assert "l_orderkey" not in plan.split("ReadSchema")[1].split("\n")[0]
    # whole-stage codegen spans show as *(n) in simple mode — but only on
    # the finalized AQE plan, so execute first
    df = all_queries()["q1_pricing_summary"].fn(spark, SF)
    df.collect()
    final = spark._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "simple")
    assert "isFinalPlan=true" in final and "*(" in final


def test_point_lookup_pushdown(spark):
    plan = plan_of(spark, "point_lookup_key")
    assert "PushedFilters: [IsNotNull(p_partkey), EqualTo(p_partkey,142)]" in plan


def test_star_join_broadcasts_dims(spark):
    plan = plan_of(spark, "join_broadcast_star")
    # 3 joins; formatted mode prints each node twice (tree + detail)
    assert plan.count("BroadcastHashJoin") >= 3
    assert "SortMergeJoin" not in plan  # the fact table must never shuffle


def test_q5_no_cartesian_and_broadcast_dims(spark):
    plan = plan_of(spark, "q5_local_supplier_volume")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BroadcastHashJoin" in plan


def test_topk_avoids_global_sort(spark):
    plan = plan_of(spark, "topk_orders")
    assert "TakeOrderedAndProject" in plan


def test_search_partial_limits_pushed(spark):
    plan = plan_of(spark, "search_name_partial")
    # limit executes as TakeOrdered/CollectLimit, not a full global sort
    assert ("TakeOrderedAndProject" in plan) or ("CollectLimit" in plan)


def test_semi_anti_stay_joins(spark):
    for name in (
        "join_semi_customers_with_big_orders",
        "join_anti_customers_without_orders",
        "exists_subquery_sql",
    ):
        plan = plan_of(spark, name)
        assert "LeftSemi" in plan or "LeftAnti" in plan, name


def test_range_join_is_hash_not_nested_loop(spark):
    plan = plan_of(spark, "range_join_event_pairs")
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_near_pairs_has_no_allpairs_join(spark):
    """embedding_near_pairs must run the tiled block-matmul plan: candidate
    generation in FlatMapGroupsInPandas, verification via hash joins — no
    nested-loop/cartesian O(n²) row materialization anywhere."""
    plan = plan_of(spark, "embedding_near_pairs")
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "FlatMapGroupsInPandas" in plan  # the tiled matmul stage
    # candidate re-verification joins are hash joins on the pair ids
    assert ("SortMergeJoin" in plan) or ("BroadcastHashJoin" in plan) or (
        "ShuffledHashJoin" in plan
    )


@pytest.mark.parametrize("name", ["events_tumbling_hour", "agg_orders_by_status"])
def test_aggs_have_partial_phase(spark, name):
    """Partial (map-side) aggregation before the shuffle — the property
    that makes these one-pass at 100 TB."""
    plan = plan_of(spark, name)
    assert "partial_" in plan.lower() or "HashAggregate" in plan


@pytest.mark.parametrize("name", ["doc_length_deciles", "window_spend_rank"])
def test_global_ranks_avoid_single_partition_window(spark, name):
    """Global NTILE/percent_rank must run the range-partition + offset plan
    (operators/ranking.py): every Window node keeps a partition spec, so no
    stage funnels the full input into one task."""
    plan = plan_of(spark, name)
    # A global window compiles to `Exchange SinglePartition` + an
    # unpartitioned windowspec; the ranking operator must produce neither.
    assert "Exchange SinglePartition" not in plan, name
    assert "windowspecdefinition(" in plan  # the local rank window exists...
    assert "windowspecdefinition(__rank_pid" in plan  # ...partitioned by pid


def test_new_tpch_deep_join_shapes(spark):
    plan = plan_of(spark, "q8_market_share")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert plan.count("BroadcastHashJoin") >= 3  # n1, n2, region at minimum
    plan18 = plan_of(spark, "q18_large_volume_customers")
    assert "LeftSemi" in plan18
    plan22 = plan_of(spark, "q22_idle_rich_customers")
    assert "LeftAnti" in plan22


def test_tfidf_partial_agg_and_topk(spark):
    plan = plan_of(spark, "tfidf_top20")
    assert "TakeOrderedAndProject" in plan  # top-20 without a global sort
    assert "partial_count" in plan or "HashAggregate" in plan


def test_bm25_multiquery_uses_window_group_limit(spark):
    """Batch retrieval's per-query top-5 must execute as WindowGroupLimit
    (group-local top-k on both sides of the shuffle), never a global
    sort; the query-set sides broadcast."""
    plan = plan_of(spark, "bm25_multiquery_top5")
    assert "WindowGroupLimit" in plan
    assert "BroadcastHashJoin" in plan
    assert "TakeOrderedAndProject" not in plan  # no global-sort fallback


def test_bm25_filters_before_agg_and_topk(spark):
    """BM25's tf frame must be query-term-filtered BEFORE aggregation
    (the postings table is never materialized), the ≤|query|-row df side
    must broadcast, and top-20 must be TakeOrderedAndProject."""
    plan = plan_of(spark, "bm25_top20")
    assert "TakeOrderedAndProject" in plan
    assert "BroadcastHashJoin" in plan  # df / N / avgdl sides
    # the term IN-filter sits in the plan (generate → filter → aggregate),
    # so only query-term rows reach the tf aggregation
    assert "term#" in plan and " IN (dup,spark,merge)" in plan


def test_decontam_broadcasts_eval_side(spark):
    # The training side must never shuffle: eval shingles broadcast.
    plan = plan_of(spark, "decontam_eval_overlap")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_q19_part_disjuncts_pushed_below_join(spark):
    plan = plan_of(spark, "q19_disjunctive_revenue")
    # Catalyst extracts the part-only disjunction (brand IN/Or + size) and
    # pushes it to the part scan below the broadcast join.
    assert "BroadcastHashJoin" in plan
    scan_filters = plan.split("PushedFilters")
    assert any("p_brand" in seg.split("\n")[0] for seg in scan_filters[1:])


def test_q21_semi_and_anti_join_forms(spark):
    plan = plan_of(spark, "q21_sole_late_supplier")
    assert "LeftSemi" in plan and "LeftAnti" in plan
    assert "CartesianProduct" not in plan


def test_pack_shuffle_payload_is_slim(spark):
    # The packer shuffles only (group, order, token) — never the text.
    plan = plan_of(spark, "pack_greedy_bins")
    assert "text" not in plan.split("Exchange")[1].split("\n")[0]


def test_quantize_plan_is_shuffle_free(spark):
    plan = plan_simple(spark, "embedding_quantize_int8")
    assert "Exchange" not in plan


def test_topn_per_group_uses_window_group_limit(spark):
    # The rank<=N predicate must trigger the WindowGroupLimit rewrite:
    # partial per-partition top-N before the final sort, no global sort of
    # the full join output.
    plan = plan_of(spark, "topn_orders_per_segment")
    assert "WindowGroupLimit" in plan


def test_runtime_bloom_filter_injects_on_fact_dim_join(spark):
    """Runtime bloom-filter semi-join reduction is ON (session default):
    a selective dim side injects might_contain into the fact scan of a
    shuffle join. At sf the application side is tiny, so the size gate is
    zeroed test-scope; at 100 TB the default 10 GB gate passes naturally."""
    import pyspark.sql.functions as F

    from data_pipeline_challenge_spark.catalog import load_table

    assert spark.conf.get("spark.sql.optimizer.runtime.bloomFilter.enabled") == "true"
    confs = {
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    saved = {k: spark.conf.get(k) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        li = load_table(spark, SF, "lineitem")
        o = load_table(spark, SF, "orders").filter(
            F.col("o_orderpriority") == "1-URGENT"
        )
        j = (
            li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
            .groupBy("o_orderpriority")
            .count()
        )
        plan = spark._jvm.PythonSQLUtils.explainString(
            j._jdf.queryExecution(), "formatted"
        )
        assert "might_contain" in plan
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)


def test_aqe_splits_skewed_join_partitions(spark):
    """AQE skew-join handling is ON and actually fires: a hot-key join
    partition gets split at runtime (skew=true in the final SMJ). Scoped
    thresholds shrink 'skewed' to test scale; the mechanism is identical
    at 100 TB. Note the consumer must not require the join's hash
    partitioning (a groupBy on the join key would veto the split)."""
    import pyspark.sql.functions as F

    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "16KB",
        "spark.sql.shuffle.partitions": "8",
    }
    saved = {k: spark.conf.get(k) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        left = spark.range(200_000).select(
            F.lit(7).alias("k"), F.col("id").alias("v")
        ).union(
            spark.range(2_000).select((F.col("id") % 100).alias("k"), F.col("id").alias("v"))
        )
        right = spark.range(100).select(F.col("id").alias("k"), F.lit(1).alias("w"))
        j = left.join(right, "k").select(F.sum(F.col("v") + F.col("w")).alias("s"))
        j.collect()
        final = spark._jvm.PythonSQLUtils.explainString(
            j._jdf.queryExecution(), "simple"
        )
        assert "skew=true" in final
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)


def test_q16_exclusion_is_broadcast_anti(spark):
    plan = plan_of(spark, "q16_supplier_part_counts")
    # the NOT IN supplier exclusion and the part-dim join both broadcast;
    # the lineitem side shuffles only for the distinct-count aggregate
    assert "BroadcastHashJoin" in plan
    assert "LeftAnti" in plan
    assert "SortMergeJoin" not in plan


def test_q20_nested_subquery_is_broadcast_semi(spark):
    plan = plan_of(spark, "q20_promotable_suppliers")
    # both semi-joins broadcast: supplier table never shuffles
    assert plan.count("LeftSemi") >= 2
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


def test_q12_fact_filter_pushed_below_join(spark):
    plan = plan_of(spark, "q12_shipping_speed_priority")
    # the shipdate range must reach the lineitem parquet scan
    assert "PushedFilters: [IsNotNull(l_shipdate), GreaterThanOrEqual(l_shipdate" in plan


def test_gopher_filter_is_map_only_plus_tiny_agg(spark):
    plan = plan_of(spark, "quality_gopher_filter")
    # one scan, one partial agg, one exchange on source — no join, no window
    assert "Join" not in plan and "Window" not in plan
    assert plan.count("Exchange") <= 2  # partial->final agg only
    rs = plan.split("ReadSchema")[1].split("\n")[0]
    assert "text" in rs and "doc_id" not in rs  # prunes unused columns


def test_term_scrub_is_shuffle_free(spark):
    plan = plan_of(spark, "text_term_scrub")
    assert "Exchange" not in plan
    assert "Join" not in plan


def test_top_words_per_lang_uses_window_group_limit(spark):
    plan = plan_of(spark, "top_words_per_lang")
    assert "WindowGroupLimit" in plan
    assert "Generate" in plan  # the explode runs before the two-phase count


def test_corpus_length_trim_range_partitioned_rank(spark):
    """r15 re-plan: the per-source percent_rank runs the grouped
    range-partition + offset plan — the only window is partitioned by
    (__rank_pid, source), never by source alone over the raw table, and
    no stage funnels into one task."""
    plan = plan_of(spark, "corpus_length_trim")
    assert "Exchange SinglePartition" not in plan
    assert "windowspecdefinition(__rank_pid" in plan
    assert "windowspecdefinition(source#" not in plan


def test_sample_token_budget_range_partitioned_cumsum(spark):
    """r15 re-plan: the per-source token cumsum runs the grouped
    range-partition + offset plan (with_grouped_cumsum) — the only
    window partitions by (__rank_pid, source), never source alone over
    the raw corpus."""
    plan = plan_of(spark, "sample_token_budget")
    assert "Exchange SinglePartition" not in plan
    assert "windowspecdefinition(__rank_pid" in plan
    assert "windowspecdefinition(source#" not in plan


def test_window_share_of_nation_no_hot_stratum_window(spark):
    """r15 re-plan: ~25 nations over the full customer table must not
    shuffle into 25 window tasks — the group sum is a combinable
    groupBy broadcast-joined back, and ntile runs the grouped
    range-partition plan."""
    plan = plan_of(spark, "window_share_of_nation")
    assert "Exchange SinglePartition" not in plan
    assert "windowspecdefinition(__rank_pid" in plan
    assert "windowspecdefinition(c_nationkey#" not in plan
    assert "BroadcastHashJoin" in plan  # the sums come back broadcast


def test_decontam_threshold_profile_partial_agg_only(spark):
    # Same broadcast-eval core as decontam_eval_overlap (training side
    # never sort-merge-shuffles), and the six threshold counts fold in a
    # two-phase partial aggregate -- the shuffle after the per-doc
    # overlap carries partial sums, never a per-doc-per-threshold fanout.
    plan = plan_of(spark, "decontam_threshold_profile")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "partial_sum" in plan  # map-side combine of the 6 counters
    assert "CartesianProduct" not in plan


def test_duplicated_spans_partial_agg_and_column_pruning(spark):
    # The span counts must fold map-side (partial count before the
    # span-keyed shuffle — repeats collapse per partition), the top-20
    # must be a distributed TakeOrderedAndProject (never a global sort
    # materializing every cross-doc span), and the scan must read only
    # (doc_id, text).
    plan = plan_of(spark, "dedup_duplicated_spans_top20")
    assert "partial_count" in plan
    assert "TakeOrderedAndProject" in plan
    assert "CartesianProduct" not in plan
    seg = plan.split("ReadSchema")[1].split("\n")[0]
    assert "text" in seg and "lang" not in seg and "source" not in seg


def test_zipf_fit_topk_not_global_window(spark):
    # The top-500 cut over the vocabulary must run as a distributed
    # TakeOrderedAndProject; a global row_number window here would drag
    # the entire vocabulary into one partition (the WindowExec
    # single-partition warning shape). The 500-row rank window after the
    # cut is fine — what must NOT happen is Window before the limit.
    plan = plan_simple(spark, "corpus_zipf_fit")
    assert "TakeOrderedAndProject" in plan
    # Window appears once, ABOVE (before, in plan text order) the
    # TakeOrderedAndProject that bounds its input to 500 rows.
    assert plan.index("Window") < plan.index("TakeOrderedAndProject")
    plan_f = plan_of(spark, "corpus_zipf_fit")
    assert "partial_count" in plan_f  # token counts fold map-side


def test_unigram_logprob_vocab_sized_shuffles(spark):
    # Token frequencies fold map-side; the frequency join back to the
    # token stream is keyed on the token (no cartesian); the corpus
    # total reaches each row via a broadcast of ONE aggregate row.
    plan = plan_of(spark, "text_unigram_logprob")
    assert "partial_count" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan


def test_span_scrub_plan_shape(spark):
    # Duplicated-span membership must be a JOIN on the span key (a
    # forced broadcast of the boilerplate set would OOM at 100 TB — at
    # tiny sf AQE may still pick broadcast, which is fine because it is
    # size-based, not plan-forced: no broadcast hint in the source),
    # the span counts fold map-side, no cartesian anywhere, and the
    # documents scan reads only (doc_id, text).
    plan = plan_of(spark, "dedup_span_scrub")
    assert "partial_count" in plan
    assert "CartesianProduct" not in plan
    seg = plan.split("ReadSchema")[1].split("\n")[0]
    assert "doc_id" in seg and "text" in seg
    assert "lang" not in seg and "source" not in seg


def test_quality_weighted_sample_single_scan(spark):
    # One map-only scan + one two-phase aggregate: no join, no window,
    # no Python — the sampling decision is pure Catalyst arithmetic.
    plan = plan_of(spark, "sample_quality_weighted")
    assert "partial_count" in plan or "partial_sum" in plan
    assert "Join" not in plan
    assert "Window" not in plan
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


def test_new_text_queries_topk_and_no_cartesian(spark):
    """The round-13 bench additions keep the scale-shape contract:
    top-k is TakeOrderedAndProject (never a global Sort), the banded
    windowed-PMI pair join and the shingle df-join are equi-joins
    (no CartesianProduct / BroadcastNestedLoop on the data-sized side
    — the only nested-loop is the broadcast of the 1-row total)."""
    for name in ("term_pmi_window8_top20", "boilerplate_share_top20"):
        plan = plan_of(spark, name)
        assert "TakeOrderedAndProject" in plan, name
        assert "CartesianProduct" not in plan, name
    # the pair generation itself must be a SortMergeJoin/ShuffledHashJoin
    # or broadcast EQUI-join on (doc_id, jb)/(s): presence of any
    # nested-loop join other than the single-row totals broadcast would
    # mean the banding degenerated to doc-level quadratic scans
    plan = plan_of(spark, "term_pmi_window8_top20")
    # formatted mode prints each node twice (tree + detail): <=2 == one
    # BNLJ node, which is the 1-row n_tok crossJoin broadcast
    assert plan.count("BroadcastNestedLoopJoin") <= 2


def test_gapfill_grid_from_span_agg_not_raw(spark):
    """events_gapfill_hourly_locf: the dense grid must derive from the
    per-type SPAN AGGREGATE (generate/explode over (types x hours), a
    function of time, not volume) and the raw scan must feed only the
    map-side-combinable hourly pre-agg — no raw-event window, no
    cartesian."""
    plan = plan_of(spark, "events_gapfill_hourly_locf")
    assert "Generate" in plan  # the sequence() explode builds the grid
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # partial aggregation on the raw side (map-side combine before the
    # event_type/hour shuffle)
    assert "partial_count" in plan or "HashAggregate" in plan


def test_mad_outliers_medians_broadcast_back(spark):
    """events_value_outliers_mad: the per-type median/MAD frames are
    tiny (one row per event_type) and must come back as BROADCAST joins
    — the events side is never shuffled for the final threshold cut."""
    plan = plan_of(spark, "events_value_outliers_mad")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_mad_outliers_no_raw_table_sort_window(spark):
    """events_value_outliers_mad (r15 re-plan): both medians must come
    from the HISTOGRAM pick — a map-side-combinable group-count down to
    O(types x grid cells), then cumsum windows over that small post-agg
    frame. No rank window may sort the raw events table: every
    windowspecdefinition's sort key must be the histogram value column
    ``v``, never the raw ``value``/``dev`` columns (whose per-type sort
    would serialize a fifth of a 100 TB corpus into one task)."""
    import re

    plan = plan_of(spark, "events_value_outliers_mad")
    specs = re.findall(r"windowspecdefinition\([^)]*", plan)
    assert specs, "histogram cumsum windows must exist"
    for s in specs:
        ordered = re.findall(r"(\w+)#\d+L? ASC", s)
        assert ordered in ([], ["v"]), f"raw-table sort window: {s}"
    assert "partial_count" in plan  # histogram map-side combine


def test_docs_length_percentile_range_partitioned(spark):
    """docs_length_percentile_by_source (r15 re-plan): the per-source
    percent_rank must run the grouped range-partition + offset plan
    (operators/ranking.with_grouped_rank_stats) — the only window is
    partitioned by (__rank_pid, source), fully parallel even when one
    source is most of the corpus; never Window.partitionBy(source) over
    the raw table, and no single-partition funnel."""
    plan = plan_of(spark, "docs_length_percentile_by_source")
    assert "Exchange SinglePartition" not in plan
    assert "windowspecdefinition(__rank_pid" in plan
    assert "windowspecdefinition(source#" not in plan


def test_hybrid_rrf_candidates_are_topk(spark):
    """retrieval_hybrid_rrf_top10: both candidate lists must materialize
    as TakeOrderedAndProject top-50s (never a corpus-wide global sort);
    the only nested-loop joins are the 1-row broadcast scalars (n_docs,
    avgdl, query vector)."""
    plan = plan_of(spark, "retrieval_hybrid_rrf_top10")
    assert "TakeOrderedAndProject" in plan
    assert "CartesianProduct" not in plan


def test_pagerank_iterations_stay_equi_joins(spark):
    """pagerank_trade_graph_top20: five iterations of edge⋈rank must
    stay hash equi-joins (never a nested loop), the final top-20 a
    TakeOrderedAndProject, and the edge list is checkpoint-materialized
    so the plan does not re-derive the orders⋈lineitem join per
    iteration (the scan appears once as an RDD scan, not five parquet
    reads)."""
    plan = plan_of(spark, "pagerank_trade_graph_top20")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "TakeOrderedAndProject" in plan
    assert "Scan ExistingRDD" in plan  # the checkpointed edge list


def test_kmv_bottom_k_uses_window_group_limit(spark):
    """distinct_kmv_order_keys: the bottom-k rank filter must compile to
    WindowGroupLimit (partial per-partition bottom-k BEFORE the shuffle)
    — at 100 TB the distinct-hash set is billions of rows and a full
    per-group sort would defeat the sketch's point."""
    plan = plan_of(spark, "distinct_kmv_order_keys")
    # global form: per-partition top-k merge, never a global sort
    assert "TakeOrderedAndProject" in plan
    assert "Exchange SinglePartition" not in plan
    plan_g = plan_of(spark, "distinct_kmv_users_by_type")
    assert "WindowGroupLimit" in plan_g


def test_fuzzy_name_pairs_is_equijoin_on_grams(spark):
    """fuzzy_name_pairs_lev1: candidate generation must be an EQUI-join
    on the q-gram (inverted index), never an all-pairs nested loop over
    the name table; the distinct-first collapse must aggregate before
    pairing."""
    plan = plan_of(spark, "fuzzy_name_pairs_lev1")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_round14_new_queries_plan_shapes(spark):
    """Plan contracts for the round-14 additions: no cartesian products
    anywhere; the interval explode and both gap-fill grids come from
    Generate over aggregated frames; the CMS probe broadcasts the
    sketch; the transition matrix broadcasts its totals."""
    for name in (
        "events_active_sessions_per_hour",
        "events_gapfill_hourly_interp",
        "events_type_transition_matrix",
        "docs_length_percentile_by_source",
        "cms_term_freq_estimates",
        "events_attribution_last_touch",
        "dup_graph_triangles",
    ):
        plan = plan_of(spark, name)
        assert "CartesianProduct" not in plan, name
    for name in ("events_active_sessions_per_hour", "events_gapfill_hourly_interp"):
        assert "Generate" in plan_of(spark, name), name
    assert "BroadcastHashJoin" in plan_of(spark, "cms_term_freq_estimates")
    assert "BroadcastHashJoin" in plan_of(spark, "events_type_transition_matrix")
    # Theil-Sen: the pair join must be an equi-join on event_type over
    # the HOURLY AGGREGATE (time-bounded), never a raw-event cartesian
    plan = plan_of(spark, "events_hourly_trend_theil_sen")
    assert "CartesianProduct" not in plan
    assert "partial_sum" in plan or "HashAggregate" in plan


def test_top_daily_paths_window_group_limit_pinned(spark):
    """events_top_daily_paths (VERDICT r15 #4): the rn<=3 prefix cut
    must stay WindowGroupLimit (partial per-partition top-3 before the
    (user, day) shuffle) and the final top-20 TakeOrderedAndProject —
    with no cartesian and no single-partition funnel. Verified live in
    r15; this pin makes a Spark upgrade or query edit fail loudly."""
    plan = plan_of(spark, "events_top_daily_paths")
    assert "WindowGroupLimit" in plan
    assert "TakeOrderedAndProject" in plan
    assert "CartesianProduct" not in plan
    assert "Exchange SinglePartition" not in plan


def test_retention_weekly_reduces_before_join(spark):
    """events_retention_weekly (VERDICT r15 #4): both join inputs must
    be aggregate-reduced BEFORE the user-key join — the activity side
    to the distinct (user, wk) set, the cohort side via a map-side
    partial_min pushed below its exchange (Catalyst rewrites
    min-over-distinct to plain min: one exchange, strictly better than
    sharing the distinct's) — and the scans must prune to (ts,
    user_id) only."""
    plan = plan_of(spark, "events_retention_weekly")
    assert "partial_min" in plan  # cohort min is map-side combinable
    assert "CartesianProduct" not in plan
    assert "Exchange SinglePartition" not in plan
    # each raw scan feeds exactly one aggregate: 2 scans (formatted mode
    # prints each node twice — tree + detail), no third re-derivation
    assert plan.count("Scan parquet") == 4
    for seg in plan.split("ReadSchema: ")[1:]:
        schema_line = seg.split("\n")[0]
        assert "event_type" not in schema_line and "value" not in schema_line


def test_attribution_last_touch_single_keyed_window(spark):
    """events_attribution_last_touch (refactored onto the shared
    epoch-µs core in r17): the as-of must stay the union-trick — ONE
    user-keyed window over the tagged union, never a range self-join
    (which explodes quadratically in touches per user) — with the
    touch rollup map-side combinable and the final report aggregated
    partially before its exchange. The scan prunes to the four columns
    the query reads."""
    plan = plan_of(spark, "events_attribution_last_touch")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "SortMergeJoin" not in plan  # the as-of is a window, not a join
    # exactly one window operator (formatted mode prints nodes twice)
    assert plan.count("(") > 0 and plan.count("Window") // 2 <= 2
    assert "last(__r" in plan  # the carried-payload as-of form
    assert "partial_count" in plan and "partial_sum" in plan
    for seg in plan.split("ReadSchema: ")[1:]:
        schema_line = seg.split("\n")[0]
        # only ts/user_id/event_type/value + event_id (tie rule) survive
        assert "props" not in schema_line
