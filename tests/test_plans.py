"""Physical-plan assertions: the scale guarantees SURVEY.md §6 claims
(pushdown, broadcast, partial agg, TopK, no cartesian products) must
be visible in the executed plan, not just intended.
"""

from __future__ import annotations

import contextlib
import io
import re

import pytest

from tests.conftest import SMOKE_SF


def plan_of(df, mode: str = "formatted") -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


@pytest.fixture(scope="module")
def queries():
    import __spark_entry__ as e

    return e.queries()


def test_filters_are_pushed_to_scan(spark, queries):
    plan = plan_of(queries["filter_tag_entities"](spark, SMOKE_SF))
    assert "PushedFilters" in plan
    assert "GreaterThan(c_acctbal" in plan  # predicate reached parquet


def test_scan_prunes_columns(spark, queries):
    plan = plan_of(queries["earliest_year_per_entity"](spark, SMOKE_SF))
    # Only the two needed columns are read from the 6-column table.
    assert "ReadSchema: struct<o_custkey:bigint,o_orderdate:timestamp_ntz>" in plan


def test_dim_joins_broadcast(spark, queries):
    plan = plan_of(queries["enrich_join_dims"](spark, SMOKE_SF), "simple")
    assert plan.count("BroadcastHashJoin") == 2
    assert "SortMergeJoin" not in plan


def test_flagship_broadcasts_dims(spark, queries):
    plan = plan_of(queries["flagship_service_area_report"](spark, SMOKE_SF))
    assert plan.count("BroadcastHashJoin") >= 2
    assert "CartesianProduct" not in plan


def test_agg_is_partial(spark, queries):
    plan = plan_of(queries["agg_stats_by_group"](spark, SMOKE_SF))
    # partial (map-side) + final aggregate around one exchange
    assert plan.count("HashAggregate") >= 2
    assert "PushedFilters" in plan and "l_shipdate" in plan


def test_topk_avoids_full_sort(spark, queries):
    plan = plan_of(queries["top_revenue_orders"](spark, SMOKE_SF))
    assert "TakeOrderedAndProject" in plan


def test_spatial_join_is_broadcast_not_cartesian(spark, queries):
    plan = plan_of(queries["geo_point_in_polygon"](spark, SMOKE_SF))
    # Non-equi range prefilter → broadcast nested loop over the tiny
    # polygon side; never a cartesian product of the point side.
    assert "BroadcastNestedLoopJoin" in plan
    assert "CartesianProduct" not in plan


def test_no_cartesian_anywhere(spark, queries):
    for name, fn in queries.items():
        plan = plan_of(fn(spark, SMOKE_SF), "simple")
        assert "CartesianProduct" not in plan, name


def test_quartiles_have_no_partition_sort(spark, queries):
    # VERDICT r1: ntile() would sort each event_type's entire row set
    # in one reducer. The cutoff formulation must show a broadcast
    # join and NO window/sort over the event rows.
    plan = plan_of(queries["events_value_quartiles"](spark, SMOKE_SF), "simple")
    assert "BroadcastHashJoin" in plan
    assert "Window" not in plan and "ntile(4)" not in plan
    # the only shuffle is the tiny partial-percentile state exchange;
    # event rows are never range-partitioned/sorted
    assert "rangepartitioning" not in plan
    assert "partial_percentile" in plan
    assert plan.count("Exchange hashpartitioning") == 1


def test_no_row_at_a_time_python_udf_anywhere(spark, queries):
    """Python must only ever appear Arrow-batched (ArrowEvalPython /
    MapInPandas / FlatMapGroupsInPandas) — a BatchEvalPython node is
    a row-at-a-time UDF, the 10-100x-slower path SURVEY §6 bans."""
    for name, fn in queries.items():
        plan = plan_of(fn(spark, SMOKE_SF), "simple")
        assert "BatchEvalPython" not in plan, name


def test_semi_join_for_exists(spark, queries):
    plan = plan_of(queries["orders_with_late_items"](spark, SMOKE_SF), "simple")
    assert "LeftSemi" in plan  # EXISTS decorrelates, never duplicates rows


def test_dormant_customers_anti_join_and_pushdown(spark, queries):
    plan = plan_of(queries["dormant_high_balance_customers"](spark, SMOKE_SF))
    assert "LeftAnti" in plan
    # recent-order date filter reaches the orders parquet scan
    assert "GreaterThanOrEqual(o_orderdate" in plan


def test_cube_is_single_expand_pass(spark, queries):
    plan = plan_of(queries["order_status_priority_cube"](spark, SMOKE_SF), "simple")
    assert "Expand" in plan  # grouping sets expand once
    assert plan.count("Scan parquet") == 1  # no rescan per grouping set


def test_corpus_pipeline_single_shuffle_semi_join(spark, queries):
    plan = plan_of(queries["corpus_clean_sample"](spark, SMOKE_SF), "simple")
    assert "LeftSemi" in plan
    assert "CartesianProduct" not in plan


def test_overlay_pairs_broadcast_prefilter(spark, queries):
    plan = plan_of(queries["geo_union_overlap_area"](spark, SMOKE_SF), "simple")
    # bbox inequality join broadcasts the tiny polygon side; the
    # Arrow overlay UDF only ever sees candidate pairs
    assert "BroadcastNestedLoopJoin" in plan
    assert "CartesianProduct" not in plan


def test_q6_fully_pushed_single_scan(spark, queries):
    plan = plan_of(queries["simple_revenue_delta"](spark, SMOKE_SF))
    # every predicate reaches the parquet scan; no join, no wide shuffle
    assert "PushedFilters" in plan and "LessThan(l_quantity,24.0)" in plan
    assert "Join" not in plan
    simple = plan_of(queries["simple_revenue_delta"](spark, SMOKE_SF), "simple")
    assert simple.count("Scan parquet") == 1


def test_q10_topk_and_broadcast_nation(spark, queries):
    plan = plan_of(queries["returned_item_report"](spark, SMOKE_SF))
    assert "TakeOrderedAndProject" in plan  # never a full sort for LIMIT 20
    assert "BroadcastHashJoin" in plan
    # returnflag filter reaches the lineitem scan
    assert "EqualTo(l_returnflag,R)" in plan


def test_q11_total_is_broadcast_not_window(spark, queries):
    df = queries["part_revenue_concentration"](spark, SMOKE_SF)
    # global total joins back as a one-row broadcast; the per-part agg
    # is never window-sorted in a single partition
    plan = plan_of(df, "simple")
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    assert "Window" not in plan
    # the scalar-total branch must REUSE the per-part agg's shuffle at
    # runtime (exchange reuse), not rescan lineitem
    df.collect()
    final = plan_of(df, "simple")
    assert "ReusedExchange" in final


def test_q15_scalar_max_broadcast(spark, queries):
    plan = plan_of(queries["top_revenue_supplier"](spark, SMOKE_SF), "simple")
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    assert "Window" not in plan


def test_q20_semi_join_before_agg(spark, queries):
    plan = plan_of(queries["excess_quantity_suppliers"](spark, SMOKE_SF), "simple")
    assert "LeftSemi" in plan  # part-name IN(...) never duplicates fact rows
    assert "CartesianProduct" not in plan


def test_q21_decorrelates_to_one_agg(spark, queries):
    # the EXISTS/NOT EXISTS pair must not rescan lineitem per side
    plan = plan_of(queries["supplier_order_exclusivity"](spark, SMOKE_SF), "simple")
    assert plan.count("Scan parquet") <= 2


def test_chunk_split_is_map_only(spark, queries):
    plan = plan_of(queries["docs_chunk_split"](spark, SMOKE_SF), "simple")
    # doc → chunks expands in place: no shuffle, no join, no Python
    assert "Exchange" not in plan
    assert "Join" not in plan
    assert "Python" not in plan


def test_pack_sequences_single_window_pass(spark, queries):
    plan = plan_of(queries["docs_pack_sequences"](spark, SMOKE_SF), "simple")
    # one shuffle on the shard key feeds the one window pass
    assert plan.count("Exchange hashpartitioning") == 1
    assert plan.count("Window") == 1


def test_redact_pii_is_map_only(spark, queries):
    plan = plan_of(queries["text_redact_pii"](spark, SMOKE_SF), "simple")
    assert "Exchange" not in plan and "Join" not in plan


def test_benchmark_overlap_broadcasts_bench_side(spark, queries):
    plan = plan_of(queries["docs_benchmark_overlap"](spark, SMOKE_SF), "simple")
    # the benchmark gram set builds the broadcast side; the corpus is
    # never shuffled on the gram key for the join itself
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


def test_funnel_single_fold_no_per_stage_rescan(spark, queries):
    plan = plan_of(queries["event_funnel_conversion"](spark, SMOKE_SF), "simple")
    # one collect+fold pass, not three correlated joins: events scanned
    # at most twice (fold + distinct-users), never per funnel stage
    assert plan.count("Scan parquet") <= 2
    assert "CartesianProduct" not in plan
    assert "Python" not in plan  # fold is a JVM higher-order aggregate


def test_fuzzy_match_is_blocked_join(spark, queries):
    plan = plan_of(queries["fuzzy_match_part_names"](spark, SMOKE_SF), "simple")
    # blocking key join (equi on first char + length band), then
    # levenshtein only on candidates — never an all-pairs product
    assert "CartesianProduct" not in plan
    assert "levenshtein" in plan


def test_repetition_signals_no_join_single_gram_shuffle(spark, queries):
    """r17 strengthened the r11 shape (one tagged explode + partial
    agg) to a pure in-row run-length fold: still no Join — and now no
    aggregation or explode at all (see also the map-only pin in
    test_r17_perf.py)."""
    plan = plan_of(queries["docs_repetition_signals"](spark, SMOKE_SF))
    assert "Join" not in plan
    assert "HashAggregate" not in plan
    assert "Generate" not in plan


def test_domain_quota_two_phase_windows(spark, queries):
    """The exact top-K must be the salted two-phase shape: two Window
    nodes (per-(source,salt) then per-source over survivors), never a
    single global window over raw data."""
    plan = plan_of(queries["domain_quota_sample"](spark, SMOKE_SF))
    assert plan.count("Window") >= 2
    assert "CartesianProduct" not in plan


def test_curation_funnel_quota_two_phase_salted(spark, queries):
    """r8 verdict item 1: the stage-4 per-source quota must be the
    exact two-phase salted top-K (phase 1 per (source, salt-bucket),
    phase 2 per source over <= SALT*K survivors) — never a single
    row_number window sorting a whole hot source's survivors on one
    reducer — and the <= n_sources*K keep-set must join back as a
    broadcast onto the lineage-cut stage frame."""
    plan = plan_of(queries["curation_funnel_report"](spark, SMOKE_SF))
    # phase 1 partitions by (source, salt-bucket); phase 2 by source
    assert re.search(r"windowspecdefinition\(source#\d+, sb#\d+,", plan)
    assert re.search(r"windowspecdefinition\(source#\d+, rk#\d+", plan)
    # exactly the two quota windows — no third (single-phase) window
    # over the full survivor frame anywhere in the plan
    assert len(re.findall(r"windowspecdefinition", plan)) == 2
    assert "BroadcastHashJoin" in plan  # keep-set join-back
    # the stage frame is materialized once (checkpoint), not re-run
    # per consumer
    assert "ExistingRDD" in plan
    assert "CartesianProduct" not in plan


def test_rfm_no_global_sort_no_ntile(spark, queries):
    """Quartiles come from a broadcast scalar-percentile aggregate —
    the plan must not contain a global (partition-less) Sort feeding a
    window, which is what ntile would require."""
    plan = plan_of(queries["customer_rfm_segments"](spark, SMOKE_SF))
    # no Window node anywhere: ntile would need one (checking the
    # substring "ntile" is a trap — "percentile" contains it)
    assert "Window" not in plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan


def test_hll_registers_stay_jvm_side(spark, queries):
    """The explicit sketch is codegen end-to-end: no Python evaluation
    and two aggregation levels (register max, harmonic sum)."""
    plan = plan_of(queries["hll_registers_users"](spark, SMOKE_SF))
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
    assert plan.count("HashAggregate") >= 2


def test_ivf_sqrtn_uses_arrow_kernel_not_crossjoin(spark, queries):
    """At C ≥ 64 the corpus→cell assignment must be the blocked Arrow
    kernel — ONE MapInPandas — never an n×C crossJoin row explosion
    (the interpreted fold measured ~2 h extrapolated at 1M×C=1000)."""
    plan = plan_of(queries["ann_ivf_sqrtn_topk"](spark, SMOKE_SF))
    assert "MapInPandas" in plan
    assert "CartesianProduct" not in plan


def test_minhash_verified_semi_filters_before_pair_join(spark, queries):
    """The exact-verify stage must be candidate-proportional: the
    shingle stream is LeftSemi-filtered to candidate docs before any
    pair-shingle join. Built with cut_lineage=False — the registered
    query's eager checkpoints truncate the visible plan (that cut is
    pinned separately below)."""
    from utility_service_areas_spark.operators.dedup import (
        minhash_verified_pairs,
    )
    from utility_service_areas_spark.sources.tables import load_table

    docs = load_table(spark, SMOKE_SF, "documents")
    plan = plan_of(
        minhash_verified_pairs(docs, "doc_id", "text", cut_lineage=False)
    )
    assert "LeftSemi" in plan
    assert "CartesianProduct" not in plan


def test_minhash_verified_lineage_cut_truncates_recompute(spark, queries):
    """The registered verified/estimator queries must materialize the
    candidate and filtered-shingle frames once: without the cut the
    triple/quadruple consumption re-ran the whole minhash pipeline per
    branch (58-64 parquet scans in one plan, r8 audit). After the cut
    the final plan reads only checkpointed RDDs — at most a couple of
    scans may remain, never the recompute explosion."""
    for key in ("dedup_minhash_verified", "minhash_estimator_quality"):
        plan = plan_of(queries[key](spark, SMOKE_SF), "simple")
        n_scans = plan.count("Scan parquet")
        assert n_scans <= 4, f"{key}: {n_scans} parquet scans"
        assert "ExistingRDD" in plan


def test_quantize_scales_broadcast_corpus_unshuffled(spark, queries):
    """Codes/SSE are array lambdas over a 1-row broadcast scales dim:
    the corpus side must have no hash-partition exchange (the only
    aggregation shuffles the 64-row dim stats)."""
    plan = plan_of(queries["embedding_quantize_int8"](spark, SMOKE_SF))
    assert "BroadcastExchange" in plan
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


def test_incremental_ingest_is_asymmetric(spark, queries):
    """New-batch × old-corpus only: the band self-join must carry the
    new/old filters (no unfiltered corpus self-join) and stay
    cartesian-free."""
    plan = plan_of(queries["dedup_incremental_ingest"](spark, SMOKE_SF), "simple")
    assert "CartesianProduct" not in plan
    assert plan.count("SortMergeJoin") + plan.count("BroadcastHashJoin") >= 2


def test_cms_counter_table_broadcasts(spark, queries):
    """The d*w=4096-row CMS counter table must broadcast to the probe
    join — never a shuffle of the token stream against it."""
    plan = plan_of(queries["cms_token_counts"](spark, SMOKE_SF), "simple")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


def test_shard_manifest_one_row_broadcast(spark, queries):
    """The shard count is a 1-row broadcast onto the scan; assignment
    is map-side and the only real shuffle keys on the shard id."""
    plan = plan_of(queries["docs_shard_manifest"](spark, SMOKE_SF), "simple")
    assert "BroadcastNestedLoopJoin" in plan  # the 1-row n_shards frame
    assert "SortMergeJoin" not in plan


def test_pq_corpus_never_shuffled_encode_is_one_pass(spark, queries):
    """PQ+refine: exactly one MapInPandas (the fused all-subspace
    encode), queries and shortlist broadcast, the corpus never enters
    a SortMergeJoin, and no row-at-a-time Python anywhere."""
    plan = plan_of(queries["ann_pq_topk"](spark, SMOKE_SF), "simple")
    assert plan.count("MapInPandas") == 1
    assert plan.count("BroadcastHashJoin") >= 2
    assert "SortMergeJoin" not in plan
    assert "BatchEvalPython" not in plan
    assert "CartesianProduct" not in plan


def test_gapfill_ffill_window_is_calendar_bounded(spark, queries):
    """The only corpus pass is the partial-agged groupBy to
    (priority, day); the ffill window partitions by priority over
    calendar rows. Exactly one Window; the dense left join must not
    sort-merge (both sides are calendar-sized)."""
    plan = plan_of(queries["orders_daily_gapfill"](spark, SMOKE_SF), "simple")
    assert plan.count("Window") == 1
    assert "partial_sum" in plan  # map-side combine on the corpus agg
    assert "CartesianProduct" not in plan


def test_audience_overlap_is_bitmask_not_self_join(spark, queries):
    """Set intersection via per-user bit_or masks against a 10-row
    broadcast pair dim — never a fact-table self-join (no
    SortMergeJoin at all; one BroadcastNestedLoopJoin)."""
    plan = plan_of(queries["event_audience_overlap"](spark, SMOKE_SF), "simple")
    assert "SortMergeJoin" not in plan
    assert "BroadcastNestedLoopJoin" in plan
    assert plan.count("partial_bit_or") >= 1 or "bit_or" in plan


def test_bootstrap_partial_agg_before_replicate_shuffle(spark, queries):
    """The explode(64) must combine map-side: partial_sum per
    replicate BEFORE the exchange, so the only corpus-wide shuffle
    carries 64 x partitions rows; the CI scalars broadcast onto the
    point estimate."""
    plan = plan_of(queries["revenue_bootstrap_ci"](spark, SMOKE_SF), "simple")
    assert "partial_sum(wc" in plan
    assert "BroadcastNestedLoopJoin" in plan
    assert plan.count("Window") == 1  # the 64-row rank stage only


def test_pareto_front_two_phase_skyline(spark, queries):
    """Skyline-of-skylines: phase 1 windows partition by the 64-way
    bucket (parallel local fronts), phase 2 runs the exact window
    over survivors only. Exactly two Window nodes, first bucketed."""
    plan = plan_of(queries["orders_pareto_front"](spark, SMOKE_SF), "formatted")
    assert len(re.findall(r"windowspecdefinition", plan)) == 2
    assert re.search(r"windowspecdefinition\(sb#\d+, neg#\d+", plan)


def test_asof_tolerance_is_one_window_no_join(spark, queries):
    """The bounded-lookback as-of keeps the union-marker shape: one
    window pass, zero join operators (the tolerance is a map-side
    post-filter, not a second inequality join)."""
    plan = plan_of(queries["events_asof_tolerance"](spark, SMOKE_SF), "simple")
    assert plan.count("Window") == 1
    assert "Join" not in plan


def test_cluster_quality_one_assign_pass_broadcast_sep(spark, queries):
    """One Arrow-batched assignment pass, a k-row partial agg, and the
    k x k separation attached as a broadcast — the corpus never
    enters a shuffle join."""
    plan = plan_of(queries["kmeans_cluster_quality"](spark, SMOKE_SF), "simple")
    assert plan.count("MapInPandas") == 1
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_knn_areas_is_map_only(spark, queries):
    """k-NN against the driver-inlined dim must be ONE map pass:
    no Exchange, no join, no Window anywhere in the plan."""
    plan = plan_of(queries["geo_knn_areas"](spark, SMOKE_SF), "simple")
    assert "Exchange" not in plan
    assert "Join" not in plan and "Window" not in plan


def test_nearest_area_is_map_only(spark, queries):
    """r9 retrofit: 1-NN against the driver-inlined dim is one map
    pass — no Exchange, no join, no aggregate shuffle."""
    plan = plan_of(queries["geo_nearest_area"](spark, SMOKE_SF), "simple")
    assert "Exchange" not in plan
    assert "Join" not in plan and "HashAggregate" not in plan


def test_ewma_taps_fuse_into_one_window_one_sort(spark, queries):
    """The 16 dyadic lag taps must compile into ONE Window node
    stacked on the ffill window over the same partition+sort: exactly
    two Window nodes, exactly one Sort (no re-sort between them)."""
    plan = plan_of(queries["orders_daily_ewma"](spark, SMOKE_SF), "simple")
    assert plan.count("Window") == 2
    assert plan.count("Sort ") == 1


def test_dq_audit_no_duplicate_corpus_scans(spark, queries):
    """The five orders-rule rows and two lineitem-rule rows must read
    their 1-row lineage-cut stats, not re-scan the facts: at most one
    orders scan (the orphan anti-join) and zero lineitem scans in the
    final plan."""
    plan = plan_of(queries["data_quality_audit"](spark, SMOKE_SF), "simple")
    assert plan.count("orders.parquet") <= 1
    assert plan.count("lineitem.parquet") == 0
    assert "CartesianProduct" not in plan


def test_length_drift_single_partial_shuffle(spark, queries):
    """Drift score: one partial-agged shuffle on (source, bin), one on
    source — no join, no window, map-side combine visible."""
    plan = plan_of(queries["source_length_drift"](spark, SMOKE_SF), "simple")
    assert "Join" not in plan and "Window" not in plan
    assert "partial_sum" in plan
    assert plan.count("Exchange") == 2


def test_abc_prefix_sum_is_two_phase(spark, queries):
    """The cumulative share must never put the full parts frame on
    one reducer: the running sum windows partition by the digit band,
    and the only unpartitioned window is the <=19-row band-offset
    frame."""
    plan = plan_of(queries["part_abc_classification"](spark, SMOKE_SF), "formatted")
    specs = re.findall(r"windowspecdefinition\(([^)]*)\)", plan)
    assert len(specs) == 2
    # the per-decade running sum: PARTITION BY digits, ORDER BY cents
    banded = [s for s in specs if re.match(r"digits#\d+, cents#", s)]
    assert len(banded) == 1
    # the only unpartitioned window is the <=19-row offset frame
    # (ORDER BY digits DESC, no partition columns)
    offset = [s for s in specs if re.match(r"digits#\d+ DESC", s)]
    assert len(offset) == 1


def test_collocations_in_row_pairs_no_self_join(spark, queries):
    """Pairs must come from the in-row combination lambda over the
    per-doc basket, never a doc-token self-join: the only joins are
    the broadcast vocab semi-filter and the two broadcast marginal
    attaches — no SortMergeJoin anywhere."""
    plan = plan_of(queries["token_collocations"](spark, SMOKE_SF), "simple")
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "Generate" in plan  # the in-row pair explode
