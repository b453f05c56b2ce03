"""Physical-plan properties — the 100 TB checklist (driver brief):
filters pushed to the parquet scan, column pruning effective, dims
broadcast, top-k avoids a global sort. These assertions are the
mechanical form of ".explain and iterate until it's the plan you'd
want"."""

from __future__ import annotations

from pwir_zadanie_4_mapreduce_spark.operators.relational import (
    join_inner_orders_customer,
    q1_pricing_summary,
    q3_shipping_priority,
    q5_region_revenue,
    topk_global_orders,
)
from pwir_zadanie_4_mapreduce_spark.plans import (
    explain_str,
    has_broadcast_join,
    has_codegen,
    has_pushed_filters,
    read_schema_columns,
)
from tests.conftest import SMOKE_SF


def test_q1_filter_pushed_to_scan(spark):
    df = q1_pricing_summary(spark, SMOKE_SF)
    assert has_pushed_filters(df), "l_shipdate predicate must reach the parquet scan"


def test_q1_column_pruning(spark):
    df = q1_pricing_summary(spark, SMOKE_SF)
    scans = read_schema_columns(df)
    assert scans, "expected a parquet scan"
    # lineitem has 11 columns; Q1 needs exactly 7
    assert all(len(cols) <= 7 for cols in scans), scans


def test_q3_broadcasts_dimensions(spark):
    assert has_broadcast_join(q3_shipping_priority(spark, SMOKE_SF))


def test_q5_broadcasts_dimensions(spark):
    assert has_broadcast_join(q5_region_revenue(spark, SMOKE_SF))


def test_inner_join_is_broadcast(spark):
    assert has_broadcast_join(join_inner_orders_customer(spark, SMOKE_SF))


def test_topk_no_global_sort(spark):
    plan = explain_str(topk_global_orders(spark, SMOKE_SF))
    assert "TakeOrderedAndProject" in plan, plan


def test_q1_whole_stage_codegen(spark):
    df = q1_pricing_summary(spark, SMOKE_SF)
    df.collect()  # finalize the AQE plan — codegen spans appear post-execution
    assert has_codegen(df), explain_str(df)


def test_asof_join_is_join_free(spark):
    """The as-of operator must compile to union + one window pass —
    no join operator, no cartesian product, no pair explosion."""
    from pwir_zadanie_4_mapreduce_spark.operators.advanced import (
        join_asof_last_click_before_purchase,
    )

    plan = explain_str(join_asof_last_click_before_purchase(spark, SMOKE_SF))
    for bad in ("SortMergeJoin", "BroadcastHashJoin", "BroadcastNestedLoopJoin", "Cartesian"):
        assert bad not in plan, f"as-of plan contains {bad}"
    assert "Window" in plan


def test_scalar_subquery_broadcasts_aggregate(spark):
    from pwir_zadanie_4_mapreduce_spark.operators.advanced import (
        subquery_scalar_small_qty,
    )

    assert has_broadcast_join(subquery_scalar_small_qty(spark, SMOKE_SF))


def test_q19_disjunction_pushed_to_both_scans(spark):
    """Q19's OR-of-conjuncts must yield per-side implied predicates on
    BOTH scans (constraint propagation), not a post-join filter only."""
    from pwir_zadanie_4_mapreduce_spark.operators.advanced import (
        q19_disjunctive_revenue,
    )

    df = q19_disjunctive_revenue(spark, SMOKE_SF)
    plan = explain_str(df)
    assert "PushedFilters: [IsNotNull(l_partkey), Or(" in plan.replace("\n", " "), plan
    assert plan.count("Or(") >= 2, "expected disjunctive pushdown on both scans"
    assert has_broadcast_join(df)


def test_sample_split_is_scan_plus_project_only(spark):
    """The split assignment must stay a projection — any Exchange
    means the operator broke its zero-shuffle contract."""
    from pwir_zadanie_4_mapreduce_spark.operators.sampling import (
        sample_split_documents,
    )

    plan = explain_str(sample_split_documents(spark, SMOKE_SF))
    assert "Exchange" not in plan, plan


def test_funnel_no_cartesian_and_partial_agg(spark):
    from pwir_zadanie_4_mapreduce_spark.operators.relational import (
        events_funnel_click_purchase,
    )

    plan = explain_str(events_funnel_click_purchase(spark, SMOKE_SF))
    assert "Cartesian" not in plan and "BroadcastNestedLoopJoin" not in plan, plan


def test_ohlc_single_shuffle(spark):
    """One groupBy → exactly one Exchange below the final agg (plus
    the orderBy's range exchange at the top)."""
    from pwir_zadanie_4_mapreduce_spark.operators.relational import (
        events_ohlc_15min,
    )

    plan = explain_str(events_ohlc_15min(spark, SMOKE_SF))
    n_hash_exchanges = plan.count("Arguments: hashpartitioning")
    assert n_hash_exchanges == 1, plan
    assert "partial_min_by" in plan, "expected map-side partial aggregation"


def test_salted_join_no_cartesian(spark):
    from pwir_zadanie_4_mapreduce_spark.operators.advanced import (
        join_salted_order_revenue,
    )

    plan = explain_str(join_salted_order_revenue(spark, SMOKE_SF))
    assert "Cartesian" not in plan
    assert "Generate" in plan, "expected the salt-replication explode"


def test_decontamination_broadcasts_bench_posting(spark):
    """The eval-set posting must be the broadcast side — the train
    corpus never shuffles for the probe."""
    from pwir_zadanie_4_mapreduce_spark.operators.text import quality_decontamination

    assert has_broadcast_join(quality_decontamination(spark, SMOKE_SF))


def test_tfidf_broadcasts_df_table(spark):
    """The vocab-sized document-frequency table broadcasts back onto
    the tf posting; the corpus-total scalar broadcasts too."""
    from pwir_zadanie_4_mapreduce_spark.operators.analytics import text_tfidf_top_terms

    assert has_broadcast_join(text_tfidf_top_terms(spark, SMOKE_SF))


def test_weighted_sample_is_scan_plus_project(spark):
    """No shuffle on the kept path: the only exchange feeds the
    broadcast max scalar; membership itself is a scan-side filter."""
    from pwir_zadanie_4_mapreduce_spark.operators.sampling import sample_weighted_quality

    plan = explain_str(sample_weighted_quality(spark, SMOKE_SF))
    # the documents scan side must not hash-repartition (sort for the
    # final orderBy is fine; the scalar agg side exchanges 1 row)
    assert plan.count("Arguments: hashpartitioning") == 0, plan


def test_interval_overlap_is_hash_join_not_cartesian(spark):
    from pwir_zadanie_4_mapreduce_spark.operators.analytics import (
        join_interval_overlap_events,
    )

    plan = explain_str(join_interval_overlap_events(spark, SMOKE_SF))
    assert "Cartesian" not in plan and "BroadcastNestedLoopJoin" not in plan, plan


def test_jaccard_count_plan_has_no_array_ops(spark):
    """The count-based exact Jaccard must never re-join the shingle
    arrays: no array_intersect anywhere in the physical plan."""
    from pwir_zadanie_4_mapreduce_spark.operators.dedup import dedup_ngram_jaccard

    plan = explain_str(dedup_ngram_jaccard(spark, SMOKE_SF))
    assert "array_intersect" not in plan, plan


def test_binned_range_join_is_hash_join(spark):
    """The binned rewrite must turn the pure range join into an equi
    hash join on the bin — never a nested-loop/cartesian plan."""
    from pwir_zadanie_4_mapreduce_spark.operators.timeseries import join_range_binned

    plan = explain_str(join_range_binned(spark, SMOKE_SF))
    assert "Cartesian" not in plan and "BroadcastNestedLoopJoin" not in plan, plan


def test_gap_fill_single_user_shuffle(spark):
    """Everything after the daily aggregate is co-partitioned by
    user_id: daily agg, bounds agg, spine join, and the fill window
    must reuse ONE user_id exchange (plus the final orderBy's range
    partition)."""
    from pwir_zadanie_4_mapreduce_spark.operators.timeseries import timeseries_gap_fill

    plan = explain_str(timeseries_gap_fill(spark, SMOKE_SF))
    assert plan.count("Arguments: hashpartitioning") <= 2, plan


def test_pack_sequences_no_global_sort_before_agg(spark):
    """The cumsum window partitions by shard (source) — there must be
    no single-partition window (a corpus-global cumsum would
    serialize the whole corpus through one task)."""
    from pwir_zadanie_4_mapreduce_spark.operators.timeseries import (
        pipeline_pack_sequences,
    )

    plan = explain_str(pipeline_pack_sequences(spark, SMOKE_SF))
    assert "SinglePartition" not in plan, plan


def test_expectations_single_scan(spark):
    """All rules compute in one pass: exactly one parquet scan of
    lineitem in the plan."""
    from pwir_zadanie_4_mapreduce_spark.operators.analytics import quality_expectations

    scans = read_schema_columns(quality_expectations(spark, SMOKE_SF))
    assert len(scans) == 1, scans


def test_bigram_lm_model_joins_broadcast(spark):
    """The unigram table and vocab scalar must broadcast — the corpus
    side never reshuffles for model lookups."""
    from pwir_zadanie_4_mapreduce_spark.operators.stats import text_bigram_lm_score

    assert has_broadcast_join(text_bigram_lm_score(spark, SMOKE_SF))


def test_bloom_probe_broadcasts_bits(spark):
    """The bloom bit set is broadcast; the probe side is map-side only."""
    from pwir_zadanie_4_mapreduce_spark.operators.stats import sketch_bloom_membership

    assert has_broadcast_join(sketch_bloom_membership(spark, SMOKE_SF))


def test_rolling_corr_no_single_partition_window(spark):
    """The sampled-anchor rewrite must not introduce a global-order
    window (SinglePartition) — per-type windows + hash agg only."""
    from pwir_zadanie_4_mapreduce_spark.operators.stats import window_rolling_corr

    plan = explain_str(window_rolling_corr(spark, SMOKE_SF))
    assert "SinglePartition" not in plan, plan


def test_training_mix_no_shuffle_before_audit(spark):
    """The mix predicate is a pure projection: exactly one exchange
    (the audit groupBy) in the whole plan."""
    from pwir_zadanie_4_mapreduce_spark.operators.sampling import pipeline_training_mix

    plan = explain_str(pipeline_training_mix(spark, SMOKE_SF))
    assert plan.count("Arguments: hashpartitioning") <= 1, plan


def test_cdc_full_outer_uses_sort_merge(spark):
    """Full-outer fact-fact joins can't broadcast: the engine must fall
    to sort-merge — together with the broadcast assertions above and
    the bucketed zero-exchange join (test_bucketing.py), all three
    join strategies are exercised and plan-verified."""
    from pwir_zadanie_4_mapreduce_spark.operators.advanced import (
        cdc_orders_snapshot_diff,
    )

    plan = explain_str(cdc_orders_snapshot_diff(spark, SMOKE_SF))
    assert "SortMergeJoin" in plan, plan


BINNED_SCALE_PATHS = [
    "agg_equidepth_histogram_binned",
    "stats_gini_revenue_binned",
    "stats_pareto_revenue_share_binned",
    "events_rfm_segments_binned",
    "agg_weighted_median_binned",
    "stats_ks_test_binned",
]


def test_binned_scale_paths_have_no_window(spark):
    """The *_binned siblings exist to replace global-window plans: the
    physical plan must contain NO Window operator at all (cumulatives
    come from bounded broadcast triangle joins) and must broadcast the
    bin tables. (SinglePartition exchanges still appear — they are the
    1-row scalar min/max aggregates, which partial-aggregate map-side
    and are scale-safe; Window over data-sized input is what must not.)"""
    from pwir_zadanie_4_mapreduce_spark.operators.registry import QUERIES

    for name in BINNED_SCALE_PATHS:
        plan = explain_str(QUERIES[name](spark, SMOKE_SF))
        assert "Window" not in plan, f"{name}: Window in plan\n{plan}"
        assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan, name


def test_reservoir_sample_no_window(spark):
    """sample_reservoir_group is the two-phase salted exact top-k: no
    Window (row_number per group would be one task per group) and two
    aggregation levels (salt cells, then groups)."""
    from pwir_zadanie_4_mapreduce_spark.operators.sampling import (
        sample_reservoir_group,
    )

    plan = explain_str(sample_reservoir_group(spark, SMOKE_SF))
    assert "Window" not in plan, plan
    assert plan.count("ObjectHashAggregate") + plan.count("HashAggregate") >= 2, plan


def test_perplexity_filter_broadcasts_model(spark):
    """The LM filter joins the corpus posting against broadcast model
    tables (unigram counts, vocab scalar, mean threshold) — no
    shuffle join on the scoring path."""
    from pwir_zadanie_4_mapreduce_spark.operators.registry import QUERIES

    plan = explain_str(QUERIES["quality_perplexity_filter"](spark, SMOKE_SF))
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan, plan


def test_lateral_topk_decorrelated(spark):
    """The LATERAL subquery must decorrelate into a partitioned window
    (with WindowGroupLimit pushdown) joined broadcast — never a
    per-outer-row re-execution (CartesianProduct / nested loop over
    the subquery)."""
    from pwir_zadanie_4_mapreduce_spark.operators.advanced import sql_api_lateral_topk

    plan = explain_str(sql_api_lateral_topk(spark, SMOKE_SF))
    assert "CartesianProduct" not in plan, plan
    assert "WindowGroupLimit" in plan, plan
    assert "BroadcastHashJoin" in plan, plan


def test_round5_windows_are_partitioned(spark):
    """The round-5 window queries (per-user feature matrix, per-shard
    curriculum) must window WITH a partition spec — an empty
    windowspecdefinition is the single-partition global sort this
    suite bans everywhere (SCALE.md). Every windowspecdefinition in
    the optimized plan must open with a partition column, never
    directly with the ordering spec."""
    import re

    from pwir_zadanie_4_mapreduce_spark.operators.analytics import (
        events_user_feature_matrix,
    )
    from pwir_zadanie_4_mapreduce_spark.operators.text import (
        pipeline_curriculum_order,
    )

    for fn, part_col in (
        (events_user_feature_matrix, "user_id"),
        (pipeline_curriculum_order, "source"),
    ):
        plan = explain_str(fn(spark, SMOKE_SF), mode="extended")
        specs = re.findall(r"windowspecdefinition\(([^,]+),", plan)
        assert specs, f"{fn.__name__}: no window found\n{plan}"
        for first_arg in specs:
            assert part_col in first_arg, (
                f"{fn.__name__}: window not partitioned by {part_col}: "
                f"{first_arg}"
            )


def test_registry_wide_plan_lint(spark):
    """Every registered query's plan, linted for the three structural
    scale-killers (the fence that keeps future additions honest):

    1. CartesianProduct: banned outright — even the declared dim×dim
       pair query must plan as a broadcast nested-loop, never a
       shuffle cartesian.
    2. Row-wise Python evaluation (BatchEvalPython*): only the three
       DECLARED slow-path surface demos (the rowwise-UDF comparison
       query and the two Python UDTFs — static-schema and
       analyze-time-polymorphic — which have no JVM spelling).
    3. Unpartitioned (global) windows: only queries whose window input
       is provably bounded — per-group AGGREGATE frames (gini/pareto/
       yoy/backlog/compaction/ks/cusum/rfm run over per-customer,
       per-month, per-day, per-file or per-bin rollups), or top-k
       capped vocab (pmi, zipf). Each data-sized exact form has a
       window-free `*_binned` sibling (test above). A NEW global
       window anywhere else is a single-partition sort at 100 TB and
       fails here.
    """
    import re

    from pwir_zadanie_4_mapreduce_spark.operators.registry import QUERIES

    PY_EVAL_OK = {
        "udf_python_rowwise_priority",
        "udtf_tokenize_positions",
        "udtf_dynamic_topk_tokens",
    }
    GLOBAL_WINDOW_OK = {
        "agg_equidepth_histogram",       # per-value counts; binned sibling
        "events_rfm_segments",           # per-user aggregate; binned sibling
        "orders_open_backlog_daily",     # per-day delta table
        "orders_yoy_revenue",            # per-month rollup
        "stats_gini_revenue",            # per-customer aggregate; binned sibling
        "stats_ks_test",                 # per-quantile grid
        "stats_pareto_revenue_share",    # per-customer aggregate; binned sibling
        "text_collocation_pmi",          # top-100 vocab pairs
        "text_zipf_fit",                 # top-k vocab ranks
        "timeseries_cusum_changepoint",  # daily series
        "warehouse_compaction_plan",     # file-metadata rows
    }

    violations: list[str] = []
    for name in sorted(QUERIES):
        plan = explain_str(QUERIES[name](spark, SMOKE_SF), mode="extended")
        if "CartesianProduct" in plan:
            violations.append(f"{name}: CartesianProduct")
        if "BatchEvalPython" in plan and name not in PY_EVAL_OK:
            violations.append(f"{name}: row-wise Python eval")
        if name not in GLOBAL_WINDOW_OK:
            for spec in re.findall(r"windowspecdefinition\((.*?)\)", plan):
                first = spec.split(",")[0].strip()
                if "ASC" in first or "DESC" in first:
                    violations.append(f"{name}: global window ({first})")
                    break
    assert not violations, "\n".join(violations)


def test_q17_single_lineitem_scan(spark):
    """The round-7 rewrite: the per-part AVG is a window over the
    brand-pruned subset, so lineitem is scanned exactly ONCE (the
    de-correlated agg-then-join-back spelling scanned it twice and
    broadcast an sf-growing per-part frame)."""
    from pwir_zadanie_4_mapreduce_spark.operators.tpch import q17_small_qty_revenue

    scans = read_schema_columns(q17_small_qty_revenue(spark, SMOKE_SF))
    li_scans = [cols for cols in scans if "l_partkey" in cols]
    assert len(li_scans) == 1, scans
    plan = explain_str(q17_small_qty_revenue(spark, SMOKE_SF))
    assert "Window" in plan, plan


def test_degree_distribution_no_predistinct(spark):
    """The round-7 rewrite: collect_set IS the (order, part) distinct,
    so the scan must NOT be pre-shuffled on the (l_orderkey,
    l_partkey) pair — that exchange (the old items.distinct()) is
    exactly what the rewrite removed."""
    import re

    from pwir_zadanie_4_mapreduce_spark.operators.analytics import (
        graph_degree_distribution,
    )

    plan = explain_str(graph_degree_distribution(spark, SMOKE_SF))
    assert not re.search(r"hashpartitioning\(l_orderkey[^)]*l_partkey", plan), plan
    # the basket-assembly exchange on the order key alone must remain
    assert re.search(r"hashpartitioning\(l_orderkey", plan), plan


def test_ivf_kmeans_sampled_query_is_narrow(spark):
    """The round-8 sampled-training IVF: codebook and query vector are
    driver-side constants, so the REGISTERED query's plan must be one
    narrow corpus scan into TakeOrderedAndProject — zero exchanges
    (training jobs run before the returned plan and are not part of
    it). This is the 100 TB contract: assignment+probe+rank never
    shuffle the corpus."""
    from pwir_zadanie_4_mapreduce_spark.operators.similarity import (
        sim_topk_ivf_kmeans_sampled,
    )

    plan = explain_str(sim_topk_ivf_kmeans_sampled(spark, SMOKE_SF))
    assert "Arguments: hashpartitioning" not in plan, plan
    assert "Exchange" not in plan, plan
    assert "TakeOrderedAndProject" in plan, plan


def test_ivf_family_assignment_is_narrow(spark):
    """Round-8: IVF-family corpus assignment must be the
    literal-codebook argmax projection, not the Window argmax — the
    Window spelling exchanged the ENTIRE corpus on vec_id (the one
    shuffle a 100 TB index build cannot afford). sim_topk_ivf's whole
    plan: scan → narrow assign → broadcast probe join → TakeOrdered —
    the only exchange allowed is the broadcast of the 4-row probe set."""
    import re

    from pwir_zadanie_4_mapreduce_spark.operators.similarity import sim_topk_ivf

    plan = explain_str(sim_topk_ivf(spark, SMOKE_SF))
    assert "Window" not in plan, plan
    assert not re.search(r"Arguments: hashpartitioning\(vec_id", plan), plan


def test_ivf_partitioned_scan_prunes(spark):
    """Round-8: the partitioned-index IVF must prune at the SOURCE —
    the executed scan carries a PartitionFilters entry on centroid_id
    and reads only the probed partitions' files (nprobe=4 of 16
    directories), not the full index."""
    from pwir_zadanie_4_mapreduce_spark.operators.similarity import (
        N_PROBE,
        sim_topk_ivf_partitioned,
    )

    df = sim_topk_ivf_partitioned(spark, SMOKE_SF)
    df.collect()  # executed plan: AQE-final + real scan metrics
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan, plan
    assert "centroid_id" in plan.split("PartitionFilters", 1)[1][:400], plan
    # executed-scan METRICS are the non-vacuous proof: the parquet
    # scan must have touched exactly nprobe partition directories
    leaves = df._jdf.queryExecution().executedPlan().collectLeaves()
    scans = []
    for i in range(leaves.size()):
        node = leaves.apply(i)
        if "Scan" in node.nodeName():
            m = node.metrics()
            if m.contains("numPartitions"):
                scans.append(m.apply("numPartitions").value())
    assert scans == [N_PROBE], (scans, plan)


def test_observe_metrics_piggyback(spark):
    """quality_observe_metrics: the metrics must ride the rollup job's
    own plan as a CollectMetrics node — not a second scan. The
    returned frame is the bounded driver-side metrics row, so the pin
    inspects the OBSERVED job's plan the same way the op builds it."""
    from pwir_zadanie_4_mapreduce_spark.catalog import load_table
    from pyspark.sql import Observation
    from pyspark.sql import functions as F

    obs = Observation("audit_pin")
    orders = load_table(spark, SMOKE_SF, "orders").observe(
        obs, F.count(F.lit(1)).alias("n_rows")
    )
    rollup = orders.groupBy("o_orderstatus").agg(F.count("*").alias("n"))
    plan = explain_str(rollup)
    assert "CollectMetrics" in plan, plan[:2000]
    # exactly one scan NODE (formatted explain prints each node once in
    # the tree and once in the detail section): zero extra passes
    import re

    assert len(re.findall(r"\(\d+\) Scan parquet", plan)) == 1, plan[:2000]


def test_parameterized_sql_pushes_bound_literals(spark):
    """sql_api_parameterized_revenue: analyzer-bound parameters must
    constant-fold like inline literals — the o_totalprice predicate
    reaches the parquet scan as a pushed filter."""
    from pwir_zadanie_4_mapreduce_spark.operators.advanced import (
        sql_api_parameterized_revenue,
    )

    df = sql_api_parameterized_revenue(spark, SMOKE_SF)
    assert has_pushed_filters(df), "bound :min_price must push to the scan"


def test_collated_grouping_single_exchange(spark):
    """scalar_collated_grouping: a collated groupBy is still one
    partial-agg + one exchange — collation changes comparison
    semantics, not the aggregation topology."""
    from pwir_zadanie_4_mapreduce_spark.operators.advanced import (
        scalar_collated_grouping,
    )

    plan = explain_str(scalar_collated_grouping(spark, SMOKE_SF))
    assert plan.count("Arguments: hashpartitioning") <= 1, plan[:2000]


def test_repeated_spans_joins_on_digest_and_prunes(spark):
    """dedup_repeated_spans: span STRINGS never shuffle — the
    frequency join keys on the md5 digest, and both corpus scans are
    column-pruned to what the span cut needs."""
    from pwir_zadanie_4_mapreduce_spark.operators.dedup import (
        dedup_repeated_spans,
    )

    df = dedup_repeated_spans(spark, SMOKE_SF)
    scans = read_schema_columns(df)
    assert scans and all(set(c) <= {"doc_id", "text"} for c in scans), scans
    plan = explain_str(df)
    for line in plan.splitlines():
        if "hashpartitioning" in line:
            assert "text" not in line, line  # digests shuffle, not text


def test_semantic_centroid_assignment_is_exchange_free(spark):
    """dedup_semantic_centroid: the codebook rides the plan as
    literals, so centroid assignment adds NO exchange — the only
    shuffles are the in-cluster pair join and the witness agg (plus
    AQE reuse), never a Window over the corpus."""
    from pwir_zadanie_4_mapreduce_spark.operators.dedup import (
        dedup_semantic_centroid,
    )

    plan = explain_str(dedup_semantic_centroid(spark, SMOKE_SF))
    assert "Window" not in plan, plan[:2000]
    assert plan.count("Arguments: hashpartitioning") <= 3, plan[:2000]


def test_dfcap_posting_join_pinned_to_sort_merge(spark):
    """r11's key 100 TB fix (dedup.py:245): the under-cap posting join
    must stay SortMergeJoin. `rare` is a corpus-sized post-aggregate
    whose Catalyst row estimate stays tiny forever, so without the
    explicit merge hint Catalyst BROADCASTS it (8 GB driver overflow at
    sf10; impossible at 100 TB). The rare side projects to the bare
    shingle-hash column, so the pin is: no BroadcastExchange build side
    may output exactly ["h"]. Dropping the hint recreates that exchange
    even at smoke scale (verified) and fails here. Downstream broadcasts
    of the bounded candidate-pair / stop-count relations stay legal."""
    from pwir_zadanie_4_mapreduce_spark.operators.dedup import (
        dedup_ngram_jaccard_dfcap,
    )
    from pwir_zadanie_4_mapreduce_spark.plans import broadcast_build_outputs

    df = dedup_ngram_jaccard_dfcap(spark, SMOKE_SF)
    builds = broadcast_build_outputs(df)
    assert ["h"] not in builds, (
        f"corpus-sized under-cap posting is being broadcast: {builds}"
    )
    assert "SortMergeJoin" in explain_str(df), "merge pin lost entirely"


def test_substring_span_self_join_pinned_to_sort_merge(spark):
    """r11's second merge pin (dedup.py:1270): the positional-posting
    self-join has corpus-sized relations on BOTH sides — nothing in
    this plan may ever broadcast. Dropping the hint turns the self-join
    into a BroadcastHashJoin at smoke scale (verified) and fails here."""
    from pwir_zadanie_4_mapreduce_spark.operators.dedup import dedup_substring_span

    plan = explain_str(dedup_substring_span(spark, SMOKE_SF))
    assert "SortMergeJoin" in plan, plan[:2000]
    for bad in ("BroadcastHashJoin", "BroadcastNestedLoopJoin", "Cartesian"):
        assert bad not in plan, f"substring-span plan contains {bad}"


def test_gopher_rules_single_scan_single_agg(spark):
    """quality_gopher_rules: N rules = ONE corpus scan + one hash agg
    on source (plan width, not pass count) — the quality_expectations
    property restated for the text gate."""
    import re

    from pwir_zadanie_4_mapreduce_spark.operators.text import (
        quality_gopher_rules,
    )

    plan = explain_str(quality_gopher_rules(spark, SMOKE_SF))
    assert len(re.findall(r"\(\d+\) Scan parquet", plan)) == 1, plan[:2000]
    assert plan.count("Arguments: hashpartitioning") <= 1, plan[:2000]


def test_runtime_bloom_filter_injected(spark):
    """join_runtime_bloom_revenue in the regime a 100 TB run lands in:
    broadcast off (the fact join becomes a shuffle join) + bloom
    thresholds opened ⇒ InjectRuntimeFilter plants a bloom_filter_agg
    over the filtered orders side and a might_contain predicate on the
    lineitem side — fact rows for non-qualifying orders die AT THE
    SCAN, before the exchange. Separate SQLConf via newSession() so
    the shared fixture session keeps its broadcast behavior."""
    from pwir_zadanie_4_mapreduce_spark.operators.advanced import (
        join_runtime_bloom_revenue,
    )

    s2 = spark.newSession()
    s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    s2.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    s2.conf.set("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "1GB")
    s2.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0"
    )
    df = join_runtime_bloom_revenue(s2, SMOKE_SF)
    opt = df._jdf.queryExecution().optimizedPlan().toString()
    assert "bloom_filter_agg" in opt, opt[:2000]
    assert "might_contain" in opt, opt[:2000]
    # and the filtered result is identical to the broadcast-regime run
    base = join_runtime_bloom_revenue(spark, SMOKE_SF).collect()
    assert [tuple(r) for r in df.collect()] == [tuple(r) for r in base]


def test_scd2_pit_join_is_hash_join_and_never_amplifies(spark):
    """PIT lookup must compile to an equi hash join with the validity
    range as residual (never nested-loop/cartesian), and [from, to)
    intervals partition each key's timeline so no fact row can match
    two versions."""
    from pyspark.sql import functions as F2

    from pwir_zadanie_4_mapreduce_spark.operators.analytics import (
        join_scd2_point_in_time,
    )

    df = join_scd2_point_in_time(spark, SMOKE_SF)
    plan = explain_str(df)
    for bad in ("BroadcastNestedLoopJoin", "CartesianProduct"):
        assert bad not in plan, f"PIT join plan contains {bad}"
    dup = df.groupBy("event_id").count().filter(F2.col("count") > 1).count()
    assert dup == 0
