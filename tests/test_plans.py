"""Physical-plan quality gates: these queries must keep the plans that make
them scale — filters reaching the parquet scan, dimensions broadcast,
no redundant shuffles. A regression here means 'still correct, no longer
100 TB-shaped'."""

from __future__ import annotations

import pytest

from cdc_audit_spark.queries import _REGISTRY


def plan_of(spark, sf_dir, name: str) -> str:
    df = _REGISTRY[name].fn(spark, sf_dir)
    return df._jdf.queryExecution().executedPlan().toString()


def test_scan_filter_project_pushdown(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "scan_filter_project")
    assert "PushedFilters: [IsNotNull(l_orderkey), GreaterThan(l_orderkey,1000)" in plan
    # column pruning: the scan must read only the 4 projected columns
    read_schema = plan.split("ReadSchema: ")[1].split("\n")[0]
    assert "l_extendedprice" in read_schema
    assert "l_shipdate" not in read_schema and "l_comment" not in read_schema


def test_filter_conj_eq_pushdown(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "filter_conj_eq")
    # (plan strings truncate long filter lists — check the leading entries)
    assert "EqualTo(o_orderstatus,F)" in plan
    assert "IsNotNull(o_orderpriority)" in plan


def test_q5_broadcasts_dimensions(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "q5_region_revenue")
    assert "BroadcastHashJoin" in plan
    # region filter is pushed into its scan
    assert "EqualTo(r_name,ASIA)" in plan


def test_q3_broadcasts_customer_filter(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "q3_top_orders")
    assert "BroadcastHashJoin" in plan
    assert "EqualTo(c_mktsegment,BUILDING)" in plan
    # top-k must be TakeOrdered (per-partition top-k + merge), not a global sort
    assert "TakeOrderedAndProject" in plan


def test_q1_partial_aggregation(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "q1_pricing_summary")
    # map-side partial agg before the exchange, final after
    assert plan.count("HashAggregate") >= 2
    assert plan.count("Exchange hashpartitioning") == 1
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan


def test_cdc_incremental_scan_single_source_pass(spark, sf_dir):
    # the snapshot-diff join shuffles both snapshots once; no extra exchanges
    plan = plan_of(spark, sf_dir, "cdc_diff_customer")
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan


def test_asof_join_no_join_operator(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "asof_join_error_purchase")
    assert "Join" not in plan  # union-tag + window, not a range join
    assert plan.count("Exchange hashpartitioning") == 1


def test_dedup_exact_partial_agg(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "dedup_exact")
    assert plan.count("HashAggregate") >= 2  # map-side combine on the digest


def test_knn_topk_no_global_sort(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "knn_cosine_topk")
    assert "TakeOrderedAndProject" in plan


def test_q6_predicates_reach_scan(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "q6_forecast_revenue")
    # the PushedFilters list truncates in toString — assert on the data
    # filters, which mirror what reaches the scan
    assert "l_shipdate" in plan and ">= 0.05" in plan and "< 24.0" in plan
    # global agg: partial + final, single-row exchange only
    assert plan.count("HashAggregate") >= 2


def test_q18_single_fact_pass_broadcasts(spark, sf_dir):
    # one aggregation over lineitem yields both the HAVING filter and the
    # output measure; the tiny qualifying set broadcast-joins the dims —
    # no second pass over the fact table
    plan = plan_of(spark, sf_dir, "q18_large_orders")
    assert "BroadcastHashJoin" in plan
    assert plan.count("lineitem.parquet") == 1


def test_q14_broadcasts_part(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "q14_promo_revenue")
    assert "BroadcastHashJoin" in plan
    assert "GreaterThanOrEqual(l_shipdate" in plan


def test_window_running_total_single_shuffle(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "window_running_total")
    assert plan.count("Exchange hashpartitioning") == 1
    assert "RunningWindowFunction" in plan or "Window" in plan


def test_top_terms_partial_agg_before_topk(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "text_top_terms")
    assert "TakeOrderedAndProject" in plan
    assert plan.count("HashAggregate") >= 2  # map-side combine on terms


def test_q19_disjunction_pushed_to_both_scans(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "q19_disjunctive_revenue")
    # the derived single-side filters must reach each scan...
    assert "In(p_brand, [Brand#15,Brand#2,Brand#23]" in plan
    assert "LessThanOrEqual(l_quantity,30.0)" in plan
    # ...and the tiny filtered part side must broadcast
    assert "BroadcastHashJoin" in plan


def test_q21_single_lineitem_scan(spark, sf_dir):
    # the EXISTS/NOT EXISTS decorrelation must NOT re-scan the fact table:
    # one scan, one orderkey shuffle feeding the window profile
    plan = plan_of(spark, sf_dir, "q21_sole_late_supplier")
    assert plan.count("lineitem.parquet") == 1
    assert "Window" in plan


def test_hash_sample_is_map_only(spark, sf_dir):
    # deterministic sampling must stay shuffle-free: a scan + filter, nothing
    # else — this is what makes it a scan-time operation at 100 TB
    plan = plan_of(spark, sf_dir, "sample_hash_fraction")
    assert "Exchange" not in plan
    assert "Join" not in plan


def test_split_assignment_no_shuffle_before_agg(spark, sf_dir):
    # split assignment itself is map-side; the only exchange is the final
    # tiny groupBy on the split label
    plan = plan_of(spark, sf_dir, "sample_split_train_valid")
    assert plan.count("Exchange hashpartitioning") == 1
    assert plan.count("HashAggregate") >= 2  # partial agg before the shuffle


def test_pack_chunks_single_shuffle(spark, sf_dir):
    # windowed-cumsum packing: one shuffle for the group window, one for the
    # final (lang, pack) aggregate — no global sort anywhere
    plan = plan_of(spark, sf_dir, "pack_token_chunks")
    assert plan.count("Exchange rangepartitioning") == 0
    assert plan.count("Exchange hashpartitioning") <= 2


def test_q13_preserves_left_join(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "q13_order_count_distribution")
    assert "LeftOuter" in plan
    # the ON-clause priority filter reaches the orders scan
    assert "Not(EqualTo(o_orderpriority,1-URGENT))" in plan


def test_cdc_state_asof_single_log_build(spark, sf_dir):
    # The as-of replay materializes the audit log once (localCheckpoint):
    # the replay plan must read the checkpointed rows, not rebuild the
    # snapshot-diff chain per branch — r04 shipped 7 scans / 4 exchanges
    # here; the single-build shape is 1 scan / <=3 exchanges.
    plan = plan_of(spark, sf_dir, "cdc_state_asof")
    assert plan.count("Scan parquet") <= 1
    assert plan.count("Exchange") <= 3


def test_cdc_replay_state_single_log_build(spark, sf_dir):
    # Same contract for the full replay: one materialized log feeds both
    # apply_changes branches (survivor images + touched-key anti-join).
    plan = plan_of(spark, sf_dir, "cdc_replay_state")
    assert plan.count("Scan parquet") <= 1
    assert plan.count("Exchange") <= 3


def test_winnow_split_evaluated_once(spark, sf_dir):
    # Let-binding regression guard (exprs.bind): the tokenizing split and
    # the gram-hash md5 must appear as BOUND lambda variables, not as
    # captured subtrees re-evaluated per window iteration (the O(n^2)
    # shape fixed in r10 — 255 s -> 7 s at sf0.1). One split per scan
    # branch in the optimized plan is the once-per-row contract.
    from cdc_audit_spark.operators.text import winnow_fingerprints
    from cdc_audit_spark.queries import load_tables

    docs = load_tables(spark, sf_dir)["documents"]
    df = winnow_fingerprints(docs, "text", "doc_id")
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("split(") == 1
    assert plan.count("md5(") == 1


def test_decontam_grams_split_evaluated_once(spark, sf_dir):
    # Same guard for the decontamination n-gram stage.
    from cdc_audit_spark.operators.decontam import ngram_exposure
    from cdc_audit_spark.queries import load_tables

    docs = load_tables(spark, sf_dir)["documents"]
    df = ngram_exposure(docs, "text", "doc_id", n=8)
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("split(") == 1
