"""Physical-plan regression net: the properties that make these
queries scale must survive refactors. Plans only — nothing executes."""

from __future__ import annotations

import pytest

from evolution_data_warehouse_spark.queries import REGISTRY

# Queries where a BroadcastNestedLoopJoin is the intended plan (tiny
# broadcast side by construction):
# - text_tfidf: 1-row corpus-size aggregate cross-joined into the plan
#   (replaces a separate driver-side count job)
# - view_dashboard_twograin: geo × year spine (|nation| × |years|,
#   both bounded dimension-sized inputs)
# - tpch_q22 / tpch_q11 / emb_norm_outliers: 1-row scalar-aggregate
#   broadcast (above-average-balance threshold / total stock value /
#   corpus norm stats), same pattern as text_tfidf
_BNL_OK = {
    "join_cross",
    "sim_ann_bruteforce",
    "udtf_rls_predicate",
    "text_tfidf",
    "view_dashboard_twograin",
    "tpch_q22",
    "tpch_q11",
    "emb_norm_outliers",
    "agg_sketch_union",
    "agg_approx_sample_mean",
    "geo_nearest_hub",  # 5-row hub table cross join, broadcast
    "agg_benford_firstdigit",  # 1-row total-count broadcast, 9-row left side
    "agg_rfm_segments",  # 1-row anchor-date broadcast over the user grain
    "agg_market_basket",  # 1-row basket-count broadcast into the pair stats
    "corpus_mix_temperature",  # 1-row n_min broadcast into language thresholds
    "text_keywords_topk",  # 1-row corpus-size broadcast into the idf score
    "agg_pareto_deciles",  # 1-row revenue-total broadcast into the shares
    "corpus_token_drift",  # 1-row half-totals broadcast into the L1 terms
    "graph_copurchase_triangles",  # 1-row edge-count broadcast beside the count
    "agg_cramers_v",  # 1-row N / r / c broadcasts into the chi-square cells
    "agg_theil_index",  # 1-row total/count broadcast into the term scan
    "ts_weekday_seasonality",  # 1-row total broadcast over the 7-row profile
    "event_cooccurrence_pmi",  # 1-row basket-count broadcast into the PMI
    "surv_kaplan_meier",  # 1-row observation-horizon broadcast over user spans
    "stats_ks_two_sample",  # 1-row (n1, n2) totals broadcast into the CDF scan
    "proc_zorder_report",  # 1-row grid min/max broadcast into the curve math
    "ts_revenue_anomaly_months",  # 1-row moments broadcast into the z-scores
    "agg_heavy_hitters_mg",  # 1-row n_total broadcast into the certificate
    "ts_cusum_drift",  # 1-row total/day-count broadcast into the CUSUM terms
    "agg_kmv_overlap",  # 1-row theta + p_common broadcasts over <=2k sketch rows
    "decontaminate_semantic",  # 25-row eval-set broadcast, corpus streams once
    "stats_bootstrap_ci",  # 1-row point-estimate x 1-row CI broadcast
    "ts_acf_lag1",  # 1-row series-mean broadcast over the daily frame
}


def _plan(spark, sf_dir, name: str) -> str:
    df = REGISTRY[name].fn(spark, sf_dir)
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_no_row_python_udf(spark, sf_dir, name):
    # Built-ins or Arrow-batched Pandas ops only — BatchEvalPython is
    # the row-at-a-time serde path and must never appear.
    assert "BatchEvalPython" not in _plan(spark, sf_dir, name)


@pytest.mark.parametrize("name", sorted(set(REGISTRY) - _BNL_OK))
def test_no_accidental_nested_loop(spark, sf_dir, name):
    assert "BroadcastNestedLoopJoin" not in _plan(spark, sf_dir, name)


def test_flagship_star_join_is_broadcast(spark, sf_dir):
    plan = _plan(spark, sf_dir, "join_inner_equi")
    assert plan.count("BroadcastHashJoin") == 4  # orders + 3 dims
    assert "SortMergeJoin" not in plan


def test_spatial_grid_join_is_cell_keyed_broadcast(spark, sf_dir):
    """The radius join must go through the (cx, cy) grid-cell equi-join
    — BroadcastHashJoin on cell keys, never a nested-loop over the
    distance predicate (the plan difference between bounded candidates
    and all-pairs at scale)."""
    plan = _plan(spark, sf_dir, "join_spatial_grid")
    assert "BroadcastHashJoin [cx" in plan  # candidate join keyed on cells
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_filter_pushdown_reaches_scan(spark, sf_dir):
    plan = _plan(spark, sf_dir, "filter_threshold")
    assert "PushedFilters: [IsNotNull(c_acctbal), GreaterThanOrEqual(c_acctbal,1000.0)" in plan.replace("\n", "")


def test_column_pruning_on_projection(spark, sf_dir):
    plan = _plan(spark, sf_dir, "proj_select")
    # The scan must read exactly the three projected columns.
    assert "ReadSchema: struct<c_custkey:bigint,c_name:string,c_acctbal:double>" in plan


def test_topn_avoids_full_sort(spark, sf_dir):
    plan = _plan(spark, sf_dir, "win_topn_recent")
    assert "TakeOrderedAndProject" in plan


def test_stratified_sample_uses_window_group_limit(spark, sf_dir):
    # rank<=k must push below the per-stratum sort (bounded per-
    # partition heaps) — a full per-stratum sort would not survive
    # billion-row strata.
    assert "WindowGroupLimit" in _plan(spark, sf_dir, "sample_stratified_hash")


def test_hash_split_has_no_exchange(spark, sf_dir):
    # The split is a pure projection over the scan: any Exchange means
    # someone introduced a shuffle into a map-only operator.
    assert "Exchange" not in _plan(spark, sf_dir, "split_train_hash")


def test_minhash_guard_shares_pair_join_exchange(spark, sf_dir):
    # The hot-bucket guard (window count over (band, band_key)) must
    # reuse the pair self-join's shuffle, not add its own: both sides
    # of the self-join share the guarded subtree, so ReusedExchange
    # appears. Losing it re-created the r3 2.1x regression
    # (groupBy+join guard formulation). Asserted under the static
    # planner — with AQE on the same reuse happens at runtime via
    # stage-level exchange reuse, which a plan-only test can't see.
    prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        plan = _plan(spark, sf_dir, "dedup_minhash_lsh")
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", prev)
    assert "ReusedExchange" in plan
    assert "Window" in plan


def test_pack_sequences_sorts_per_shard_not_globally(spark, sf_dir):
    # The running-sum window partitions by shard: the sort under it must
    # be a local (non-global) sort after a hash repartition on shard —
    # a global sort (Exchange rangepartitioning) would serialize the
    # corpus at scale.
    plan = _plan(spark, sf_dir, "pack_sequences")
    assert "rangepartitioning" not in plan.lower()
    assert "hashpartitioning(shard" in plan


def test_bigram_topk_uses_window_group_limit(spark, sf_dir):
    # top-3 per prefix must push below the per-prefix sort, same
    # bounded-heap property as the stratified sample.
    assert "WindowGroupLimit" in _plan(spark, sf_dir, "text_bigram_topk")


def test_cdc_apply_uses_window_group_limit(spark, sf_dir):
    # latest-op-per-key must compile to a per-partition top-1 heap —
    # a full sort of the change log would not survive at scale.
    assert "WindowGroupLimit" in _plan(spark, sf_dir, "cdc_apply_log")


def test_quality_expectations_single_scan(spark, sf_dir):
    # N rules in ONE scan is the operator's whole point.
    assert _plan(spark, sf_dir, "quality_expectations").count("Scan parquet") == 1


def test_crawl_snapshot_dedup_is_anti_join(spark, sf_dir):
    # Cross-crawl dedup must drop already-seen (uri, digest) keys via
    # a LEFT ANTI join — a full/outer join materializing both crawls'
    # row product would not survive a petabyte archive.
    plan = _plan(spark, sf_dir, "dedup_crawl_snapshots")
    assert "LeftAnti" in plan
    assert "FullOuter" not in plan


def test_ivfpq_refine_joins_only_candidates(spark, sf_dir):
    # The refine stage's raw-vector join must build on the bounded
    # ADC shortlist (TakeOrderedAndProject feeding a BroadcastExchange)
    # — re-joining the probed lists would defeat the O(R·d) refine
    # cost claim.
    plan = _plan(spark, sf_dir, "sim_ivfpq_refine")
    assert "BroadcastHashJoin" in plan
    assert "TakeOrderedAndProject" in plan
    assert "SortMergeJoin" not in plan


def test_frontier_rules_join_is_broadcast(spark, sf_dir):
    # The robots rule table is dimension-sized and must broadcast —
    # a shuffled join keyed on host would move the whole frontier for
    # a table of a few dozen rules.
    plan = _plan(spark, sf_dir, "web_frontier_build")
    assert "BroadcastHashJoin [host_key" in plan
    assert "SortMergeJoin [host_key" not in plan
