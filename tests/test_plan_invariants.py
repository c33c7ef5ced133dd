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
_BNL_OK = {
    "join_cross",
    "sim_ann_bruteforce",
    "udtf_rls_predicate",
    "text_tfidf",
    "view_dashboard_twograin",
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
