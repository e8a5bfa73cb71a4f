"""Relational corpus: oracle differentials + plan-shape discipline.

Plan assertions follow the pattern set in test_flagship.py: every
broadcast-able join must actually broadcast, filters must reach the
parquet scan, top-k must not materialize a global sort.
"""

import importlib
import sys

import pytest

from conftest import SF_ORACLE, assert_matches_oracle


def _entry():
    if "__spark_entry__" in sys.modules:
        return sys.modules["__spark_entry__"]
    return importlib.import_module("__spark_entry__")


ORACLE_CHECKED = [
    "join_broadcast_enrich",
    "join_shuffle_large",
    "join_semi",
    "join_anti",
    "join_star",
    "agg_pricing_summary",
    "agg_count_distinct",
    "agg_rollup",
    "window_topk_per_group",
    "window_day_series",
    "topk_heavy_hitters",
    "set_intersect",
    "set_except",
    "set_union",
    "scalar_functions",
]


@pytest.mark.parametrize("name", ORACLE_CHECKED)
def test_oracle_differential(spark, duck, name):
    mod = _entry()
    df = mod.queries()[name](spark, SF_ORACLE)
    assert_matches_oracle(df, duck, mod.oracle_sql()[name])


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_broadcast_enrich_plan(spark):
    """Dim joins must be BroadcastHashJoin — fact side never shuffles."""
    df = _entry().queries()["join_broadcast_enrich"](spark, SF_ORACLE)
    plan = _plan(df)
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_star_join_plan(spark):
    df = _entry().queries()["join_star"](spark, SF_ORACLE)
    plan = _plan(df)
    assert plan.count("BroadcastHashJoin") >= 3, plan


def test_semi_join_pushdown(spark):
    """Status filter must be pushed into the orders parquet scan."""
    df = _entry().queries()["join_semi"](spark, SF_ORACLE)
    plan = _plan(df)
    assert "LeftSemi" in plan, plan
    assert "EqualTo(o_orderstatus,F)" in plan, plan


def test_topk_no_global_sort(spark):
    """limit+orderBy must plan as TakeOrderedAndProject (bounded heap
    per partition), not a full Sort + CollectLimit."""
    df = _entry().queries()["topk_heavy_hitters"](spark, SF_ORACLE)
    plan = _plan(df)
    assert "TakeOrderedAndProject" in plan, plan


def test_pricing_summary_partial_agg(spark):
    """Full agg set must compute as partial+final HashAggregate and
    push the shipdate range into the scan."""
    df = _entry().queries()["agg_pricing_summary"](spark, SF_ORACLE)
    plan = _plan(df)
    assert plan.count("HashAggregate") >= 2, plan
    assert "LessThanOrEqual(l_shipdate" in plan, plan


def test_similarity_joins_never_cartesian(spark):
    """The never-all-pairs discipline, pinned: candidate generation
    plans must contain no CartesianProduct; the one intentional cross
    join (tiny query set) must be the broadcast nested-loop variant."""
    mod = _entry()
    for name in ["similarity_ngram_jaccard", "dedup_minhash_candidates"]:
        plan = _plan(mod.queries()[name](spark, SF_ORACLE))
        assert "CartesianProduct" not in plan, (name, plan)
    topk_plan = _plan(mod.queries()["similarity_cosine_topk"](spark, SF_ORACLE))
    assert "CartesianProduct" not in topk_plan, topk_plan
    assert "BroadcastNestedLoopJoin" in topk_plan, topk_plan


def test_approx_distinct_within_rsd(spark):
    """HLL estimate must land within ~3x the configured 2% rsd of the
    exact count (loose bound, deterministic sketch)."""
    mod = _entry()
    approx = {
        r["event_type"]: r["approx_users"]
        for r in mod.queries()["agg_approx_distinct"](spark, SF_ORACLE).collect()
    }
    exact = {
        r["event_type"]: r["distinct_users"]
        for r in mod.queries()["agg_count_distinct"](spark, SF_ORACLE).collect()
    }
    assert approx.keys() == exact.keys()
    for k in exact:
        rel_err = abs(approx[k] - exact[k]) / max(exact[k], 1)
        assert rel_err < 0.06, (k, approx[k], exact[k])
