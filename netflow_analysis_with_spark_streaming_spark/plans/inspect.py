"""Executed-plan predicates for tests and bench discipline.

Usage: assert the plan you designed is the plan Catalyst chose —
every new query should pin its load-bearing physical properties
(pushdown reached the scan, dim joins broadcast, aggs are
partial+final) so a regression shows up as a test failure, not a
10x slowdown at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def executed_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def has_pushed_filter(df: DataFrame, fragment: str) -> bool:
    """True if `fragment` appears among the scan's PushedFilters."""
    plan = executed_plan(df)
    return fragment in plan and "PushedFilters" in plan


def broadcast_join_count(df: DataFrame) -> int:
    return executed_plan(df).count("BroadcastHashJoin")


def shuffle_count(df: DataFrame) -> int:
    """Number of exchange operators — the scale-limiting resource."""
    return executed_plan(df).count("Exchange")


def uses_whole_stage_codegen(df: DataFrame) -> bool:
    """Requires executing the query: under AQE the pre-execution plan
    prints `isFinalPlan=false` without codegen annotations. In the
    finalized plan, codegen'd operators carry the `*(n)` stage marker
    (the literal 'WholeStageCodegen' label only appears in formatted
    explain output)."""
    import re

    # collect(), not count(): count() builds a DIFFERENT QueryExecution,
    # leaving this one un-finalized (isFinalPlan=false, no markers).
    df.collect()
    plan = executed_plan(df)
    return "WholeStageCodegen" in plan or re.search(r"\*\(\d+\)", plan) is not None


def has_partial_final_agg(df: DataFrame) -> bool:
    """Partial+final HashAggregate pair (map-side combine happened)."""
    return executed_plan(df).count("HashAggregate") >= 2
