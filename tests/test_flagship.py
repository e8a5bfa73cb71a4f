"""Flagship access-trend query: smoke + oracle differential + plan shape."""

import importlib
import sys

from conftest import SF_ORACLE, SF_SMOKE, assert_matches_oracle


def _entry_module():
    if "__spark_entry__" in sys.modules:
        return sys.modules["__spark_entry__"]
    return importlib.import_module("__spark_entry__")


def test_entry_smoke(spark):
    df = _entry_module().entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert df.columns == ["day", "in_value", "in_events", "out_value", "out_events"]
    days = [r["day"] for r in rows]
    assert days == sorted(days)


def test_flagship_oracle(spark, duck):
    mod = _entry_module()
    df = mod.queries()["flagship_access_trend"](spark, SF_ORACLE)
    assert_matches_oracle(df, duck, mod.oracle_sql()["flagship_access_trend"])


def test_flagship_plan_pushdown(spark):
    """The range predicate must reach the parquet scan, and the agg must
    be partial+final hash (no sort-based fallback)."""
    mod = _entry_module()
    df = mod.queries()["flagship_access_trend"](spark, SF_SMOKE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # The ns-range bounds must be pushed into the parquet scan.
    assert "GreaterThanOrEqual(ts," in plan, plan
    assert "LessThanOrEqual(ts," in plan, plan
    assert "HashAggregate" in plan, plan
