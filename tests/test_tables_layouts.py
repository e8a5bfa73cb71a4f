"""Pin the events.ts layout adaptivity.

The driver testdata generator has shipped events.ts as parquet
TIMESTAMP(NANOS) (rounds 1-4) and as plain timestamp[us] with
isAdjustedToUTC=false (2026-08-13 regeneration). The 08-13 switch
silently broke every events reader mid-round: explicit long-ns
streaming schemas read micros as nanos (timestamps collapsed to
1970-01-20) and plain loads surfaced TIMESTAMP_NTZ, breaking
``unix_micros``. These tests synthesize all three plausible
generations and assert the loaders produce IDENTICAL values for each,
so the next regeneration cannot slip through.
"""

from __future__ import annotations

import datetime as dt

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from netflow_analysis_with_spark_streaming_spark import tables
from netflow_analysis_with_spark_streaming_spark.queries_streaming import (
    _events_ts_is_nanos,
)

_ROWS = [
    (1, dt.datetime(2024, 1, 1, 0, 0, 7, 123456), 10, "click", 1.5, "{}"),
    (2, dt.datetime(2024, 1, 5, 12, 30, 0, 0), 11, "purchase", 2.5, "{}"),
    (3, dt.datetime(2024, 1, 9, 23, 59, 59, 999999), 12, "view", 3.5, "{}"),
]


def _write_events(path: str, ts_type: pa.DataType) -> None:
    cols = list(zip(*_ROWS))
    tbl = pa.table(
        {
            "event_id": pa.array(cols[0], pa.int64()),
            "ts": pa.array(cols[1], ts_type),
            "user_id": pa.array(cols[2], pa.int64()),
            "event_type": pa.array(cols[3], pa.string()),
            "value": pa.array(cols[4], pa.float64()),
            "props": pa.array(cols[5], pa.string()),
        }
    )
    pq.write_table(tbl, path)


_LAYOUTS = {
    "us_ntz": pa.timestamp("us"),  # 2026-08-13 generation
    "us_utc": pa.timestamp("us", tz="UTC"),  # plausible future generation
    "ns": pa.timestamp("ns"),  # rounds 1-4 generation
}


@pytest.mark.parametrize("layout", sorted(_LAYOUTS))
def test_load_identical_across_ts_layouts(spark, tmp_path, layout):
    d = tmp_path / layout
    d.mkdir()
    _write_events(str(d / "events.parquet"), _LAYOUTS[layout])
    df = tables.load(spark, "events", str(d))
    assert df.schema["ts"].dataType.typeName() == "timestamp", df.schema["ts"]
    got = sorted((r["event_id"], r["ts"]) for r in df.collect())
    assert got == [(r[0], r[1]) for r in _ROWS], got


@pytest.mark.parametrize("layout", sorted(_LAYOUTS))
def test_events_range_pushdown_identical_across_layouts(spark, tmp_path, layout):
    d = tmp_path / layout
    d.mkdir()
    _write_events(str(d / "events.parquet"), _LAYOUTS[layout])
    df = tables.load_events_range(spark, str(d), "2024-01-02", "2024-01-08")
    assert [r["event_id"] for r in df.collect()] == [2]
    # the range must reach the scan as a data filter in every layout
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan and "ts" in plan.split("PushedFilters:")[1][:200], (
        plan[:2000]
    )


def test_streaming_schema_pick_matches_footer(tmp_path):
    for layout, expect_nanos in (("us_ntz", False), ("ns", True)):
        p = str(tmp_path / f"{layout}.parquet")
        _write_events(p, _LAYOUTS[layout])
        assert _events_ts_is_nanos(p) is expect_nanos, layout


def test_load_parallel_gate(spark, tmp_path):
    """load_parallel's 100 TB contract: a single-file scan gets
    repartitioned to >= defaultParallelism partitions; a source that
    already has >= cores input splits loads PLAIN — no exchange, no
    persist (the gate, not the repartition, is the contract)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = tmp_path / "one"
    d.mkdir()
    _write_events(str(d / "events.parquet"), _LAYOUTS["us_ntz"])
    df_small = tables.load_parallel(spark, "events", str(d))
    target = spark.sparkContext.defaultParallelism
    assert df_small.rdd.getNumPartitions() >= target
    assert "InMemoryRelation" in df_small._jdf.queryExecution().optimizedPlan().toString()

    # many-files source: same table split into `target` single-row files
    m = tmp_path / "many"
    (m / "events.parquet").mkdir(parents=True)
    cols = list(zip(*_ROWS))
    for i in range(target):
        tbl = pa.table(
            {
                "event_id": pa.array([cols[0][i % 3] + i * 100], pa.int64()),
                "ts": pa.array([cols[1][i % 3]], _LAYOUTS["us_ntz"]),
                "user_id": pa.array([cols[2][i % 3]], pa.int64()),
                "event_type": pa.array([cols[3][i % 3]], pa.string()),
                "value": pa.array([cols[4][i % 3]], pa.float64()),
                "props": pa.array([cols[5][i % 3]], pa.string()),
            }
        )
        pq.write_table(tbl, str(m / "events.parquet" / f"part-{i:03d}.parquet"))
    df_many = tables.load_parallel(spark, "events", str(m))
    plan = df_many._jdf.queryExecution().optimizedPlan().toString()
    assert "InMemoryRelation" not in plan, plan[:1500]
    assert "Repartition" not in plan, plan[:1500]
