"""Benchmark harness: times every queries() entry at $SPARK_GRAFT_SF_DIR.

Prints exactly ONE JSON line:
  {"metric": "total_query_sec", "value": N, "unit": "sec",
   "queries": {name: sec, ...}, "sf": 0.1, "errors": {...}}

The driver runs this per-round (BENCH_r{N}.json) and compares against
BASELINE.md. Query failures are recorded in "errors" and excluded from
"value" rather than crashing the whole run.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
# min-of-N: same-code runs on a shared sandbox jittered single timings
# by up to 2.4x (text_zscore_by_lang 0.63 vs 1.54 s) — the min of two
# passes in a FIXED order is stable within ~20% run-to-run, which a
# 2x regression gate needs.
REPS = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "2"))


# Plan-invariant ambient probes (BASELINE.md re-record policy): trivial
# single-stage scans with no engine code in the plan — their timings
# can only move with the sandbox/IO environment, never with a query
# plan change, so a shift here separates ambient drift from real
# regressions. min-of-N over PROBE_REPS passes.
PROBE_REPS = int(os.environ.get("SPARK_GRAFT_PROBE_REPS", "6"))

# CPU-bound calibration probe (round 15, VERDICT-r14 ask #2): the
# engine entries at sf0.1 are dominated by fixed per-job overhead
# (~0.2-0.5 s of scheduling/stream start/py4j per job), so their
# 8-core/32-core ratios sit near 1 and cannot DEMONSTRATE that the
# bench honors $SPARK_GRAFT_CPUS. This probe is pure whole-stage
# codegen over a generated range — embarrassingly parallel, no
# input I/O, a chained-xxhash64 per row — sized to ~2 s at 32 cores
# so its runtime is compute-bound and its low/high-core ratio tracks
# the core ratio. It rides in the "queries" dict (additions are
# sanctioned by the bench contract) so the driver's scaling block
# picks it up per-query; it has no oracle because it computes no
# engine semantics — it is measurement apparatus, like the ambient
# probes, and is deliberately NOT registered in __spark_entry__.
CALIBRATION_ROWS = int(
    os.environ.get("SPARK_GRAFT_CALIBRATION_ROWS", "1800000000")
)


def _cpu_calibration(spark) -> float:
    """min-of-2 of a fixed amount of codegen compute; partitions follow
    defaultParallelism (spark.range default), so the same work spreads
    over however many cores the master grants."""
    best = None
    for _ in range(2):
        t0 = time.time()
        # bit_xor, not sum: ANSI mode (Spark 4 default) raises on the
        # long overflow a 1.8e9-hash sum is guaranteed to hit
        spark.range(CALIBRATION_ROWS).selectExpr(
            "bit_xor(xxhash64(xxhash64(xxhash64(xxhash64(id)))))"
        ).collect()
        dt = round(time.time() - t0, 3)
        best = dt if best is None else min(best, dt)
    return best


def _ambient_probes(spark, sf_dir: str) -> dict[str, float]:
    probes = {
        "probe_scan_events_count": lambda: spark.read.parquet(
            f"{sf_dir}/events.parquet"
        ).count(),
        "probe_scan_lineitem_sum": lambda: spark.read.parquet(
            f"{sf_dir}/lineitem.parquet"
        ).selectExpr("sum(l_quantity)").collect(),
        "probe_scan_documents_len": lambda: spark.read.parquet(
            f"{sf_dir}/documents.parquet"
        ).selectExpr("sum(length(text))").collect(),
    }
    out = {}
    for name, fn in probes.items():
        best = None
        for _ in range(PROBE_REPS):
            t0 = time.time()
            fn()
            dt = round(time.time() - t0, 3)
            best = dt if best is None else min(best, dt)
        out[name] = best
    return out


def main() -> int:
    from netflow_analysis_with_spark_streaming_spark.session import get_spark

    spark = get_spark(app_name="netflow-bench", master=f"local[{CPUS}]")
    import __spark_entry__ as e

    # Warm the JVM/session so the first measured query doesn't pay init.
    spark.range(1000).selectExpr("sum(id)").collect()

    m = re.search(r"sf([0-9.]+)", SF_DIR)
    sf = float(m.group(1)) if m else None

    timings: dict[str, float] = {}
    errors: dict[str, str] = {}
    for _rep in range(REPS):
        for name, fn in e.queries().items():
            if name in errors:
                continue
            t0 = time.time()
            try:
                fn(spark, SF_DIR).collect()
                dt = round(time.time() - t0, 3)
                timings[name] = min(timings.get(name, dt), dt)
            except Exception as ex:  # noqa: BLE001 — record, keep benching
                errors[name] = f"{type(ex).__name__}: {ex}"[:300]
                timings.pop(name, None)
    timings["probe_cpu_calibration"] = _cpu_calibration(spark)
    probes = _ambient_probes(spark, SF_DIR)
    # scaling evidence (round 15): the master/parallelism the session
    # ACTUALLY runs with, next to the numbers — additions-only so
    # round-over-round comparisons stay valid
    master = spark.sparkContext.master
    parallelism = spark.sparkContext.defaultParallelism
    spark.stop()

    out = {
        "metric": "total_query_sec",
        # the calibration probe is apparatus, not an engine query: it
        # rides in "queries" for the driver's per-query scaling table
        # but stays OUT of the headline total so totals remain
        # comparable with every earlier round
        "value": round(
            sum(v for k, v in timings.items() if k != "probe_cpu_calibration"),
            3,
        ),
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        # ambient probes ride along so every BENCH_r{N}.json carries
        # its own environment fingerprint next to the query timings
        "probes": probes,
        "master": master,
        "parallelism": parallelism,
    }
    if errors:
        out["errors"] = errors
    print(json.dumps(out))
    return 1 if errors else 0


if __name__ == "__main__":
    raise SystemExit(main())
