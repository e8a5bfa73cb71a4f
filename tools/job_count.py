"""Spark-job census per driver entry (round 15): how many Spark jobs
an entry submits, measured by bracketing it between two marker jobs
whose ids come from the status tracker — job ids are a global
monotonic counter, so (after - before - 1) counts every job the entry
ran regardless of which thread or job group submitted it (streaming
engines set their own groups, which getJobIdsForGroup can't see).

The streaming/storage entries are job-count bound (~0.2-0.5 s of
scheduling floor per job at sf0.1), so this census is the measurement
that justifies — and verifies — job-floor optimizations.

Usage: python tools/job_count.py [-n REPS] name [name ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def _marker_job_id(spark, tag: str) -> int:
    sc = spark.sparkContext
    sc.setJobGroup(tag, tag)
    spark.range(1).count()
    sc.setJobGroup(None, None)
    ids = sc.statusTracker().getJobIdsForGroup(tag)
    return max(ids)


def main() -> None:
    args = sys.argv[1:]
    reps = 1
    if args and args[0] == "-n":
        reps = int(args[1])
        args = args[2:]
    from netflow_analysis_with_spark_streaming_spark.session import get_spark

    spark = get_spark(app_name="job-count", master=f"local[{CPUS}]")
    import __spark_entry__ as e

    spark.range(1000).selectExpr("sum(id)").collect()
    for name, fn in e.queries().items():
        if not any(p in name for p in args):
            continue
        for i in range(reps):
            before = _marker_job_id(spark, f"m0-{name}-{i}")
            t0 = time.time()
            fn(spark, SF_DIR).collect()
            dt = round(time.time() - t0, 3)
            after = _marker_job_id(spark, f"m1-{name}-{i}")
            print(f"{name} pass {i}: jobs={after - before - 1} sec={dt}")
    spark.stop()


if __name__ == "__main__":
    main()
