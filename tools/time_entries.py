"""Per-entry timing probe: run named driver entries N times each in
one engine session and print every pass + the min.

Usage: python tools/time_entries.py [-n REPS] name [name ...]
  name matches driver entries by substring (like check_oracle.py).

Methodology mirrors bench.py (same session factory, same .collect()
action, fixed order) so numbers are comparable to BENCH rows; the
extra passes expose run-to-run jitter that a single bench invocation
hides. Labels each pass via setJobDescription (guide 1.5).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def main() -> None:
    args = sys.argv[1:]
    reps = 3
    if args and args[0] == "-n":
        reps = int(args[1])
        args = args[2:]
    from netflow_analysis_with_spark_streaming_spark.session import get_spark

    spark = get_spark(app_name="entry-timer", master=f"local[{CPUS}]")
    import __spark_entry__ as e

    spark.range(1000).selectExpr("sum(id)").collect()  # warm
    for name, fn in e.queries().items():
        if not any(p in name for p in args):
            continue
        times = []
        for i in range(reps):
            spark.sparkContext.setJobDescription(f"{name} pass {i}")
            t0 = time.time()
            fn(spark, SF_DIR).collect()
            times.append(round(time.time() - t0, 3))
        spark.sparkContext.setJobDescription(None)
        print(f"{name}: {times} min={min(times)}")
    spark.stop()


if __name__ == "__main__":
    main()
