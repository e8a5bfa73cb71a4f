"""Paired A/B entry timing between two checkouts (round 15,
VERDICT-r14 ask #3): the sandbox's ambient jitter (10-40% between
whole invocations) makes single-run comparisons of ±0.3 s claims
meaningless. This harness interleaves passes A,B,A,B,... in one
session of wall-clock time, so both sides sample the same ambient
band, and reports per-entry min/median for each side plus the ratio.

Usage:
  python tools/ab_paired.py --a /root/repo --b /tmp/r14_checkout \
      [-n 5] entry [entry ...]

Each pass spawns a fresh subprocess (own JVM) in one checkout that
runs every requested entry ONCE (same session factory, same
.collect() action as bench.py) and prints a JSON line; the harness
alternates sides. Fresh JVMs per pass cost ~10 s each but remove
cross-side cache/JIT contamination — the comparison is what the
driver's cold bench sees, not a warmed best case.

Entry names match EXACTLY (not by substring): both checkouts must
declare the same names for a comparison to mean anything.
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import subprocess
import sys

_RUNNER = r"""
import json, os, sys, time
sys.path.insert(0, os.getcwd())
from netflow_analysis_with_spark_streaming_spark.session import get_spark
spark = get_spark(app_name="ab-paired",
                  master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
import __spark_entry__ as e
spark.range(1000).selectExpr("sum(id)").collect()
sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
names = json.loads(sys.argv[1])
out = {}
qs = e.queries()
for name in names:
    fn = qs[name]
    spark.sparkContext.setJobDescription(f"ab {name}")
    t0 = time.time()
    fn(spark, sf_dir).collect()
    out[name] = round(time.time() - t0, 3)
spark.stop()
print("ABJSON:" + json.dumps(out))
"""


def _run_side(repo: str, names: list[str]) -> dict[str, float]:
    proc = subprocess.run(
        [sys.executable, "-c", _RUNNER, json.dumps(names)],
        cwd=repo,
        capture_output=True,
        text=True,
    )
    for line in proc.stdout.splitlines():
        if line.startswith("ABJSON:"):
            return json.loads(line[len("ABJSON:"):])
    raise RuntimeError(
        f"runner in {repo} produced no timing line; tail:\n"
        + proc.stdout[-2000:]
        + proc.stderr[-2000:]
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--a", required=True, help="checkout A (e.g. HEAD)")
    ap.add_argument("--b", required=True, help="checkout B (e.g. prev round)")
    ap.add_argument("-n", type=int, default=5, help="paired passes per side")
    ap.add_argument("entries", nargs="+")
    args = ap.parse_args()

    runs: dict[str, list[dict[str, float]]] = {"a": [], "b": []}
    for i in range(args.n):
        for side, repo in (("a", args.a), ("b", args.b)):
            t = _run_side(repo, args.entries)
            runs[side].append(t)
            print(f"pass {i} side {side}: {t}", flush=True)

    print("\n=== paired summary (min / median over "
          f"{args.n} interleaved passes) ===")
    for name in args.entries:
        av = [r[name] for r in runs["a"]]
        bv = [r[name] for r in runs["b"]]
        ratio = min(bv) / min(av) if min(av) > 0 else float("nan")
        print(
            f"{name}: A min={min(av)} med={statistics.median(av):.3f} "
            f"| B min={min(bv)} med={statistics.median(bv):.3f} "
            f"| B/A min-ratio={ratio:.3f}"
        )
    print(json.dumps({"a": runs["a"], "b": runs["b"]}))


if __name__ == "__main__":
    main()
