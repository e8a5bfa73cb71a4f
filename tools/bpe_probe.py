"""Batched-BPE trainer cost probe (round 14, VERDICT r13 ask #4).

The driver corpus has only ~31 distinct words (synthetic generator),
so BPE exhausts at ~89 merges — far below a realistic tokenizer's 32k.
The trainer's cost structure depends ONLY on its input word-frequency
table (word, n_word) — the exact shape every real caller hands it —
so this probe builds a deterministic synthetic vocabulary large enough
to sustain k=256+ merges (20k words, len 6-14 over a 26-letter
alphabet, Zipf-ish counts) and measures wall-clock at:

  - k=16  batch=1   (the sequential trainer's per-merge floor)
  - k=64  batch=16
  - k=256 batch=64

reporting rounds (admission calls), wall seconds, and ms/merge. The
claim under test: with batch scaling ~k/4, cost is SUB-LINEAR in k
because the ~0.5 s fixed per-round overhead (driver argmax + job
scheduling) is paid per ROUND, not per merge.

Usage: python tools/bpe_probe.py  (serialize with other timing runs)
"""

from __future__ import annotations

import json
import os
import random
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def synth_wf(spark, n_words: int = 20_000, seed: int = 14):
    rng = random.Random(seed)
    alpha = "abcdefghijklmnopqrstuvwxyz"
    words = set()
    while len(words) < n_words:
        L = rng.randint(6, 14)
        words.add("".join(rng.choice(alpha) for _ in range(L)))
    rows = [
        (w, max(1, int(1_000_000 / (i + 1))))  # Zipf-ish counts
        for i, w in enumerate(sorted(words))
    ]
    return spark.createDataFrame(rows, "word string, n_word long")


def main() -> int:
    from netflow_analysis_with_spark_streaming_spark.functions import text as T
    from netflow_analysis_with_spark_streaming_spark.session import get_spark

    spark = get_spark()
    wf = synth_wf(spark).persist()
    wf.count()
    T.bpe_train_batched(wf, 4, batch=4)  # warmup

    results = {}
    orig_admit = T.bpe_admit_batch
    for k, batch in [(16, 1), (64, 16), (256, 64)]:
        rounds = [0]

        def counting_admit(ranked, b, _r=rounds):
            _r[0] += 1
            return orig_admit(ranked, b)

        T.bpe_admit_batch = counting_admit
        try:
            t0 = time.time()
            merges = T.bpe_train_batched(wf, k, batch=batch)
            dt = time.time() - t0
        finally:
            T.bpe_admit_batch = orig_admit
        results[f"k={k},batch={batch}"] = {
            "merges": len(merges),
            "rounds": rounds[0],
            "wall_s": round(dt, 2),
            "ms_per_merge": round(dt / max(1, len(merges)) * 1000, 1),
        }
    print(json.dumps(results))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
