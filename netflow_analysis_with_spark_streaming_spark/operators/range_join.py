"""Interval (range) join without an equi-key — bucketized.

"Which events fall inside which time windows" with NO shared key is a
pure range predicate; Spark plans that as BroadcastNestedLoopJoin (ok
only while one side broadcasts) or a cartesian product (never ok).
The scalable construction is the classic interval-bucketing trick:

1. pick a bucket width (e.g. 1 day),
2. each point maps to exactly ONE bucket (integer floor-div of its
   epoch — no explode on the big side),
3. each interval explodes to the buckets it overlaps
   (ceil(len/width)+1 rows — intervals are the SMALL side),
4. equi-join on the bucket id (shuffled hash/sort-merge, AQE
   skew-splittable like any equi-join),
5. refine with the exact range predicate.

A point lies in exactly one bucket, and an interval lists each of its
buckets once, so a (point, interval) match survives exactly once — no
post-dedup needed. Cost scales with true match density times bucket
granularity, not |points| x |intervals|.

Semantics: half-open [start, end) — the streaming-window convention.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_US = 1_000_000


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    ts_col: str,
    start_col: str,
    end_col: str,
    bucket_seconds: int = 86_400,
) -> DataFrame:
    """Inner join of each point row to every interval row with
    start <= ts < end. Returns all columns from both sides."""
    width = bucket_seconds * _US
    pts = points.withColumn(
        "_bkt", F.floor(F.unix_micros(F.col(ts_col)) / width)
    )
    ivs = intervals.withColumn(
        "_bkt",
        F.explode(
            F.sequence(
                F.floor(F.unix_micros(F.col(start_col)) / width),
                # end is exclusive: the last covered microsecond is end-1
                F.floor((F.unix_micros(F.col(end_col)) - 1) / width),
            )
        ),
    )
    return (
        pts.join(ivs, "_bkt")
        .filter(
            (F.col(ts_col) >= F.col(start_col)) & (F.col(ts_col) < F.col(end_col))
        )
        .drop("_bkt")
    )
