"""As-of (nearest-previous) join — the time-series enrichment operator
the reference's workload implies but DStream-era Spark never had:
"for each flow/event, the most recent state row at or before its
timestamp, per key" (e.g. enrich each purchase with the latest prior
click, each flow with the routing-table snapshot in force).

Spark has no ASOF JOIN built-in; a naive implementation is a range
join (O(n*m) per key) or a per-row subquery. This is the scalable
composition instead:

1. tag and union both sides (right rows tag 0, left rows tag 1),
2. ONE shuffle: window partitioned by key, ordered by
   (ts, tag, right-unique-id), frame = unbounded preceding .. current,
3. last_value(struct(right_cols), ignorenulls=True) carries the whole
   right ROW forward onto every later left row (one struct, so a NULL
   inside the nearest right row is preserved, never patched from an
   older row),
4. keep the left rows.

Cost: one shuffle of left+right on the key — the same price as a plain
equi-join, independent of time-gap distribution. At 100 TB the window
per key is processed streamingly by WindowExec (running frame, no
buffering of the whole partition for this frame shape); skewed keys
are the usual salting/AQE story.

Semantics: inclusive match (right.ts == left.ts matches, tag order
puts the right row first) — identical to DuckDB's
``ASOF JOIN ... ON l.ts >= r.ts``, which the oracle uses. Ties among
right rows with the same (key, ts) are broken deterministically by the
largest ``right_id`` (DuckDB leaves this unspecified, so entry-level
oracles must pre-dedupe right rows to unique (key, ts) — see
queries_relational._join_asof).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: list[str] | None = None,
    right_id: str | None = None,
) -> DataFrame:
    """Enrich each left row with the most recent right row whose
    timestamp is <= the left row's, per `on` key.

    Returns every left column plus ``right_cols`` (NULL when no right
    row precedes the left row — left-outer as-of semantics).
    ``right_id`` (a unique right column, e.g. its event id) breaks
    equal-timestamp ties deterministically; pass one whenever right
    timestamps may collide within a key.
    """
    right_cols = right_cols or [
        c for c in right.columns if c not in set(on) | {right_ts}
    ]
    overlap = set(right_cols) & set(left.columns)
    if overlap:
        raise ValueError(f"right_cols collide with left columns: {sorted(overlap)}")

    # All right columns travel as ONE struct so the carry-forward is
    # row-atomic: a right row with NULL in some column must still win as
    # the nearest match and contribute that NULL — carrying columns
    # independently would stitch the NULL slot from an older right row.
    l_tagged = left.select(
        *on,
        F.col(left_ts).alias("_asof_ts"),
        F.lit(1).alias("_asof_tag"),
        F.lit(None).cast("long").alias("_asof_rid"),
        F.lit(None)
        .cast(
            right.select(F.struct(*right_cols).alias("s")).schema["s"].dataType
        )
        .alias("_asof_rvals"),
        F.struct(*left.columns).alias("_asof_left"),
    )
    r_tagged = right.select(
        *on,
        F.col(right_ts).alias("_asof_ts"),
        F.lit(0).alias("_asof_tag"),
        (F.col(right_id).cast("long") if right_id else F.lit(0)).alias("_asof_rid"),
        F.struct(*right_cols).alias("_asof_rvals"),
        F.lit(None).cast(l_tagged.schema["_asof_left"].dataType).alias("_asof_left"),
    )
    w = (
        Window.partitionBy(*on)
        .orderBy(F.col("_asof_ts").asc(), F.col("_asof_tag").asc(), F.col("_asof_rid").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = l_tagged.unionByName(r_tagged).select(
        "_asof_tag",
        "_asof_left",
        F.last(F.col("_asof_rvals"), ignorenulls=True).over(w).alias("_asof_rvals"),
    )
    return carried.filter(F.col("_asof_tag") == 1).select(
        F.col("_asof_left.*"),
        *[F.col(f"_asof_rvals.{c}").alias(c) for c in right_cols],
    )
