"""Slowly-changing-dimension Type 2 maintenance (the warehouse
pattern behind every point-in-time join): applying a batch of updates
to a versioned dimension closes the current row of each key whose
tracked attributes CHANGED and opens a new current row, leaving
history immutable. Unchanged updates are no-ops (the
change-detection, not the update feed, decides what versioned).

Composes with operators/asof.py: an as-of join against the
(valid_from, valid_to] ranges this produces is the point-in-time
dimension lookup.

Scale: one equi-join of the update batch against CURRENT rows only
(current set is keys-cardinality — broadcast when small, shuffle
equi-join when not), null-safe attribute comparison inside codegen,
and unions of disjoint row sets. History rows pass through untouched
— no rewrite proportional to history length.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def scd2_apply(
    dim: DataFrame,
    updates: DataFrame,
    key: str,
    attrs: list[str],
    effective: Column,
    validate_unique: bool = True,
) -> DataFrame:
    """Apply ``updates`` (key + attrs) to an SCD2 ``dim`` (key +
    attrs + valid_from/valid_to/is_current). Returns the new full
    dimension. ``effective`` is the batch's effective date column/
    literal stamped on closed rows' valid_to and opened rows'
    valid_from. Attribute comparison is NULL-SAFE (a NULL->value
    transition is a change).

    ``updates`` must carry ONE row per key — two rows for the same
    key would both open as current, corrupting every downstream
    point-in-time join. ``validate_unique`` (default on) enforces
    this with one count over the update batch (batch-sized, not
    dimension-sized); callers whose feed guarantees uniqueness can
    opt out of the job."""
    if validate_unique:
        dup = (
            updates.groupBy(key)
            .count()
            .filter(F.col("count") > 1)
            .limit(1)
            .collect()
        )
        if dup:
            raise ValueError(
                f"scd2_apply updates contain duplicate key "
                f"{dup[0][key]!r}: one row per key required (pre-reduce "
                "multi-change batches to their final state first)"
            )
    cur = dim.filter(F.col("is_current"))
    hist = dim.filter(~F.col("is_current"))
    u = updates.alias("u")
    c = cur.alias("c")
    joined = u.join(c, F.col(f"u.{key}") == F.col(f"c.{key}"), "left")
    differs = None
    for a in attrs:
        d = ~F.col(f"u.{a}").eqNullSafe(F.col(f"c.{a}"))
        differs = d if differs is None else (differs | d)
    changed = joined.filter(F.col(f"c.{key}").isNotNull() & differs).select(
        *[F.col(f"u.{x}").alias(x) for x in [key, *attrs]]
    )
    brand_new = joined.filter(F.col(f"c.{key}").isNull()).select(
        *[F.col(f"u.{x}").alias(x) for x in [key, *attrs]]
    )
    closed = (
        cur.join(changed.select(key), key, "semi")
        .withColumn("valid_to", effective.cast("string"))
        .withColumn("is_current", F.lit(False))
    )
    untouched = cur.join(changed.select(key), key, "left_anti")
    opened = changed.unionByName(brand_new).select(
        key,
        *attrs,
        effective.cast("string").alias("valid_from"),
        F.lit(None).cast("string").alias("valid_to"),
        F.lit(True).alias("is_current"),
    )
    return (
        hist.unionByName(untouched).unionByName(closed).unionByName(opened)
    )
