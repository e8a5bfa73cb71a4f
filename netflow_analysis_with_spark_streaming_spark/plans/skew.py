"""Skew mitigation: salted joins for hot keys.

AQE's skew-join splitting (on by default in session.get_spark) handles
most skew at runtime by splitting oversized partitions. Salting is the
static fallback for the cases AQE can't fix — e.g. one key holding 30%
of a 100 TB table, where even a split partition's build side explodes,
or stream-stream joins where AQE doesn't apply.

Construction (classic n-way replication):
- left (large, skewed) rows get salt = pmod(hash(cols), n) — a
  DETERMINISTIC spread of each hot key's rows across n sub-keys
  (rand() would break retry idempotence and test reproducibility);
- right (smaller) rows are replicated n times, once per salt value;
- join on (key, salt) — each hot key now occupies n shuffle
  partitions instead of one.

Cost: right side inflates n-fold — pick n ~ (hot-key rows / target
partition rows), not a blanket large number.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SALT_COL = "__salt"


def salt_left(df: DataFrame, n: int, spread_cols: list[str] | None = None) -> DataFrame:
    """Add a deterministic salt in [0, n) derived from ``spread_cols``
    (default: all columns) — uniform-ish within each join key."""
    cols = [F.col(c) for c in (spread_cols or df.columns)]
    return df.withColumn(SALT_COL, F.pmod(F.hash(*cols), F.lit(n)))


def replicate_right(df: DataFrame, n: int) -> DataFrame:
    """Replicate each row once per salt value (explode of a literal
    range — no shuffle, the copies materialize during the join scan)."""
    return df.withColumn(
        SALT_COL, F.explode(F.sequence(F.lit(0), F.lit(n - 1)))
    )


_SALT_SAFE_HOW = {"inner", "left", "left_outer", "left_semi", "leftsemi"}


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    n: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join on ``on`` with n-way salting; result == plain join
    (verified by test_salted_join_equivalence), minus the single-hot-
    partition bottleneck.

    Only inner/left/left_semi are accepted: the right side is
    replicated n-fold, so right/full-outer variants would emit each
    UNMATCHED right row n times — a silent correctness break, hence a
    hard error here. For outer-right skew, salt the other side or use
    AQE's runtime skew split."""
    if how not in _SALT_SAFE_HOW:
        raise ValueError(
            f"salted_join supports {sorted(_SALT_SAFE_HOW)}; got {how!r} — "
            "right-side replication would duplicate unmatched right rows"
        )
    l_salted = salt_left(left, n, spread_cols=None)
    r_rep = replicate_right(right, n)
    out = l_salted.join(r_rep, on + [SALT_COL], how)
    return out.drop(SALT_COL)
