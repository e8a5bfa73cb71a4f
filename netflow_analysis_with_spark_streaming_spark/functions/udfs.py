"""UDF extension surface (SURVEY.md §2.8).

The engine's parity operators use built-ins exclusively — these
wrappers exist because the reference exposes a Python-UDF surface
(the P4 timestamp UDF, README.md:250-254) and users extend engines at
exactly this point. Two tiers, in preference order:

1. ``pandas_udf`` — Arrow-batched, vectorized; ~10-100x faster than
   row UDFs. Use for anything numpy/pandas can vectorize.
2. ``udf`` — row-at-a-time Python; the slow path. Kept for parity and
   for logic that genuinely can't batch.

Both run outside codegen and break filter pushdown across the UDF
column — never put one upstream of a selective filter.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, TimestampType


@F.pandas_udf(StringType())
def normalize_text_pudf(s: pd.Series) -> pd.Series:
    """Vectorized text normalization (lower, trim, collapse spaces) —
    the pandas_udf tier demonstrator; equivalent built-in:
    regexp_replace(lower(trim(x)), '\\s+', ' ')."""
    return s.str.lower().str.strip().str.replace(r"\s+", " ", regex=True)


@F.udf(TimestampType())
def parse_timestamp_udf(s: str):
    """Row-at-a-time string->timestamp — the reference's P4 UDF shape
    (README.md:250-254), kept as the slow-path surface demonstrator.
    Production code uses to_timestamp/timestamp_micros (built-in)."""
    from datetime import datetime, timezone

    if s is None:
        return None
    return datetime.strptime(s, "%Y-%m-%d %H:%M:%S.%f").replace(tzinfo=timezone.utc)


def first_word(text: Column) -> Column:
    """Built-in equivalent used to cross-check UDF output in tests."""
    return F.split(F.trim(text), r"\s+").getItem(0)


@F.pandas_udf("double")
def weighted_mean_udaf(value: pd.Series, weight: pd.Series) -> float:
    """Grouped-aggregate pandas_udf — the UDAF tier (SURVEY §2.8):
    a whole group's columns arrive as Series, one scalar returns.
    Weighted mean is the demonstrator (token-weighted quality);
    equivalent built-in: sum(v*w)/sum(w). Use for aggregations numpy
    can vectorize but SQL can't express (model scores, quantile
    sketches with custom invariants, ...).

    Scale: partial aggregation does NOT apply — the whole group's
    rows ship to one worker (unlike built-in aggs' map-side combine).
    Bound group cardinality or prefer built-ins in 100 TB paths."""
    total_w = float(weight.sum())
    if total_w == 0:
        return None
    return float((value * weight).sum() / total_w)


def make_explode_words_udtf():
    """Python UDTF (Spark 4) — the table-function tier of §2.8: one
    input row -> N output rows with schema, usable from SQL via
    LATERAL after spark.udtf.register. Word+position explode is the
    demonstrator; equivalent built-in: posexplode(split(...)).

    Wrapped in a factory because @udtf classes register per-session;
    callers do: spark.udtf.register('explode_words', make_...())."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="word: string, idx: int")
    class ExplodeWords:
        def eval(self, text: str):  # noqa: ANN001
            if text is None:
                return
            for i, w in enumerate(text.split()):
                yield w, i

    return ExplodeWords
