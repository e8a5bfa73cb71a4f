"""Flagship query: access trend (per-day in/out rollup).

Capability parity with the reference's one real analytical query, the
MongoDB aggregation pipeline in
``http-server/src/api/controllers/accessTrend.ts:10-87``:

  $match  — string range on timestamp                 (P5)
  $project — day substring + 4x conditional routing   (P6, P7)
  $group  — by day, 4x $sum                           (A1)
  client-side reverse => ascending day order          (O1)

Re-expressed Spark-first: one declarative plan; Catalyst pushes the
range predicate into the parquet scan, prunes to the 3 needed columns,
and runs a partial+final hash aggregate — the hand-ordered Mongo
pipeline stages are what the optimizer does automatically (SURVEY.md §4.1).

The reference hard-codes the HOST constant ``192.168.178.80``
(accessTrend.ts:25-68); here the in/out routing predicate is a
parameter. On the driver testdata the ``events`` table plays the flow
table: ``event_type`` is the routing key and ``value`` the bytes
analog (FIXTURES.md).

Scale note (100 TB): groupBy(day) has tiny key cardinality, so the
partial (map-side) aggregate collapses each input partition to
~#days rows before the shuffle — the exchange moves KBs, not TBs.
The range filter prunes at the scan via parquet row-group stats
(and via partition pruning when the table is laid out
``PARTITIONED BY (day)``, see ``plans/layout.py``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Default parameters mirror the reference's constants, mapped onto the
# driver testdata: 'purchase' plays HOST, the mid-January range plays
# the Nov 5-15 window of accessTrend.ts:13-16.
DEFAULT_IN_PREDICATE = "event_type = 'purchase'"
DEFAULT_TS_FROM = "2024-01-05"
DEFAULT_TS_TO = "2024-01-15"


def access_trend(
    events: DataFrame,
    in_predicate: Column | str = DEFAULT_IN_PREDICATE,
    ts_from: str = DEFAULT_TS_FROM,
    ts_to: str = DEFAULT_TS_TO,
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Per-day in/out value+count rollup over a timestamp range.

    Range semantics: ``ts >= from AND ts <= to`` with bare-date bounds
    cast to midnight. Near-parity with the reference's lexicographic
    string compare (accessTrend.ts:13-16) with one divergence: a row at
    exactly midnight of the end date is INCLUDED here but excluded by
    the reference ('YYYY-MM-DD 00:00:00' > 'YYYY-MM-DD' as strings).
    The DuckDB oracle uses the same timestamp semantics as this code,
    so the differential check is exact.
    """
    in_cond = F.expr(in_predicate) if isinstance(in_predicate, str) else in_predicate
    ts = F.col(ts_col)
    v = F.col(value_col)
    return (
        events.filter((ts >= F.lit(ts_from)) & (ts <= F.lit(ts_to)))
        .select(
            F.date_format(ts, "yyyy-MM-dd").alias("day"),
            F.when(in_cond, v).otherwise(F.lit(0.0)).alias("in_v"),
            F.when(in_cond, F.lit(1)).otherwise(F.lit(0)).alias("in_e"),
            F.when(~in_cond, v).otherwise(F.lit(0.0)).alias("out_v"),
            F.when(~in_cond, F.lit(1)).otherwise(F.lit(0)).alias("out_e"),
        )
        .groupBy("day")
        .agg(
            F.round(F.sum("in_v"), 2).alias("in_value"),
            F.sum("in_e").cast("long").alias("in_events"),
            F.round(F.sum("out_v"), 2).alias("out_value"),
            F.sum("out_e").cast("long").alias("out_events"),
        )
        .orderBy("day")
    )


ACCESS_TREND_ORACLE = """
SELECT strftime(ts, '%Y-%m-%d') AS day,
       ROUND(SUM(CASE WHEN event_type = 'purchase' THEN value ELSE 0 END), 2) AS in_value,
       CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS in_events,
       ROUND(SUM(CASE WHEN event_type <> 'purchase' THEN value ELSE 0 END), 2) AS out_value,
       CAST(SUM(CASE WHEN event_type <> 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS out_events
FROM events
WHERE ts >= TIMESTAMP '2024-01-05' AND ts <= TIMESTAMP '2024-01-15'
GROUP BY 1
ORDER BY 1
"""
