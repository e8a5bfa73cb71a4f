"""Rolling z-score anomaly scoring — shared by the batch
(anomaly_rolling_zscore) and streaming (stream_anomaly_zscore) entries
so a threshold/baseline tweak cannot desynchronize two entries that
are sold as agreeing on every flagged hour. Registry-free on purpose:
both registrar modules import from here, so no import-order cycle.

Semantics: per event type, each hour's count is z-scored against the
rolling 24-hour baseline (ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING);
NULL z during cold start (< 12 prior hours) or degenerate variance;
|z| > 2.5 flags. The window runs over the dimension-sized hourly
series PARTITIONED BY event type — never over fact rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def score_hourly_anomalies(hourly: DataFrame) -> DataFrame:
    """Input: (event_type, hour, cnt). Output adds z (round 4) and
    is_anomaly, ordered by (event_type, hour)."""
    base = Window.partitionBy("event_type").orderBy("hour").rowsBetween(-24, -1)
    scored = hourly.select(
        "event_type",
        "hour",
        "cnt",
        F.count("cnt").over(base).alias("n_hist"),
        F.avg("cnt").over(base).alias("mu"),
        F.stddev_samp("cnt").over(base).alias("sd"),
    )
    z = F.when(
        (F.col("n_hist") >= 12) & (F.col("sd") > 0),
        F.round((F.col("cnt") - F.col("mu")) / F.col("sd"), 4),
    )
    return (
        scored.select(
            "event_type",
            "hour",
            "cnt",
            z.alias("z"),
            (z.isNotNull() & (F.abs(z) > 2.5)).alias("is_anomaly"),
        )
        .orderBy("event_type", "hour")
    )


ANOMALY_SQL = """
WITH hourly AS (
  SELECT event_type, strftime(date_trunc('hour', ts), '%Y-%m-%d %H:00') AS hour,
         COUNT(*) AS cnt
  FROM events GROUP BY 1, 2
),
scored AS (
  SELECT event_type, hour, cnt,
         COUNT(cnt) OVER w AS n_hist,
         AVG(cnt) OVER w AS mu,
         STDDEV_SAMP(cnt) OVER w AS sd
  FROM hourly
  WINDOW w AS (PARTITION BY event_type ORDER BY hour
               ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING)
),
z AS (
  SELECT event_type, hour, cnt,
         CASE WHEN n_hist >= 12 AND sd > 0
              THEN ROUND((cnt - mu) / sd, 4) END AS z
  FROM scored
)
SELECT event_type, hour, cnt, z,
       (z IS NOT NULL AND ABS(z) > 2.5) AS is_anomaly
FROM z ORDER BY event_type, hour
"""
