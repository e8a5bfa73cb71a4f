"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query at sf0.001 (smoke);
``queries()`` maps operator names to (spark, sf_dir) -> DataFrame;
``oracle_sql()`` maps the same names to DuckDB-runnable ANSI SQL.
Every driver entry carries an oracle (round 4) — the genuinely
non-mirrorable operators (IVF k-means, open-session sessionize) live
in the extra tier (queries.EXTRA_QUERIES) with property-test evidence.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from netflow_analysis_with_spark_streaming_spark import queries as q


def entry(spark: SparkSession) -> DataFrame:
    """Flagship access-trend query on /root/testdata/sf0.001."""
    return q.QUERIES["flagship_access_trend"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(q.QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(q.ORACLES)
