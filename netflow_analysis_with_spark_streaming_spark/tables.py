"""Parquet loaders for the driver testdata (TESTDATA.md).

The engine's "catalog": one parquet file per table under an sf dir.
Loading is lazy — Catalyst prunes columns and pushes filters into the
parquet scan, so ``load`` is cheap to call per-query.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType

from .schemas import TESTDATA_TABLES

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def harden_session(spark: SparkSession) -> None:
    """Set must-have runtime confs on an externally-provided session.

    The driver (and any embedding application) passes its OWN
    SparkSession into the query callables — it never goes through
    ``session.get_spark``. Two confs are correctness-critical and both
    are runtime-settable:

    - ``nanosAsLong``: events.parquet has shipped as TIMESTAMP(NANOS)
      in some driver generations, which a vanilla session refuses to
      read (PARQUET_TYPE_ILLEGAL); under this conf it arrives as long
      ns and ``load`` converts it.
    - ``inferTimestampNTZ=false``: other generations ship plain
      timestamp[us] with isAdjustedToUTC=false, which Spark 4 would
      otherwise surface as TIMESTAMP_NTZ — breaking ``unix_micros``
      and every LTZ-typed comparison downstream. Disabling the
      inference reads the stored micros as UTC instants, which under
      the UTC session zone is value-identical to DuckDB's naive read.
    - UTC session timezone: ``date_format``/timestamp-literal compares
      silently shift by the ambient zone otherwise, diverging from the
      UTC-naive DuckDB oracle.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    spark.conf.set("spark.sql.session.timeZone", "UTC")


def load(spark: SparkSession, name: str, sf_dir: str | None = None) -> DataFrame:
    """Load one testdata table as a DataFrame.

    events.ts layout varies by driver generation: TIMESTAMP(NANOS)
    reads as long ns under ``nanosAsLong`` and is converted here with
    integer `div` (truncation toward zero — identical to DuckDB's
    ns->us read); timestamp[us] reads directly as TimestampType
    (``inferTimestampNTZ`` disabled in harden_session) and needs no
    conversion.
    """
    harden_session(spark)
    df = spark.read.parquet(os.path.join(sf_dir or DEFAULT_SF_DIR, f"{name}.parquet"))
    if name == "events" and isinstance(df.schema["ts"].dataType, LongType):
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def _utc_ns(ts: str) -> int:
    """Epoch nanoseconds of a 'YYYY-MM-DD[ HH:MM:SS]' UTC string (exact int math)."""
    from datetime import datetime, timezone

    fmt = "%Y-%m-%d %H:%M:%S" if " " in ts else "%Y-%m-%d"
    dt = datetime.strptime(ts, fmt).replace(tzinfo=timezone.utc)
    return int(dt.timestamp()) * 1_000_000_000


_TRACKED_CACHES: list[DataFrame] = []


def track_persist(df: DataFrame) -> DataFrame:
    """``persist()`` + registration in a module-level list so a
    long-lived process (bench runner, driver loop) can reclaim every
    cached relation between passes via ``clear_caches`` instead of
    letting them accumulate for the whole session. Spark's
    CacheManager dedups by analyzed-plan equality, so re-persisting an
    identical plan reuses the existing InMemoryRelation — the list may
    hold plan-equal handles; unpersisting each is idempotent."""
    _TRACKED_CACHES.append(df.persist())
    return df


def clear_caches() -> None:
    """Unpersist every relation cached via ``track_persist`` (the
    load_parallel table caches and query-level metric caches). Call
    between bench passes / sf_dir switches; the next query rebuilds
    its cache lazily."""
    while _TRACKED_CACHES:
        _TRACKED_CACHES.pop().unpersist()


def load_parallel(
    spark: SparkSession, name: str, sf_dir: str | None = None
) -> DataFrame:
    """``load`` + guarantee at least ``defaultParallelism`` partitions
    before CPU-heavy per-row expressions (tokenize/shingle/MinHash).

    The driver testdata ships each table as ONE parquet file with ONE
    row group, so the scan is a single task no matter how small
    maxPartitionBytes is — and every expensive projection chained on
    it runs single-threaded. Worse, a repartition alone does NOT fix
    the filter case: PushDownPredicates happily pushes a filter
    through a round-robin exchange onto the scan, inlining the alias
    substitutions (the curation pipeline's quality predicate evaluated
    `words()` ~6x per row in the ONE scan task — 16 of its 35 cold
    seconds). The persist() plants an InMemoryRelation the predicate
    cannot be pushed beneath, so heavy filters evaluate across the
    repartitioned cached partitions instead. The cache is shared by
    plan equality across every query loading the same table, and holds
    only tables small enough to arrive as a single file — at cluster
    scale the scan already has >= cores input splits, the gate fails,
    and this is a plain load (never a 100 TB persist). The condition,
    not the repartition, is the contract.
    """
    df = load(spark, name, sf_dir)
    target = spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        df = track_persist(df.repartition(target))
    return df


def load_events_range(
    spark: SparkSession,
    sf_dir: str | None = None,
    ts_from: str | None = None,
    ts_to: str | None = None,
) -> DataFrame:
    """events with the time-range predicate applied on the RAW column.

    When events.ts arrives as long nanoseconds, a filter written
    against the converted TimestampType column cannot reach the parquet
    scan. Applying the equivalent long-ns bounds BEFORE conversion makes
    the range a PushedFilter — row-group stats prune whole chunks, which
    is the difference between scanning 100 TB and scanning the 10-day
    slice at cluster scale. When ts arrives as timestamp[us] the native
    timestamp predicate is itself pushable, so the literal is bound
    directly.
    """
    harden_session(spark)
    df = spark.read.parquet(os.path.join(sf_dir or DEFAULT_SF_DIR, "events.parquet"))
    if isinstance(df.schema["ts"].dataType, LongType):
        if ts_from is not None:
            df = df.filter(F.col("ts") >= F.lit(_utc_ns(ts_from)))
        if ts_to is not None:
            df = df.filter(F.col("ts") <= F.lit(_utc_ns(ts_to)))
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    else:
        if ts_from is not None:
            df = df.filter(F.col("ts") >= F.lit(ts_from).cast("timestamp"))
        if ts_to is not None:
            df = df.filter(F.col("ts") <= F.lit(ts_to).cast("timestamp"))
    return df


def register_views(spark: SparkSession, sf_dir: str | None = None) -> None:
    """Register every testdata table as a temp view for spark.sql()."""
    for name in TESTDATA_TABLES:
        load(spark, name, sf_dir).createOrReplaceTempView(name)
