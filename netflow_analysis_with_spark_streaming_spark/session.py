"""SparkSession factory.

Defaults are chosen for correctness parity with the DuckDB oracle
(UTC session timezone — Spark timestamps are session-TZ, DuckDB's are
UTC-naive) and for scale (AQE on, skew-join handling on, Arrow for the
few pandas-UDF paths).

At 100 TB the same builder is used with a real ``master`` URL; only
``spark.sql.shuffle.partitions`` / ``maxPartitionBytes`` move with the
cluster size (see ``scale_hints``).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Local test parallelism; the driver runs local[$SPARK_GRAFT_CPUS].
DEFAULT_CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "netflow-engine",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with engine defaults.

    ``shuffle_partitions`` defaults to the local core count; on a real
    cluster pass ~2-3x total executor cores (AQE coalesces down, so
    over-provisioning is cheap, under-provisioning is not).
    """
    cpus = DEFAULT_CPUS
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master or f"local[{cpus}]")
        # Oracle parity: DuckDB timestamps are UTC-naive.
        .config("spark.sql.session.timeZone", "UTC")
        # Runtime re-planning: shuffle-partition coalescing, skew-join
        # splitting, dynamic broadcast — all essential at 100 TB.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or cpus))
        # Arrow transfer for pandas UDF paths (similarity/multimodal).
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Bound single-task input so a 100 TB scan parallelizes sanely.
        .config("spark.sql.files.maxPartitionBytes", "128m")
        .config("spark.sql.parquet.filterPushdown", "true")
        # Parquet TIMESTAMP(NANOS) (events.ts) is unsupported natively;
        # read as long ns and convert in tables.load (exact integer math).
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # timestamp[us] isAdjustedToUTC=false generations must read as
        # UTC-instant TIMESTAMP, not TIMESTAMP_NTZ (see harden_session).
        .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
        .config("spark.ui.enabled", "false")
        # Heap sizing (round 14, guide §5/§9): in local mode the ONE
        # JVM is driver + every executor, and an unset driver.memory
        # leaves it at spark-submit's 1g default — measured on this
        # 128 GiB sandbox: 32 concurrent tasks sharing ~600 MB of
        # execution+storage memory with all table caches, i.e. ~19 MB
        # execution memory per task slot and constant GC/eviction
        # churn. A builder value takes effect whenever THIS process
        # starts the JVM (bench.py, tools, tests); when getOrCreate()
        # attaches to an already-running JVM it is a documented no-op,
        # so an embedding application's own sizing always wins.
        # Env-overridable for cluster runs, where executor memory is
        # sized separately and the driver needs no data heap.
        .config(
            "spark.driver.memory",
            os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"),
        )
    )
    kafka_pkg = _kafka_packages_from_env()
    if kafka_pkg:
        # opportunistic live-Kafka path (S1/S6/K2): resolve the
        # connector at session build on network-enabled deployments.
        # Like driver.memory this only takes effect on the session
        # that STARTS the JVM; resolution failures surface as the
        # builder's own error (no silent fallback — the operator asked
        # for the live path explicitly).
        builder = builder.config("spark.jars.packages", kafka_pkg)
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


def _kafka_packages_from_env() -> str | None:
    """The NETFLOW_KAFKA_PACKAGES opt-in (documented in README):
    unset/empty/0 -> None (sandbox default: no jar, tests record an
    explicit skip); "1" -> the spark-sql-kafka coordinate matching the
    running PySpark (Spark 4.x is Scala 2.13); any other value is
    used verbatim as the spark.jars.packages coordinate list, for
    pinned mirrors or extra jars."""
    flag = os.environ.get("NETFLOW_KAFKA_PACKAGES", "").strip()
    if flag in ("", "0"):
        return None
    if flag == "1":
        import pyspark

        # Scala suffix must match the RUNTIME, not be hardcoded:
        # Spark 4.x ships Scala 2.13, Spark 3.x ships 2.12 — the
        # wrong suffix resolves fine from Maven and then fails with
        # NoSuchMethodError at stream start.
        major = int(pyspark.__version__.split(".", 1)[0])
        scala = "2.13" if major >= 4 else "2.12"
        return (
            f"org.apache.spark:spark-sql-kafka-0-10_{scala}:"
            + pyspark.__version__
        )
    return flag


def scale_hints(total_executor_cores: int, input_tb: float) -> dict[str, str]:
    """Suggested conf for a real cluster run (documentation-as-code).

    E.g. 1000 executors x 4 cores reading 100 TB:
    shuffle partitions ~ max(2x cores, input / 200 MB target partition).
    """
    target_partition_mb = 200
    by_cores = 2 * total_executor_cores
    by_bytes = int(input_tb * 1024 * 1024 / target_partition_mb)
    return {
        "spark.sql.shuffle.partitions": str(max(by_cores, min(by_bytes, 64000))),
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.files.maxPartitionBytes": "256m",
        "spark.sql.autoBroadcastJoinThreshold": "64m",
    }
