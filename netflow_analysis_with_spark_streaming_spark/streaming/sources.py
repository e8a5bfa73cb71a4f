"""Streaming sources: file-based (testable here) + Kafka (config-level).

Reference provenance:
- S2 file JSON source: README.md:226-233 (`readStream.schema(s)
  .option('maxFilesPerTrigger',1).json(dir, multiLine=True)`) — kept
  verbatim, it is already idiomatic Structured Streaming.
- S1 Kafka DStream receiver: README.md:98 — re-expressed as the
  kafka DataSource v2; S6 latest-offsets consumer:
  websocket-server/index.js:10-18.
- T8 backpressure: maxFilesPerTrigger (README.md:230) /
  maxOffsetsPerTrigger.

No Kafka broker exists in this environment, so the Kafka builders
return configured readers/writers without starting them; option
correctness is unit-tested, broker integration is not (flagged, not
hidden).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def json_file_source(
    spark: SparkSession,
    path: str,
    schema: StructType,
    max_files_per_trigger: int | None = 1,
    multi_line: bool = True,
    latest_first: bool = False,
    file_name_only: bool = False,
) -> DataFrame:
    """S2: monitor a directory of JSON files as a stream.

    Streaming file sources require an explicit schema (no inference) —
    same constraint the reference documents. maxFilesPerTrigger is the
    file-source backpressure knob (T8); latestFirst/fileNameOnly are
    the remaining documented S2 options (README.md:238-241) —
    fileNameOnly makes dedup of already-seen files ignore the
    directory component (re-delivered files under new paths skip).
    """
    reader = spark.readStream.schema(schema).option("multiLine", multi_line)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    if latest_first:
        reader = reader.option("latestFirst", "true")
    if file_name_only:
        reader = reader.option("fileNameOnly", "true")
    return reader.json(path)


def parquet_file_source(
    spark: SparkSession,
    path: str,
    schema: StructType,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Parquet variant of S2 — used to replay the driver testdata as a
    stream (the parquet footer schema is NOT auto-used in streaming;
    pass it explicitly)."""
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(path)


def csv_file_source(
    spark: SparkSession,
    path: str,
    schema: StructType,
    header: bool = True,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """CSV variant of S2 — pmacct and tshark both optionally emit CSV;
    same explicit-schema contract as the JSON source."""
    reader = spark.readStream.schema(schema).option("header", header)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.csv(path)


def binary_file_source(spark: SparkSession, path: str, glob: str | None = None) -> DataFrame:
    """Batch ingestion of opaque media files as binary rows
    (path, modificationTime, length, content) — the on-ramp that feeds
    functions/multimodal.decode_media. Streaming equivalent: the same
    directory monitored with a file-listing source and mapInPandas
    decode in foreachBatch.
    """
    reader = spark.read.format("binaryFile")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    return reader.load(path)


def kafka_source_options(
    brokers: str,
    topic: str,
    starting_offsets: str = "latest",
    max_offsets_per_trigger: int | None = None,
) -> dict[str, str]:
    """S1/S6 option set for `spark.readStream.format('kafka')`.

    startingOffsets='latest' matches the reference consumer's
    `fromOffset:'lastest'` (sic) intent; maxOffsetsPerTrigger is the
    Kafka backpressure bound (T8) the DStream app lacked.
    """
    opts = {
        "kafka.bootstrap.servers": brokers,
        "subscribe": topic,
        "startingOffsets": starting_offsets,
        "failOnDataLoss": "false",
    }
    if max_offsets_per_trigger is not None:
        opts["maxOffsetsPerTrigger"] = str(max_offsets_per_trigger)
    return opts


def kafka_connector_available(spark: SparkSession) -> bool:
    """True when the spark-sql-kafka connector is on the session's JVM
    classpath. pyspark does not bundle it, and this sandbox ships no
    jar or broker — but a cluster deployment launched with
    spark.jars.packages gets the live S1/S6/K2 path; callers (and the
    opportunistic integration test) use this probe to pick the real
    Kafka roundtrip vs the socket stand-in instead of failing at plan
    time."""
    try:
        spark._jvm.java.lang.Class.forName(  # type: ignore[union-attr]
            "org.apache.spark.sql.kafka010.KafkaSourceProvider"
        )
        return True
    except Exception:
        return False


def kafka_broker_reachable(brokers: str, timeout_s: float = 1.0) -> bool:
    """TCP-probe the first bootstrap broker (jar without broker still
    can't run a roundtrip)."""
    import socket

    host, _, port = brokers.split(",")[0].partition(":")
    try:
        socket.create_connection((host, int(port or 9092)), timeout_s).close()
        return True
    except OSError:
        return False


def kafka_reader(spark: SparkSession, brokers: str, topic: str, **kw) -> DataFrame:
    """Configured (unstarted) Kafka streaming read.

    Requires the spark-sql-kafka connector on the classpath (it is NOT
    bundled with pyspark); without it the load fails at plan time —
    re-raised here with the fix spelled out instead of Spark's generic
    'failed to find data source'.
    """
    reader = spark.readStream.format("kafka")
    for k, v in kafka_source_options(brokers, topic, **kw).items():
        reader = reader.option(k, v)
    try:
        return reader.load()
    except Exception as ex:  # AnalysisException: data source not found
        if "Failed to find data source: kafka" in str(ex):
            raise RuntimeError(
                "the Kafka connector is not on the classpath; launch with "
                "spark.jars.packages="
                "org.apache.spark:spark-sql-kafka-0-10_2.13:<spark-version> "
                "(no broker/connector exists in this test environment)"
            ) from ex
        raise
