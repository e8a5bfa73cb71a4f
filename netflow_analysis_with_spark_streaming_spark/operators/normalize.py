"""Path-1 normalization: raw JSON flow records → normalized flows.

Capability parity with the reference's Kafka-value pipeline
(`/root/reference/README.md:110-127`):

  P1  kafkaStream.map(lambda data: data[1])      -> value projection
  P2  mapper: json.loads + 9-field dict with .get() defaults
      (ip_proto -> protocol, timestamp_start -> timestamp)

Re-expressed Spark-first: ``from_json`` with the explicit Schema A
``StructType`` (missing fields become NULL natively — the same
semantics as the reference's ``.get() -> None``), then a columnar
rename-projection. No Python boundary: the reference's per-record
``json.loads`` in a Python lambda becomes a JVM-side codegen'd
expression, which is the 10-100x difference at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..schemas import FLOW_RAW


def kafka_value(df: DataFrame, value_col: str = "value") -> DataFrame:
    """P1: keep only the (castable) message value of a (key,value) pair."""
    return df.select(F.col(value_col).cast("string").alias("value"))


def normalize_flows(df: DataFrame, value_col: str = "value") -> DataFrame:
    """P2: parse Schema-A JSON and project/rename to Schema B.

    Field order and names follow FLOW_NORMALIZED (schemas.py); absent
    JSON fields surface as NULL columns, matching the reference's
    ``record.get(...) -> None`` behavior.
    """
    parsed = df.select(F.from_json(F.col(value_col), FLOW_RAW).alias("r"))
    return parsed.select(
        F.col("r.ip_src").alias("ip_src"),
        F.col("r.ip_dst").alias("ip_dst"),
        F.col("r.event_type").alias("event_type"),
        F.col("r.packets").alias("packets"),
        F.col("r.bytes").alias("bytes"),
        F.col("r.ip_proto").alias("protocol"),
        F.col("r.timestamp_start").alias("timestamp"),
        F.col("r.port_src").alias("port_src"),
        F.col("r.port_dst").alias("port_dst"),
    )


def _fake_ip(seed: Column, prefix: str = "10") -> Column:
    """Deterministic dotted-IPv4 synthesized from an integer column.

    The driver testdata has no IP columns; tests and parity queries
    derive stable fake ones from ids (pure integer math, reproducible
    in the DuckDB oracle)."""
    return F.concat_ws(
        ".",
        F.lit(prefix),
        (seed % 16).cast("string"),
        (F.shiftright(seed, 4) % 256).cast("string"),
        (F.shiftright(seed, 12) % 256).cast("string"),
    )


def events_as_flow_json(events: DataFrame) -> DataFrame:
    """Map the driver `events` table onto Schema-A JSON strings.

    Stand-in for the Kafka topic: each event becomes one pmacct-shaped
    record (ips/ports derived from ids with integer math, bytes from
    `value`). Produces a single `value` string column like S1 would.
    """
    rec = F.struct(
        F.col("event_type").alias("event_type"),
        _fake_ip(F.col("user_id")).alias("ip_src"),
        _fake_ip(F.col("event_id")).alias("ip_dst"),
        (F.col("user_id") % 64512 + 1024).cast("int").alias("port_src"),
        (F.col("event_id") % 1024).cast("int").alias("port_dst"),
        F.lit("tcp").alias("ip_proto"),
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("timestamp_start"),
        F.floor(F.col("value") * 1000).cast("long").alias("bytes"),
        (F.col("event_id") % 100 + 1).cast("long").alias("packets"),
    )
    return events.select(F.to_json(rec).alias("value"))
