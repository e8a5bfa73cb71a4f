"""Path-2 flatten: tshark nested packet records → flat string columns.

Capability parity with the reference's Structured Streaming projection
(`/root/reference/README.md:250-268`):

  P3  seven nested leaves `_source.layers.{frame,ip,tcp}.*` extracted
      with backtick-quoted dotted field names and aliased flat
  P4  string -> TimestampType conversion; the reference uses a Python
      row-UDF (README.md:250-254), here it is the built-in
      ``timestamp_seconds(cast(double))`` — JVM-side, codegen'd.

The flattened schema is all-strings (reference printSchema,
README.md:274-286) plus the converted `datetime` column.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Leaf path -> flat name, exactly the reference's seven projections.
_LEAVES = [
    ("_source.layers.ip.`ip.dst`", "ip_dst"),
    ("_source.layers.ip.`ip.src`", "ip_src"),
    ("_source.layers.ip.`ip.version`", "ip_ver"),
    ("_source.layers.frame.`frame.time_epoch`", "timestamp"),
    ("_source.layers.tcp.`tcp.dstport`", "tcp_dstport"),
    ("_source.layers.tcp.`tcp.flags`", "tcp_flags"),
    ("_source.layers.tcp.`tcp.srcport`", "tcp_srcport"),
]


def flatten_packets(df: DataFrame, with_datetime: bool = True) -> DataFrame:
    """Flatten Schema-C nested packets to the seven flat string columns.

    ``with_datetime`` adds the P4 conversion: the epoch-seconds string
    (`frame.time_epoch`, e.g. "1573452000.043547") parsed to a real
    TimestampType — microsecond-exact via double seconds.
    """
    out = df.select(*[F.col(path).alias(name) for path, name in _LEAVES])
    if with_datetime:
        # Exact integer micro math, not timestamp_seconds(double): double
        # seconds are ~0.2 µs granular at current epochs and can round a
        # microsecond off; sec*1e6 + frac is bit-exact and still all
        # built-in (the reference used a Python row-UDF here).
        sec = F.split(F.col("timestamp"), "[.]").getItem(0).cast("long")
        frac = F.rpad(F.split(F.col("timestamp"), "[.]").getItem(1), 6, "0").cast("long")
        out = out.withColumn("datetime", F.timestamp_micros(sec * 1000000 + frac))
    return out


def events_as_nested_packets(events: DataFrame) -> DataFrame:
    """Map the driver `events` table onto Schema-C nested structs.

    Builds the `_source.layers.{frame,ip,tcp}` nesting (dotted leaf
    names included) so the flatten operator has real nested input.
    All leaves are strings, as tshark emits them.
    """
    frame = F.struct(
        F.concat(
            (F.unix_timestamp("ts")).cast("string"),
            F.lit("."),
            F.lpad((F.col("event_id") % 1000000).cast("string"), 6, "0"),
        ).alias("frame.time_epoch")
    )
    ip = F.struct(
        F.concat_ws(
            ".", F.lit("172"), F.lit("16"), (F.col("user_id") % 256).cast("string"),
            (F.shiftright(F.col("user_id"), 8) % 256).cast("string"),
        ).alias("ip.src"),
        F.concat_ws(
            ".", F.lit("192"), F.lit("168"), (F.col("event_id") % 256).cast("string"),
            (F.shiftright(F.col("event_id"), 8) % 256).cast("string"),
        ).alias("ip.dst"),
        F.lit("4").alias("ip.version"),
    )
    tcp = F.struct(
        (F.col("user_id") % 64512 + 1024).cast("string").alias("tcp.srcport"),
        (F.col("event_id") % 1024).cast("string").alias("tcp.dstport"),
        (F.col("event_id") % 32).cast("string").alias("tcp.flags"),
    )
    layers = F.struct(frame.alias("frame"), ip.alias("ip"), tcp.alias("tcp"))
    return events.select(F.struct(layers.alias("layers")).alias("_source"))


# DuckDB oracle for flatten_packets(with_datetime=True) over the
# sampled events stream (shared by the batch parity entry and the
# streaming path-2 entry, which have identical semantics).
FLATTEN_ORACLE_SQL = """
SELECT CONCAT('192.168.', CAST(event_id % 256 AS VARCHAR), '.',
              CAST((event_id >> 8) % 256 AS VARCHAR)) AS ip_dst,
       CONCAT('172.16.', CAST(user_id % 256 AS VARCHAR), '.',
              CAST((user_id >> 8) % 256 AS VARCHAR)) AS ip_src,
       '4' AS ip_ver,
       CONCAT(CAST(CAST(FLOOR(epoch(ts)) AS BIGINT) AS VARCHAR), '.',
              lpad(CAST(event_id % 1000000 AS VARCHAR), 6, '0')) AS timestamp,
       CAST(event_id % 1024 AS VARCHAR) AS tcp_dstport,
       CAST(event_id % 32 AS VARCHAR) AS tcp_flags,
       CAST(user_id % 64512 + 1024 AS VARCHAR) AS tcp_srcport,
       make_timestamp(CAST(FLOOR(epoch(ts)) AS BIGINT) * 1000000
                      + event_id % 1000000) AS datetime
FROM events
WHERE event_id % 10 = 0
"""
