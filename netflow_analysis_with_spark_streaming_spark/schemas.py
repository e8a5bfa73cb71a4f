"""Record schemas (reference Schemas A-D, SURVEY.md §1.2) + testdata schemas.

Provenance (capability parity, not code copy):
- Schema A: pmacct flow record sample, reference README.md:105 (key list :57)
- Schema B: normalized flow record, reference README.md:115-127, 345-355
- Schema C: tshark nested packet record, reference README.md:259-286
- Schema D: day-aggregate result, reference README.md:360-367,
  http-server/src/api/controllers/accessTrend.ts:71-86

Streaming file sources require explicit schemas (no inference); batch
parquet readers get their schema from the footer, but we pin the
testdata shapes here for validation.
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

# --- Schema A: raw pmacct flow record (Kafka JSON value / JSONL files) ---
# ints that count bytes/packets are Long: at 100 TB a 32-bit counter overflows.
FLOW_RAW = StructType(
    [
        StructField("event_type", StringType()),
        StructField("iface_in", IntegerType()),
        StructField("iface_out", IntegerType()),
        StructField("ip_src", StringType()),
        StructField("ip_dst", StringType()),
        StructField("port_src", IntegerType()),
        StructField("port_dst", IntegerType()),
        StructField("tcp_flags", StringType()),
        StructField("ip_proto", StringType()),
        StructField("tos", IntegerType()),
        StructField("timestamp_start", StringType()),
        StructField("timestamp_end", StringType()),
        StructField("timestamp_arrival", StringType()),
        StructField("packets", LongType()),
        StructField("bytes", LongType()),
        StructField("writer_id", StringType()),
    ]
)

# --- Schema B: normalized flow record (output of the normalize operator) ---
FLOW_NORMALIZED = StructType(
    [
        StructField("ip_src", StringType()),
        StructField("ip_dst", StringType()),
        StructField("event_type", StringType()),
        StructField("packets", LongType()),
        StructField("bytes", LongType()),
        StructField("protocol", StringType()),
        StructField("timestamp", StringType()),
        StructField("port_src", IntegerType()),
        StructField("port_dst", IntegerType()),
    ]
)

# --- Schema C: tshark nested packet record (Path-2 multiline JSON files) ---
# Dotted leaf names ("ip.dst") are real field names, accessed with backticks.
PACKET_NESTED = StructType(
    [
        StructField(
            "_source",
            StructType(
                [
                    StructField(
                        "layers",
                        StructType(
                            [
                                StructField(
                                    "frame",
                                    StructType([StructField("frame.time_epoch", StringType())]),
                                ),
                                StructField(
                                    "ip",
                                    StructType(
                                        [
                                            StructField("ip.src", StringType()),
                                            StructField("ip.dst", StringType()),
                                            StructField("ip.version", StringType()),
                                        ]
                                    ),
                                ),
                                StructField(
                                    "tcp",
                                    StructType(
                                        [
                                            StructField("tcp.srcport", StringType()),
                                            StructField("tcp.dstport", StringType()),
                                            StructField("tcp.flags", StringType()),
                                        ]
                                    ),
                                ),
                            ]
                        ),
                    )
                ]
            ),
        )
    ]
)

# Flattened Schema C target (all strings, reference README.md:274-286).
PACKET_FLAT_COLUMNS = [
    "ip_dst",
    "ip_src",
    "ip_ver",
    "timestamp",
    "tcp_dstport",
    "tcp_flags",
    "tcp_srcport",
]

# --- Schema D: flagship day-aggregate result ---
ACCESS_TREND = StructType(
    [
        StructField("day", StringType()),
        StructField("in_value", DoubleType()),
        StructField("in_events", LongType()),
        StructField("out_value", DoubleType()),
        StructField("out_events", LongType()),
    ]
)

# --- Driver testdata schemas (TESTDATA.md / FIXTURES.md) ---
EVENTS = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("props", StringType()),
    ]
)

DOCUMENTS = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("text", StringType()),
        StructField("lang", StringType()),
        StructField("source", StringType()),
        StructField("n_chars", LongType()),
    ]
)

EMBEDDINGS = StructType(
    [
        StructField("vec_id", LongType()),
        StructField("embedding", ArrayType(FloatType())),
        StructField("label", IntegerType()),
    ]
)

TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)
