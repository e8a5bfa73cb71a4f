"""Reference-parity query corpus: P1-P4 and P7-P12 (SURVEY.md §2.3).

Each entry exercises one projection/filter/scalar capability of the
reference pipeline on the driver testdata. IP-shaped columns are
synthesized deterministically from integer ids (pure integer math,
mirrored exactly in the DuckDB oracles) because the testdata has no
IP columns — see operators/normalize._fake_ip.

To keep driver compares fast, row-level queries sample every 10th
event (deterministic `event_id % 10` predicate, pushed to the scan).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import tables
from .operators import access_trend as _at
from .operators import flatten as _fl
from .operators import normalize as _nm
from .queries import register

# Shared fake-ip SQL fragments (mirror operators/normalize._fake_ip).
_IP_SRC_SQL = (
    "CONCAT('10.', CAST(user_id % 16 AS VARCHAR), '.', "
    "CAST((user_id >> 4) % 256 AS VARCHAR), '.', "
    "CAST((user_id >> 12) % 256 AS VARCHAR))"
)
_IP_DST_SQL = (
    "CONCAT('10.', CAST(event_id % 16 AS VARCHAR), '.', "
    "CAST((event_id >> 4) % 256 AS VARCHAR), '.', "
    "CAST((event_id >> 12) % 256 AS VARCHAR))"
)


def _sampled_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return tables.load(spark, "events", sf_dir).filter(F.col("event_id") % 10 == 0)


# --- P1+P2: Kafka value -> from_json -> 9-field normalize ------------------


def _parity_normalize_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Path-1 normalization end-to-end: JSON string value -> Schema B.

    The JSON round-trip (to_json builder + from_json parse) runs
    entirely JVM-side; the reference's per-record json.loads lambda
    (README.md:115-127) is the Python-boundary anti-pattern this
    replaces. Scale: narrow op, no shuffle, codegen'd.
    """
    raw = _nm.events_as_flow_json(_sampled_events(spark, sf_dir))
    return _nm.normalize_flows(_nm.kafka_value(raw))


_PARITY_NORMALIZE_SQL = f"""
SELECT {_IP_SRC_SQL} AS ip_src,
       {_IP_DST_SQL} AS ip_dst,
       event_type,
       CAST(event_id % 100 + 1 AS BIGINT) AS packets,
       CAST(FLOOR(value * 1000) AS BIGINT) AS bytes,
       'tcp' AS protocol,
       strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS timestamp,
       CAST(user_id % 64512 + 1024 AS INTEGER) AS port_src,
       CAST(event_id % 1024 AS INTEGER) AS port_dst
FROM events
WHERE event_id % 10 = 0
"""


# --- P3+P4: nested flatten + timestamp conversion --------------------------


def _parity_flatten_nested(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Path-2 flatten: Schema-C nesting -> 7 flat strings + datetime.

    Exercises backtick dotted-leaf access (`ip.dst` is a field NAME)
    and the built-in epoch-string -> TimestampType conversion that
    replaces the reference's row-UDF (README.md:250-268).
    """
    nested = _fl.events_as_nested_packets(_sampled_events(spark, sf_dir))
    return _fl.flatten_packets(nested, with_datetime=True)


# Oracle lives next to the operator (operators/flatten.py) so both
# this module and queries_streaming can reuse it without a
# registrar-to-registrar import (breaks under direct submodule import).
_PARITY_FLATTEN_SQL = _fl.FLATTEN_ORACLE_SQL


# --- P4 standalone: formatted string -> timestamp --------------------------


def _parity_timestamp_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String -> TimestampType with an explicit format (the canonical
    P4 surface; reference README.md:250-254 used a UDF)."""
    events = _sampled_events(spark, sf_dir)
    s = F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS")
    return events.select(
        F.col("event_id"),
        s.alias("ts_string"),
        F.to_timestamp(s, "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("ts_parsed"),
    )


_PARITY_TS_CONVERT_SQL = """
SELECT event_id,
       strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS ts_string,
       strptime(strftime(ts, '%Y-%m-%d %H:%M:%S.%f'), '%Y-%m-%d %H:%M:%S.%f') AS ts_parsed
FROM events
WHERE event_id % 10 = 0
"""


# --- P7 exact semantics: two independent routing columns -------------------


def _parity_two_col_routing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference-exact $cond routing: IN and OUT are *independent*
    predicates on different columns (accessTrend.ts:25-68 routes on
    ip_dst vs ip_src) — a row may match both or neither, unlike a
    predicate+complement partition. `neither_cnt` proves the gap.
    """
    events = tables.load_events_range(spark, sf_dir, "2024-01-05", "2024-01-15")
    in_cond = F.col("event_type") == "purchase"
    out_cond = F.col("user_id") % 7 == 0
    return (
        events.select(
            F.date_format("ts", "yyyy-MM-dd").alias("day"),
            F.when(in_cond, F.col("value")).otherwise(F.lit(0.0)).alias("in_v"),
            F.when(out_cond, F.col("value")).otherwise(F.lit(0.0)).alias("out_v"),
            F.when(~in_cond & ~out_cond, F.lit(1)).otherwise(F.lit(0)).alias("neither"),
        )
        .groupBy("day")
        .agg(
            F.round(F.sum("in_v"), 2).alias("in_value"),
            F.round(F.sum("out_v"), 2).alias("out_value"),
            F.sum("neither").cast("long").alias("neither_cnt"),
        )
        .orderBy("day")
    )


_PARITY_TWO_COL_SQL = """
SELECT strftime(ts, '%Y-%m-%d') AS day,
       ROUND(SUM(CASE WHEN event_type = 'purchase' THEN value ELSE 0 END), 2) AS in_value,
       ROUND(SUM(CASE WHEN user_id % 7 = 0 THEN value ELSE 0 END), 2) AS out_value,
       CAST(SUM(CASE WHEN event_type <> 'purchase' AND user_id % 7 <> 0 THEN 1 ELSE 0 END) AS BIGINT) AS neither_cnt
FROM events
WHERE ts >= TIMESTAMP '2024-01-05' AND ts <= TIMESTAMP '2024-01-15'
GROUP BY 1
ORDER BY 1
"""


# --- P8+P9+P10: live-path trio ---------------------------------------------


def _parity_live_path(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Websocket live path (websocket-server/index.js:41-46): heartbeat
    filter -> time-of-day substring -> 2-column projection.

    'signup' plays the heartbeat literal (the testdata has no
    heartbeat records; the filter must actually drop rows to be
    evidence). Row-level, no shuffle — at scale this is the streaming
    hot path, pure narrow ops.
    """
    events = _sampled_events(spark, sf_dir)
    return events.filter(F.col("event_type") != "signup").select(
        F.date_format("ts", "HH:mm:ss").alias("time"),
        F.round("value", 2).alias("bytes_value"),
    )


_PARITY_LIVE_PATH_SQL = """
SELECT strftime(ts, '%H:%M:%S') AS time,
       ROUND(value, 2) AS bytes_value
FROM events
WHERE event_id % 10 = 0 AND event_type <> 'signup'
"""


# --- P11: metric switch ----------------------------------------------------


def _parity_metric_switch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The flagship parameterized on an alternate metric column
    (AccessTrend.jsx:25-34 switches bytes <-> packets client-side;
    here the engine switches, reusing the same operator with
    value_col='k' extracted from the props JSON)."""
    events = tables.load_events_range(
        spark, sf_dir, _at.DEFAULT_TS_FROM, _at.DEFAULT_TS_TO
    ).withColumn("k", F.get_json_object("props", "$.k").cast("double"))
    return _at.access_trend(events, value_col="k")


_PARITY_METRIC_SWITCH_SQL = """
SELECT strftime(ts, '%Y-%m-%d') AS day,
       ROUND(SUM(CASE WHEN event_type = 'purchase' THEN CAST(json_extract_string(props, '$.k') AS DOUBLE) ELSE 0 END), 2) AS in_value,
       CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS in_events,
       ROUND(SUM(CASE WHEN event_type <> 'purchase' THEN CAST(json_extract_string(props, '$.k') AS DOUBLE) ELSE 0 END), 2) AS out_value,
       CAST(SUM(CASE WHEN event_type <> 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS out_events
FROM events
WHERE ts >= TIMESTAMP '2024-01-05' AND ts <= TIMESTAMP '2024-01-15'
GROUP BY 1
ORDER BY 1
"""


# --- P12: CIDR-prefix predicate --------------------------------------------


def _parity_cidr_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """pcap-filter analog (README.md:58-59 `src net 10.0.0.0/16`):
    prefix predicate over dotted IPs. A dotted-string LIKE works for
    octet-aligned prefixes; production CIDR is an integer mask
    compare ((ip_int >> (32-len)) == net) — both shown here, the mask
    variant on the raw integer so it can push to the scan.
    """
    events = tables.load(spark, "events", sf_dir)
    ip = _nm._fake_ip(F.col("user_id"))
    return (
        events.withColumn("ip_src", ip)
        .filter(F.col("ip_src").like("10.3.%") & (F.col("user_id") % 16 == 3))
        .groupBy("event_type")
        .agg(
            F.count("*").alias("cnt"),
            F.count_distinct("ip_src").alias("distinct_ips"),
        )
        .orderBy("event_type")
    )


_PARITY_CIDR_SQL = f"""
SELECT event_type,
       COUNT(*) AS cnt,
       COUNT(DISTINCT {_IP_SRC_SQL}) AS distinct_ips
FROM events
WHERE {_IP_SRC_SQL} LIKE '10.3.%' AND user_id % 16 = 3
GROUP BY event_type
ORDER BY event_type
"""


def _parity_kafka_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K2 record shaping proven lossless: normalized flows -> Kafka
    (key, value-JSON) records -> parsed back to Schema B. The sink
    payload the distributed producer emits must reconstruct the exact
    rows (the reference's driver-collect producer had no such check).
    """
    from .schemas import FLOW_NORMALIZED
    from .streaming.sinks import to_kafka_records

    flows = _parity_normalize_json(spark, sf_dir)
    records = to_kafka_records(flows, key_col="ip_src")
    return records.select(
        F.from_json(F.col("value"), FLOW_NORMALIZED).alias("r")
    ).select("r.*")


# Driver tier. parity_kafka_roundtrip normalizes THEN round-trips
# through the Kafka record shape, so its hash-exact pass covers
# parity_normalize_json's semantics; parity_metric_switch is the
# driver-checked flagship on an alternate column — both folded to the
# extra tier to fit the harness' 50-entry window.
register("parity_kafka_roundtrip", _parity_kafka_roundtrip, _PARITY_NORMALIZE_SQL)
# Retired to the pytest tier in round 6 (its oracle is the SAME SQL the
# driver-tier stream_path2_flatten entry hashes against, so P3/S4 keep
# driver evidence); displaced by the late-data DLQ router entry.
register(
    "parity_flatten_nested", _parity_flatten_nested, _PARITY_FLATTEN_SQL, driver=False
)
# Rotated to the extra tier in round 5 (driver window is capped at 50):
# the timestamp-convert and two-col-routing semantics are near-duplicates
# of parity_flatten_nested / the flagship family; the pytest oracle
# differential still hash-checks both every run.
register("parity_timestamp_convert", _parity_timestamp_convert, _PARITY_TS_CONVERT_SQL, driver=False)
register("parity_two_col_routing", _parity_two_col_routing, _PARITY_TWO_COL_SQL, driver=False)
# Retired to the pytest tier in round 6 (driver window promotion of
# the round-5 corpus flagships): P8-P12 / P12 semantics are one-liner
# selects, still fully oracle-differential-tested in pytest.
register("parity_live_path", _parity_live_path, _PARITY_LIVE_PATH_SQL, driver=False)
register("parity_cidr_filter", _parity_cidr_filter, _PARITY_CIDR_SQL, driver=False)
def _parity_corrupt_records(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Malformed-input discipline (the ingest reality the reference's
    json.loads lambda would CRASH on): every 7th record is truncated
    mid-JSON; from_json in PERMISSIVE mode yields NULL for those rows,
    which are counted per type — corrupt data is quarantined, never
    dropped silently and never fatal."""
    ev = _sampled_events(spark, sf_dir)
    value = F.to_json(F.struct("event_id", "user_id", "value"))
    corrupted = F.when(
        F.col("event_id") % 7 == 0, F.substring(value, 1, 10)
    ).otherwise(value)
    parsed = F.from_json(
        corrupted, "event_id bigint, user_id bigint, value double"
    )
    return (
        ev.select("event_type", parsed.alias("p"))
        .groupBy("event_type")
        .agg(
            F.count(F.col("p.event_id")).alias("n_good"),
            F.sum(F.col("p.event_id").isNull().cast("long")).alias("n_bad"),
        )
        .orderBy("event_type")
    )


_PARITY_CORRUPT_SQL = """
SELECT event_type,
       CAST(SUM(CASE WHEN event_id % 7 <> 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_good,
       CAST(SUM(CASE WHEN event_id % 7 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_bad
FROM events
WHERE event_id % 10 = 0
GROUP BY event_type ORDER BY event_type
"""


register("parity_normalize_json", _parity_normalize_json, _PARITY_NORMALIZE_SQL, driver=False)
register("parity_metric_switch", _parity_metric_switch, _PARITY_METRIC_SWITCH_SQL, driver=False)
register("parity_corrupt_records", _parity_corrupt_records, _PARITY_CORRUPT_SQL, driver=False)


# Report this registrar's completion — covers users importing a
# registrar submodule directly, where queries.py's own registrar
# imports re-enter this module mid-body. registrar_done is defined
# ABOVE queries.py's registrar imports, so it exists whenever this
# tail executes; the LAST registrar to finish (in any import order)
# triggers the one STRICT driver-order validation in queries.py.
from . import queries as _queries_registry  # noqa: E402

_queries_registry.registrar_done("queries_parity")
