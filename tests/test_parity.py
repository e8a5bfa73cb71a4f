"""Parity corpus (P1-P12): oracle differentials + capability checks."""

from conftest import CORPUS, SF_ORACLE


def _entry():
    # full corpus (driver + extra tiers); differential coverage for
    # every entry lives in test_oracle_corpus.py
    return CORPUS


def test_normalize_schema_is_schema_b(spark):
    """normalize_flows output must be exactly FLOW_NORMALIZED (9 cols,
    reference field order README.md:115-127)."""
    from netflow_analysis_with_spark_streaming_spark.schemas import FLOW_NORMALIZED

    df = _entry().queries()["parity_normalize_json"](spark, SF_ORACLE)
    assert df.schema == FLOW_NORMALIZED


def test_normalize_missing_fields_null(spark):
    """Absent JSON fields must surface as NULL (reference .get() -> None)."""
    from netflow_analysis_with_spark_streaming_spark.operators import normalize

    raw = spark.createDataFrame(
        [('{"event_type":"purge","bytes":168}',)], ["value"]
    )
    row = normalize.normalize_flows(raw).collect()[0]
    assert row["bytes"] == 168
    assert row["ip_src"] is None
    assert row["timestamp"] is None


def test_flatten_handles_dotted_names(spark):
    """Backtick dotted-leaf access: `ip.dst` is a FIELD NAME, not a path."""
    from netflow_analysis_with_spark_streaming_spark.operators import flatten
    from netflow_analysis_with_spark_streaming_spark import tables

    events = tables.load(spark, "events", SF_ORACLE).limit(5)
    nested = flatten.events_as_nested_packets(events)
    # the nested schema really has dotted field names
    ip_fields = nested.schema["_source"].dataType["layers"].dataType["ip"].dataType
    assert [f.name for f in ip_fields.fields] == ["ip.src", "ip.dst", "ip.version"]
    flat = flatten.flatten_packets(nested)
    assert flat.columns == [
        "ip_dst", "ip_src", "ip_ver", "timestamp",
        "tcp_dstport", "tcp_flags", "tcp_srcport", "datetime",
    ]


def test_two_col_routing_has_neither_rows(spark):
    """P7 exact semantics: routing must NOT be an exhaustive partition."""
    df = _entry().queries()["parity_two_col_routing"](spark, SF_ORACLE)
    total_neither = sum(r["neither_cnt"] for r in df.collect())
    assert total_neither > 0


def test_live_path_filter_drops_rows(spark):
    """The heartbeat-analog filter must remove something (evidence)."""
    from netflow_analysis_with_spark_streaming_spark import tables
    import pyspark.sql.functions as F

    events = tables.load(spark, "events", SF_ORACLE).filter(
        F.col("event_id") % 10 == 0
    )
    kept = _entry().queries()["parity_live_path"](spark, SF_ORACLE).count()
    assert kept < events.count()
