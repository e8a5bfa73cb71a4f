"""Property-style invariants (SURVEY.md §5.2.4), including
hypothesis-generated text inputs for the text functions and the
serving-layer bound."""

import json

import pytest
import pyspark.sql.functions as F
from hypothesis import given, settings, strategies as st

from conftest import SF_ORACLE

from netflow_analysis_with_spark_streaming_spark import serve, tables
from netflow_analysis_with_spark_streaming_spark.functions import text as T

# ASCII alnum words: the case-noise invariance below requires
# lower(upper(x)) == lower(x), which full Unicode does NOT satisfy —
# hypothesis found upper('ß') = 'SS' (lower-> 'ss' != 'ß'). Real
# fingerprint normalization for multilingual corpora should casefold(),
# not lower(); the engine-side md5 fingerprint itself is byte-stable.
_WORD = st.text(
    alphabet="abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789",
    min_size=1,
    max_size=8,
)
_TEXT = st.lists(_WORD, min_size=0, max_size=30).map(" ".join)


@settings(max_examples=20, deadline=None)
@given(texts=st.lists(_TEXT, min_size=1, max_size=8))
def test_text_function_invariants(spark, texts):
    """quality in [0,1]; shingle count == max(0, words-2); fingerprint
    invariant under case/whitespace noise — for arbitrary text."""
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], ["i", "text"])
    out = df.select(
        "text",
        T.quality_score(F.col("text"), ["the", "a"]).alias("q"),
        F.size(T.shingles(F.col("text"), 3)).alias("n_sh"),
        T.token_count_ws(F.col("text")).alias("n_w"),
        T.fingerprint(F.col("text")).alias("fp"),
        T.fingerprint(F.upper(F.concat(F.lit("  "), F.col("text")))).alias("fp_noisy"),
    ).collect()
    for r in out:
        assert 0.0 <= r["q"] <= 1.0, r
        expect_sh = max(0, r["n_w"] - 2) if r["text"].strip() else 0
        if r["text"].strip():
            assert r["n_sh"] == expect_sh, r
        assert r["fp"] == r["fp_noisy"], r


def test_flagship_in_out_partition_invariant(spark):
    """in_events + out_events == total filtered rows; in_value +
    out_value == total value (the flagship's routing is exhaustive
    by construction — P7-variant two-column routing is not)."""
    import importlib, sys

    mod = sys.modules.get("__spark_entry__") or importlib.import_module("__spark_entry__")
    res = mod.queries()["flagship_access_trend"](spark, SF_ORACLE).collect()
    ev = tables.load_events_range(spark, SF_ORACLE, "2024-01-05", "2024-01-15")
    total = ev.count()
    assert sum(r["in_events"] + r["out_events"] for r in res) == total


def test_path_union_schema_alignment(spark):
    """SURVEY §5.2.4: Path-1 (normalized flows) and Path-2 (flattened
    packets) project onto a shared shape and union cleanly."""
    from netflow_analysis_with_spark_streaming_spark.operators import flatten, normalize

    ev = tables.load(spark, "events", SF_ORACLE).limit(100)
    p1 = normalize.normalize_flows(
        normalize.kafka_value(normalize.events_as_flow_json(ev))
    ).select("ip_src", "ip_dst", "timestamp", F.col("port_src").cast("string"))
    p2 = flatten.flatten_packets(flatten.events_as_nested_packets(ev)).select(
        "ip_src", "ip_dst", "timestamp", F.col("tcp_srcport").alias("port_src")
    )
    u = p1.unionByName(p2)
    assert u.count() == 200
    assert u.columns == ["ip_src", "ip_dst", "timestamp", "port_src"]


def test_serve_payload_roundtrip_and_bound(spark):
    """K5: small results serialize to the HTTP payload shape; an
    unbounded result is refused BEFORE materializing on the driver."""
    import importlib, sys

    mod = sys.modules.get("__spark_entry__") or importlib.import_module("__spark_entry__")
    res = mod.queries()["flagship_access_trend"](spark, SF_ORACLE)
    payload = json.loads(serve.to_json_payload(res))
    assert len(payload) == 10
    assert set(payload[0]) == {"day", "in_value", "in_events", "out_value", "out_events"}

    big = tables.load(spark, "lineitem", SF_ORACLE)
    with pytest.raises(ValueError, match="exceeds"):
        serve.to_records(big, max_rows=100)


def test_latest_first_file_source(spark, tmp_path):
    """S2 latestFirst: newest file processed in the first batch."""
    import os, time
    from netflow_analysis_with_spark_streaming_spark.streaming import sources
    from netflow_analysis_with_spark_streaming_spark.schemas import FLOW_RAW

    d = tmp_path / "lf"
    d.mkdir()
    old = d / "old.json"
    old.write_text(json.dumps([{"event_type": "old", "bytes": 1}]))
    os.utime(old, (time.time() - 3600, time.time() - 3600))
    (d / "new.json").write_text(json.dumps([{"event_type": "new", "bytes": 2}]))
    raw = sources.json_file_source(
        spark, str(d), FLOW_RAW, max_files_per_trigger=1, latest_first=True
    )
    batches = []
    q = (
        raw.writeStream.foreachBatch(
            lambda df, bid: batches.append([r["event_type"] for r in df.collect()])
        )
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    q.awaitTermination()
    assert batches[0] == ["new"], batches
