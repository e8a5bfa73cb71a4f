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


@settings(max_examples=6, deadline=None)
@given(
    docs=st.lists(
        st.lists(st.sampled_from(["aa", "bb", "cc"]), min_size=0, max_size=40).map(
            " ".join
        ),
        min_size=1,
        max_size=6,
    )
)
def test_substring_dedup_equals_naive(spark, docs):
    """corpus_substring_dedup against an INDEPENDENT naive Python
    reference (the DuckDB oracle shares the sliding-window
    construction, so a spec-level bug could pass both; this reference
    is written straight from the spec: every repeated >=L-token window
    keeps its (min doc_id, min pos) occurrence, later occurrences mark
    their positions, uncovered tokens reassemble in order). A 3-word
    vocabulary forces dense window collisions the real corpus never
    produces."""
    import hashlib
    import shutil
    import tempfile

    from netflow_analysis_with_spark_streaming_spark import queries as Q
    from netflow_analysis_with_spark_streaming_spark.queries_extensions import (
        _SUBSTR_L as L,
    )

    toks = {i: [w for w in t.split() if w] for i, t in enumerate(docs)}
    occs: dict[str, list[tuple[int, int]]] = {}
    for i in sorted(toks):
        w = toks[i]
        for p in range(0, len(w) - L + 1):
            occs.setdefault(" ".join(w[p : p + L]), []).append((i, p))
    covered: dict[int, set] = {i: set() for i in toks}
    for key in occs:
        for d, p in sorted(occs[key])[1:]:
            covered[d].update(range(p, p + L))
    expect = {}
    for i, w in toks.items():
        if not w:
            continue  # zero-word docs contribute no row
        kept = [t for j, t in enumerate(w) if j not in covered[i]]
        expect[i] = (
            len(w),
            len(kept),
            len(w) - len(kept),
            hashlib.md5(" ".join(kept).encode()).hexdigest(),
        )

    tmp = tempfile.mkdtemp(prefix="netflow_substr_prop_")
    try:
        spark.createDataFrame(
            [(i, "en", t) for i, t in enumerate(docs)], ["doc_id", "lang", "text"]
        ).write.parquet(f"{tmp}/documents.parquet")
        got = {
            r["doc_id"]: (
                r["n_tokens"],
                r["kept_tokens"],
                r["removed_tokens"],
                r["cleaned_md5"],
            )
            for r in Q.all_queries()["corpus_substring_dedup"](spark, tmp).collect()
        }
        assert got == expect
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


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


@settings(max_examples=15, deadline=None)
@given(
    lefts=st.lists(
        st.tuples(st.integers(1, 3), st.integers(0, 20)), min_size=1, max_size=12
    ),
    rights=st.lists(
        st.tuples(st.integers(1, 3), st.integers(0, 20)), min_size=0, max_size=12
    ),
)
def test_asof_join_equals_naive(spark, lefts, rights):
    """asof_join == the per-row naive 'latest right at-or-before'
    reference implementation, for arbitrary key/ts layouts (equal
    timestamps, duplicate right rows, empty right side)."""
    import datetime as dt

    from netflow_analysis_with_spark_streaming_spark.operators import asof

    base = dt.datetime(2024, 1, 1)
    ts = lambda m: base + dt.timedelta(minutes=m)  # noqa: E731
    left = spark.createDataFrame(
        [(k, ts(m), i) for i, (k, m) in enumerate(lefts)],
        "k long, ts timestamp, lid long",
    )
    right = spark.createDataFrame(
        [(k, ts(m), 1000 + i) for i, (k, m) in enumerate(rights)],
        "k long, cts timestamp, rid long",
    )
    got = {
        r["lid"]: r["rid"]
        for r in asof.asof_join(
            left, right, on=["k"], left_ts="ts", right_ts="cts",
            right_cols=["rid"], right_id="rid",
        ).collect()
    }
    for i, (k, m) in enumerate(lefts):
        cands = [
            (rm, 1000 + j)
            for j, (rk, rm) in enumerate(rights)
            if rk == k and rm <= m
        ]
        expect = max(cands)[1] if cands else None
        assert got[i] == expect, (i, k, m, got[i], expect)


@settings(max_examples=15, deadline=None)
@given(
    lefts=st.lists(
        st.tuples(st.integers(1, 3), st.integers(0, 20)), min_size=1, max_size=10
    ),
    rights=st.lists(
        st.tuples(st.integers(1, 3), st.integers(0, 20), st.booleans()),
        min_size=0,
        max_size=10,
    ),
)
def test_asof_join_row_atomic_under_nulls(spark, lefts, rights):
    """With a nullable right payload, the payload must always come from
    the SAME right row as the id — including when it is NULL (the
    per-column carry-forward bug stitched it from an older row)."""
    import datetime as dt

    from netflow_analysis_with_spark_streaming_spark.operators import asof

    base = dt.datetime(2024, 1, 1)
    ts = lambda m: base + dt.timedelta(minutes=m)  # noqa: E731
    left = spark.createDataFrame(
        [(k, ts(m), i) for i, (k, m) in enumerate(lefts)],
        "k long, ts timestamp, lid long",
    )
    right = spark.createDataFrame(
        [
            (k, ts(m), 1000 + i, None if nul else f"p{i}")
            for i, (k, m, nul) in enumerate(rights)
        ],
        "k long, cts timestamp, rid long, payload string",
    )
    got = {
        r["lid"]: (r["rid"], r["payload"])
        for r in asof.asof_join(
            left, right, on=["k"], left_ts="ts", right_ts="cts",
            right_cols=["rid", "payload"], right_id="rid",
        ).collect()
    }
    payload_of = {
        1000 + i: (None if nul else f"p{i}") for i, (_, _, nul) in enumerate(rights)
    }
    for i, (k, m) in enumerate(lefts):
        cands = [
            (rm, 1000 + j)
            for j, (rk, rm, _) in enumerate(rights)
            if rk == k and rm <= m
        ]
        if cands:
            rid = max(cands)[1]
            assert got[i] == (rid, payload_of[rid]), (i, got[i], rid)
        else:
            assert got[i] == (None, None), (i, got[i])


@settings(max_examples=15, deadline=None)
@given(
    points=st.lists(st.integers(0, 30), min_size=1, max_size=10),
    ivs=st.lists(
        st.tuples(st.integers(0, 30), st.integers(1, 10)), min_size=1, max_size=6
    ),
)
def test_interval_join_equals_naive(spark, points, ivs):
    """Bucketized interval_join == brute-force range filter for
    arbitrary point/interval layouts (multi-bucket spans, zero-match
    points, overlapping intervals), at a bucket much smaller than the
    intervals."""
    import datetime as dt

    from netflow_analysis_with_spark_streaming_spark.operators.range_join import (
        interval_join,
    )

    base = dt.datetime(2024, 1, 1)
    ts = lambda h: base + dt.timedelta(hours=h)  # noqa: E731
    pdf = spark.createDataFrame(
        [(i, ts(h)) for i, h in enumerate(points)], "pid long, ts timestamp"
    )
    idf = spark.createDataFrame(
        [(j, ts(s), ts(s + w)) for j, (s, w) in enumerate(ivs)],
        "iid long, w_start timestamp, w_end timestamp",
    )
    got = sorted(
        (r["pid"], r["iid"])
        for r in interval_join(
            pdf, idf, "ts", "w_start", "w_end", bucket_seconds=3 * 3600
        ).collect()
    )
    expect = sorted(
        (i, j)
        for i, h in enumerate(points)
        for j, (s, w) in enumerate(ivs)
        if s <= h < s + w
    )
    assert got == expect, (got, expect)
