"""Relational corpus: oracle differentials + plan-shape discipline.

Plan assertions follow the pattern set in test_flagship.py: every
broadcast-able join must actually broadcast, filters must reach the
parquet scan, top-k must not materialize a global sort.
"""

import pyspark.sql.functions as F

from conftest import CORPUS, SF_ORACLE


def _entry():
    # full corpus (driver + extra tiers); differential coverage for
    # every entry lives in test_oracle_corpus.py
    return CORPUS


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_broadcast_enrich_plan(spark):
    """Dim joins must be BroadcastHashJoin — fact side never shuffles."""
    df = _entry().queries()["join_broadcast_enrich"](spark, SF_ORACLE)
    plan = _plan(df)
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_star_join_plan(spark):
    df = _entry().queries()["join_star"](spark, SF_ORACLE)
    plan = _plan(df)
    assert plan.count("BroadcastHashJoin") >= 3, plan


def test_semi_join_pushdown(spark):
    """Status filter must be pushed into the orders parquet scan."""
    df = _entry().queries()["join_semi"](spark, SF_ORACLE)
    plan = _plan(df)
    assert "LeftSemi" in plan, plan
    assert "EqualTo(o_orderstatus,F)" in plan, plan


def test_topk_no_global_sort(spark):
    """limit+orderBy must plan as TakeOrderedAndProject (bounded heap
    per partition), not a full Sort + CollectLimit."""
    df = _entry().queries()["topk_heavy_hitters"](spark, SF_ORACLE)
    plan = _plan(df)
    assert "TakeOrderedAndProject" in plan, plan


def test_pricing_summary_partial_agg(spark):
    """Full agg set must compute as partial+final HashAggregate and
    push the shipdate range into the scan."""
    df = _entry().queries()["agg_pricing_summary"](spark, SF_ORACLE)
    plan = _plan(df)
    assert plan.count("HashAggregate") >= 2, plan
    assert "LessThanOrEqual(l_shipdate" in plan, plan


def test_similarity_joins_never_cartesian(spark):
    """The never-all-pairs discipline, pinned: candidate generation
    plans must contain no CartesianProduct; the one intentional cross
    join (tiny query set) must be the broadcast nested-loop variant."""
    mod = _entry()
    for name in ["similarity_ngram_jaccard", "dedup_minhash_candidates"]:
        plan = _plan(mod.queries()[name](spark, SF_ORACLE))
        assert "CartesianProduct" not in plan, (name, plan)
    topk_plan = _plan(mod.queries()["similarity_cosine_topk"](spark, SF_ORACLE))
    assert "CartesianProduct" not in topk_plan, topk_plan
    assert "BroadcastNestedLoopJoin" in topk_plan, topk_plan


def test_approx_distinct_within_rsd(spark):
    """HLL estimate must land within ~3x the configured 2% rsd of the
    exact count (loose bound, deterministic sketch)."""
    mod = _entry()
    approx = {
        r["event_type"]: r["approx_users"]
        for r in mod.queries()["agg_approx_distinct"](spark, SF_ORACLE).collect()
    }
    exact = {
        r["event_type"]: r["distinct_users"]
        for r in mod.queries()["agg_count_distinct"](spark, SF_ORACLE).collect()
    }
    assert approx.keys() == exact.keys()
    for k in exact:
        rel_err = abs(approx[k] - exact[k]) / max(exact[k], 1)
        assert rel_err < 0.06, (k, approx[k], exact[k])


def test_session_window_gap_boundary(spark):
    """Boundary semantics pinned empirically: an event EXACTLY gap
    seconds after the previous one MERGES into the session (touching
    intervals merge), so the islands-style oracle's strict `>` on the
    gap is the correct mirror; one second past the gap splits."""
    import datetime as dt

    base = dt.datetime(2024, 1, 1, 10, 0, 0)
    rows = [
        (1, base),
        (1, base + dt.timedelta(hours=1)),  # == gap: merges (touching)
        (1, base + dt.timedelta(hours=2, seconds=1)),  # > gap: splits
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    out = (
        df.groupBy("user_id", F.session_window("ts", "1 hour").alias("w"))
        .agg(F.count("*").alias("n"))
        .orderBy("w.start")
        .collect()
    )
    assert [r["n"] for r in out] == [2, 1], out


def test_zscore_degenerate_group_is_null(spark, tmp_path):
    """Single-doc and zero-variance language groups must produce NULL
    tok_z (like STDDEV_SAMP), never NaN/inf — driven through the
    REGISTERED entry against a planted documents table."""
    docs = spark.createDataFrame(
        [
            (1, "solo", "only one doc in this lang"),
            (2, "flat", "same same"),
            (3, "flat", "word word"),  # equal token counts -> sd == 0
        ],
        ["doc_id", "lang", "text"],
    )
    sf_dir = str(tmp_path / "sf_planted")
    docs.write.parquet(f"{sf_dir}/documents.parquet")
    res = _entry().queries()["text_zscore_by_lang"](spark, sf_dir).collect()
    assert len(res) == 3
    assert all(r["tok_z"] is None for r in res), res


def test_asof_join_semantics(spark):
    """Planted rows pin the as-of contract: inclusive at equal ts,
    NULL when nothing precedes, equal-ts right ties -> max right_id."""
    import datetime as dt

    from netflow_analysis_with_spark_streaming_spark.operators import asof

    t = lambda m: dt.datetime(2024, 1, 1, 10, m, 0)  # noqa: E731
    left = spark.createDataFrame(
        [(1, t(0), "b0"), (1, t(5), "b5"), (2, t(3), "b3")],
        "user_id long, ts timestamp, name string",
    )
    right = spark.createDataFrame(
        [
            (1, t(5), 100),  # equal ts -> matches b5 (inclusive)
            (1, t(2), 50),
            (2, t(3), 70),
            (2, t(3), 71),  # same key+ts: max right_id wins
        ],
        "user_id long, cts timestamp, rid long",
    )
    out = {
        r["name"]: r["rid"]
        for r in asof.asof_join(
            left, right, on=["user_id"], left_ts="ts", right_ts="cts",
            right_cols=["rid"], right_id="rid",
        ).collect()
    }
    assert out == {"b0": None, "b5": 100, "b3": 71}, out


def test_asof_join_null_right_column_is_row_atomic(spark):
    """When the nearest right row holds NULL in one column, the output
    must carry THAT row's NULL — not stitch the column from an older
    right row (per-column carry-forward would)."""
    import datetime as dt

    from netflow_analysis_with_spark_streaming_spark.operators import asof

    t = lambda m: dt.datetime(2024, 1, 1, 10, m, 0)  # noqa: E731
    left = spark.createDataFrame(
        [(1, t(9), "probe")], "user_id long, ts timestamp, name string"
    )
    right = spark.createDataFrame(
        [
            (1, t(1), 10, "old-city", 1),
            (1, t(8), 20, None, 2),  # nearest: city is genuinely NULL
        ],
        "user_id long, cts timestamp, score long, city string, rid long",
    )
    row = asof.asof_join(
        left, right, on=["user_id"], left_ts="ts", right_ts="cts",
        right_cols=["score", "city"], right_id="rid",
    ).collect()[0]
    assert row["score"] == 20 and row["city"] is None, row


def test_interval_join_boundaries_and_plan(spark):
    """Half-open [start, end): start row joins, end row doesn't; an
    interval spanning several buckets matches each point once; and the
    plan is an equi-join on the bucket, never cartesian/BNLJ."""
    import datetime as dt

    from netflow_analysis_with_spark_streaming_spark.operators.range_join import (
        interval_join,
    )

    d = lambda day, h=0: dt.datetime(2024, 1, day, h, 0, 0)  # noqa: E731
    points = spark.createDataFrame(
        [(1, d(1)), (2, d(2, 12)), (3, d(4)), (4, d(3, 23))],
        "pid long, ts timestamp",
    )
    intervals = spark.createDataFrame(
        [(d(1), d(4)), (d(2), d(3))],  # 3-day and 1-day windows
        "w_start timestamp, w_end timestamp",
    )
    out = interval_join(points, intervals, "ts", "w_start", "w_end")
    got = sorted((r["pid"], r["w_start"].day) for r in out.collect())
    # pid1: start-inclusive in w1 only; pid2: inside both; pid3: end-
    # exclusive everywhere; pid4: last hour of w1 only
    assert got == [(1, 1), (2, 1), (2, 2), (4, 1)], got
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_interval_join_degenerate_intervals_match_nothing(spark):
    """Empty (end == start) and inverted (end < start) intervals must
    match no points — the bucket explode could walk a DESCENDING
    sequence for inverted input, but the exact refine predicate keeps
    the result correct; pinned here so that stays true."""
    import datetime as dt

    from netflow_analysis_with_spark_streaming_spark.operators.range_join import (
        interval_join,
    )

    t = lambda s: dt.datetime(2024, 1, 1) + dt.timedelta(seconds=s)  # noqa: E731
    pts = spark.createDataFrame(
        [(t(x), x) for x in (0, 50, 100)], "ts timestamp, pid long"
    )
    ivs = spark.createDataFrame(
        [
            (t(50), t(50), 0),   # empty
            (t(100), t(0), 1),   # inverted
            (t(40), t(60), 2),   # sane control
        ],
        "s timestamp, e timestamp, vid long",
    )
    got = {
        (r["pid"], r["vid"])
        for r in interval_join(pts, ivs, "ts", "s", "e", bucket_seconds=7).collect()
    }
    assert got == {(50, 2)}, got


def test_gap_fill_locf_semantics(spark):
    """The grid must be dense (users x full day span), real gaps must
    exist (else LOCF is untested), and carried must equal the last
    non-null observed looking backward (0.0 before first)."""
    from conftest import SF_ORACLE
    from netflow_analysis_with_spark_streaming_spark import queries as Q

    rows = Q.all_queries()["timeseries_gap_fill_locf"](spark, SF_ORACLE).collect()
    by_user = {}
    for r in rows:
        by_user.setdefault(r["user_id"], []).append(r)
    n_days = {len(v) for v in by_user.values()}
    assert len(n_days) == 1  # dense: every user has the full spine
    assert any(r["observed"] is None for r in rows), "no gaps — fixture too dense"
    for series in by_user.values():
        series.sort(key=lambda r: r["day"])
        last = 0.0
        for r in series:
            if r["observed"] is not None:
                last = r["observed"]
            assert r["carried"] == last, r


def test_funnel_stage_monotone(spark):
    """Funnel stages must be ordered-by-time, not independent counts:
    every stage-3 user has view < click < purchase events in strict
    time order, and the stage histogram is non-degenerate."""
    from conftest import SF_ORACLE
    from netflow_analysis_with_spark_streaming_spark import queries as Q, tables

    out = Q.all_queries()["funnel_conversion"](spark, SF_ORACLE).collect()
    stages = [r["stage"] for r in out]
    assert set(stages) <= {0, 1, 2, 3} and max(stages) == 3
    ev = tables.load(spark, "events", SF_ORACLE).collect()
    by_user = {}
    for e in ev:
        by_user.setdefault(e["user_id"], []).append(e)
    import itertools

    checked = 0
    for r in itertools.islice((r for r in out if r["stage"] == 3), 10):
        es = sorted(by_user[r["user_id"]], key=lambda e: e["ts"])
        t_v = min(e["ts"] for e in es if e["event_type"] == "view")
        t_c = min(e["ts"] for e in es if e["event_type"] == "click" and e["ts"] > t_v)
        assert any(e["event_type"] == "purchase" and e["ts"] > t_c for e in es)
        checked += 1
    assert checked > 0


def test_cohort_retention_invariants(spark):
    """Offset-0 retention is exactly 1 (every user is active in their
    first week by construction), offsets are non-negative, retention
    never exceeds 1, and cohort sizes sum to the user count."""
    from conftest import SF_ORACLE
    from netflow_analysis_with_spark_streaming_spark import queries as Q, tables

    out = Q.all_queries()["cohort_retention"](spark, SF_ORACLE).collect()
    assert out
    for r in out:
        assert r["week_k"] >= 0 and 0 < r["retention"] <= 1.0, r
        if r["week_k"] == 0:
            assert r["n_active"] == r["cohort_size"], r
    sizes = {r["cohort_week"]: r["cohort_size"] for r in out}
    n_users = tables.load(spark, "events", SF_ORACLE).select("user_id").distinct().count()
    assert sum(sizes.values()) == n_users


def test_path_analysis_session_semantics(spark):
    """Paths must respect the 30-minute gap and the 5-event prefix:
    recount sessions for a few users directly in Python and check the
    resulting path multiset is consistent with the top-k output."""
    from collections import Counter

    from conftest import SF_ORACLE
    from netflow_analysis_with_spark_streaming_spark import queries as Q, tables

    out = Q.all_queries()["path_analysis_top_sequences"](spark, SF_ORACLE).collect()
    assert len(out) == 15
    counts = [r["n_sessions"] for r in out]
    assert counts == sorted(counts, reverse=True)
    assert all(1 <= len(r["path"].split(">")) <= 5 for r in out)
    # full Python recount: the top-k must be exactly the k most common
    ev = tables.load(spark, "events", SF_ORACLE).select(
        "user_id", "event_id", "event_type", "ts"
    ).collect()
    by_user = {}
    for e in ev:
        by_user.setdefault(e["user_id"], []).append(e)
    ref = Counter()
    for es in by_user.values():
        es.sort(key=lambda e: (e["ts"], e["event_id"]))
        sessions, cur, last_us = [], [], None
        for e in es:
            us = int(e["ts"].timestamp() * 1_000_000)
            if last_us is not None and us - last_us > 1800 * 1_000_000:
                sessions.append(cur)
                cur = []
            cur.append(e["event_type"])
            last_us = us
        sessions.append(cur)
        for s in sessions:
            ref[">".join(s[:5])] += 1
    expected = sorted(ref.items(), key=lambda kv: (-kv[1], kv[0]))[:15]
    assert [(r["path"], r["n_sessions"]) for r in out] == expected


def test_ab_chi_square_null_holds(spark):
    """The arms are a hash split unrelated to behaviour, so the
    chi-square statistic must be far below the 0.001-level critical
    value (10.83 at 1 dof) — and the cells must cover every user with
    both outcomes present."""
    from conftest import SF_ORACLE
    from netflow_analysis_with_spark_streaming_spark import queries as Q, tables

    r = Q.all_queries()["ab_test_chi_square"](spark, SF_ORACLE).collect()[0]
    n_users = tables.load(spark, "events", SF_ORACLE).select("user_id").distinct().count()
    assert r["conv_a"] + r["noconv_a"] + r["conv_b"] + r["noconv_b"] == n_users
    assert r["conv_a"] + r["conv_b"] > 0 and r["noconv_a"] + r["noconv_b"] > 0
    assert 0 <= r["chi2"] < 10.83, r


def test_sketch_rollup_merge_accuracy(spark):
    """The mergeable-sketch contract: weekly/monthly estimates from
    daily-sketch UNIONS must sit within 2% of the exact distinct
    counts recomputed from raw events, and a degenerate one-day merge
    must equal that day's own estimate."""
    import pyspark.sql.functions as F

    from conftest import SF_ORACLE
    from netflow_analysis_with_spark_streaming_spark import queries as Q, tables

    out = Q.all_queries()["agg_sketch_rollup"](spark, SF_ORACLE).collect()
    assert out
    events = tables.load(spark, "events", SF_ORACLE)
    months = {
        r["m"]: r["n"]
        for r in events.groupBy(F.date_format("ts", "yyyy-MM").alias("m"))
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    weeks = {
        r["w"]: r["n"]
        for r in events.groupBy(
            F.date_format(F.date_trunc("week", "ts"), "yyyy-MM-dd").alias("w")
        )
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    for r in out:
        key = r["month"]
        exact = weeks[key[3:]] if key.startswith("wk:") else months[key]
        assert abs(r["approx_users"] - exact) <= max(1, 0.02 * exact), (r, exact)
    # determinism: second run produces identical estimates
    out2 = Q.all_queries()["agg_sketch_rollup"](spark, SF_ORACLE).collect()
    assert {(r["month"], r["approx_users"]) for r in out2} == {
        (r["month"], r["approx_users"]) for r in out
    }


def test_scd2_multi_generation_history(spark):
    """Two update batches build a 3-generation history: each change
    closes exactly the prior current row, no-op updates version
    nothing, NULL->value counts as a change (null-safe compare), and
    exactly one current row exists per live key."""
    import pyspark.sql.functions as F

    from netflow_analysis_with_spark_streaming_spark.operators.scd2 import scd2_apply

    dim = spark.createDataFrame(
        [(1, None, "2024-01-01", None, True), (2, "x", "2024-01-01", None, True)],
        "k long, attr string, valid_from string, valid_to string, is_current boolean",
    )
    # batch 1: key 1 NULL->'a' (change), key 2 'x' (no-op), key 3 new
    up1 = spark.createDataFrame([(1, "a"), (2, "x"), (3, "n")], "k long, attr string")
    d1 = scd2_apply(dim, up1, "k", ["attr"], F.lit("2024-02-01"))
    # batch 2: key 1 'a'->'b' (second generation)
    up2 = spark.createDataFrame([(1, "b")], "k long, attr string")
    d2 = scd2_apply(d1, up2, "k", ["attr"], F.lit("2024-03-01"))
    rows = sorted(
        ((r["k"], r["attr"], r["valid_from"], r["valid_to"], r["is_current"])
         for r in d2.collect()),
        key=lambda t: (t[0], t[2]),
    )
    assert rows == [
        (1, None, "2024-01-01", "2024-02-01", False),
        (1, "a", "2024-02-01", "2024-03-01", False),
        (1, "b", "2024-03-01", None, True),
        (2, "x", "2024-01-01", None, True),   # no-op never versioned
        (3, "n", "2024-02-01", None, True),
    ], rows
    cur = [r for r in rows if r[4]]
    assert len(cur) == 3 and len({r[0] for r in cur}) == 3


def test_scd2_rejects_duplicate_update_keys(spark):
    """Two update rows for one key would both open as current —
    scd2_apply must refuse the batch instead (opt-out available)."""
    import pytest

    import pyspark.sql.functions as F

    from netflow_analysis_with_spark_streaming_spark.operators.scd2 import scd2_apply

    dim = spark.createDataFrame(
        [(1, "a", "2024-01-01", None, True)],
        "k long, attr string, valid_from string, valid_to string, is_current boolean",
    )
    dups = spark.createDataFrame([(1, "b"), (1, "c")], "k long, attr string")
    with pytest.raises(ValueError, match="duplicate key"):
        scd2_apply(dim, dups, "k", ["attr"], F.lit("2024-02-01"))
    out = scd2_apply(
        dim, dups, "k", ["attr"], F.lit("2024-02-01"), validate_unique=False
    )
    assert out.count() == 3  # documented opt-out keeps old behaviour


def test_scd2_randomized_differential(spark):
    """Random multi-batch SCD2 histories diffed against a Python model
    of the semantics: per key, rows form a contiguous validity chain,
    exactly one current row, closed rows stamped with the batch that
    superseded them, no-op updates never version."""
    import random

    import pyspark.sql.functions as F

    from netflow_analysis_with_spark_streaming_spark.operators.scd2 import scd2_apply

    for seed in (3, 31):
        rng = random.Random(seed)
        dim = spark.createDataFrame(
            [], "k long, attr string, valid_from string, valid_to string, is_current boolean"
        )
        # model[k] = list of [attr, valid_from, valid_to, is_current]
        model: dict[int, list] = {}
        for step in range(5):
            eff = f"2024-0{step + 2}-01"
            batch, seen = [], set()
            for _ in range(rng.randint(1, 4)):
                k = rng.randint(1, 6)
                if k in seen:
                    continue
                seen.add(k)
                attr = rng.choice(["x", "y", None])
                batch.append((k, attr))
            dim = scd2_apply(
                dim,
                spark.createDataFrame(batch, "k long, attr string"),
                "k",
                ["attr"],
                F.lit(eff),
            ).localCheckpoint(eager=True)  # keep the lineage flat
            for k, attr in batch:
                hist = model.setdefault(k, [])
                cur = next((r for r in hist if r[3]), None)
                if cur is None:
                    hist.append([attr, eff, None, True])
                elif cur[0] != attr:
                    cur[2], cur[3] = eff, False
                    hist.append([attr, eff, None, True])
            skey = lambda t: (t[0], t[2], t[1] or "", t[3] or "")  # noqa: E731
            got = sorted(
                ((r["k"], r["attr"], r["valid_from"], r["valid_to"], r["is_current"])
                 for r in dim.collect()),
                key=skey,
            )
            want = sorted(
                ((k, a, vf, vt, cur)
                 for k, hist in model.items()
                 for a, vf, vt, cur in hist),
                key=skey,
            )
            assert got == want, (seed, step, got, want)


def test_quantile_sketch_merge_invariants(spark):
    """The histogram-sketch contract behind agg_quantile_sketch_rollup:
    (a) merging per-day bin counts over a range equals binning the
    range's raw rows directly (merge == rebuild, the associativity a
    100 TB rollup relies on); (b) each reported edge is the true exact
    percentile's bin floor — the estimate never leaves the bin the
    exact answer lives in."""
    import math

    import pyspark.sql.functions as F

    from conftest import SF_ORACLE
    from netflow_analysis_with_spark_streaming_spark import queries as Q, tables

    out = Q.all_queries()["agg_quantile_sketch_rollup"](spark, SF_ORACLE).collect()
    assert out and len(out) == 15  # 5 types x 3 quantiles
    events = (
        tables.load(spark, "events", SF_ORACLE)
        .filter(F.col("value").isNotNull())
        .filter(
            F.date_format("ts", "yyyy-MM-dd").between("2024-01-08", "2024-01-21")
        )
    )
    # (a) merge-of-days == direct binning of the range
    direct = {
        (r["event_type"], r["bin"]): r["c"]
        for r in events.groupBy(
            "event_type", F.floor(F.col("value") / 4.0).cast("long").alias("bin")
        )
        .agg(F.count("*").alias("c"))
        .collect()
    }
    vals = {
        t: sorted(
            r["value"]
            for r in events.filter(F.col("event_type") == t)
            .select("value")
            .collect()
        )
        for t in {r["event_type"] for r in out}
    }
    for r in out:
        q = {"p50": 0.5, "p90": 0.9, "p99": 0.99}[r["q"]]
        xs = vals[r["event_type"]]
        assert r["n"] == len(xs) == sum(
            c for (t, _), c in direct.items() if t == r["event_type"]
        )
        # (b) exact rank-ceil(q*n) value falls inside the reported bin
        exact = xs[math.ceil(q * len(xs)) - 1]
        assert r["edge"] == 4 * math.floor(exact / 4.0), (r, exact)


def test_anomaly_zscore_cold_start_never_alerts(spark):
    """The first 12 hours of every event type's series must carry NULL
    z (insufficient baseline) and must not be flagged — an alerting
    query that fires during warm-up is operationally useless."""
    from conftest import SF_ORACLE
    from netflow_analysis_with_spark_streaming_spark import queries as Q

    rows = Q.all_queries()["anomaly_rolling_zscore"](spark, SF_ORACLE).collect()
    assert rows
    seen: dict[str, int] = {}
    for r in rows:  # already ordered by (event_type, hour)
        i = seen.get(r["event_type"], 0)
        if i < 12:
            assert r["z"] is None and not r["is_anomaly"], r
        seen[r["event_type"]] = i + 1
    # and the detector must actually have enough warm rows to matter
    assert any(r["z"] is not None for r in rows)


def test_pagerank_randomized_differential(spark):
    """Integer PageRank must equal a pure-Python reference on random
    graphs — the engine's shuffles and join order cannot change a
    single rank unit (the whole point of the fixed-point design)."""
    import random

    from netflow_analysis_with_spark_streaming_spark.operators.pagerank import (
        BASE, DAMP_DEN, DAMP_NUM, SCALE, pagerank,
    )

    for seed in (7, 19):
        rng = random.Random(seed)
        nodes = list(range(1, 30))
        und = {
            tuple(sorted(rng.sample(nodes, 2))) for _ in range(60)
        }
        edges = [(a, b) for a, b in und] + [(b, a) for a, b in und]
        touched = sorted({x for e in edges for x in e})
        df = pagerank(
            spark.createDataFrame(edges, "src long, dst long"), iterations=6
        )
        got = {r["id"]: r["rank"] for r in df.collect()}

        out: dict[int, list[int]] = {}
        for a, b in edges:
            out.setdefault(a, []).append(b)
        rank = {v: SCALE for v in touched}
        for _ in range(6):
            nxt = {v: BASE for v in touched}
            for u, outs in out.items():
                c = (rank[u] * DAMP_NUM) // (DAMP_DEN * len(outs))
                for v in outs:
                    nxt[v] += c
            rank = nxt
        assert got == rank, (seed, got, rank)


def test_cms_overcount_bound_and_merge(spark):
    """Count-min guarantees: estimate >= exact for EVERY user (not
    just the top-10), and merging per-day sketches equals sketching
    the whole range at once (the associativity the rollup sells)."""
    import pyspark.sql.functions as F

    from conftest import CORPUS, SF_ORACLE
    from netflow_analysis_with_spark_streaming_spark import tables
    from netflow_analysis_with_spark_streaming_spark.functions.text import md5_hash32

    top = CORPUS.queries()["agg_cms_heavy_hitters"](spark, SF_ORACLE).collect()
    assert len(top) == 10
    assert all(r["est"] >= r["exact"] for r in top), top

    D, W = 3, 256
    ev = (
        tables.load(spark, "events", SF_ORACLE)
        .filter(F.col("user_id").isNotNull())
        .filter(F.date_format("ts", "yyyy-MM-dd").between("2024-01-08", "2024-01-21"))
        .select("user_id", F.date_format("ts", "yyyy-MM-dd").alias("day"))
    )
    cells = ev.select(
        "day",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("i"),
                        (md5_hash32(F.col("user_id").cast("string"), seed=i) % W).alias("b"),
                    )
                    for i in range(D)
                ]
            )
        ).alias("c"),
    )
    per_day_merged = {
        (r["i"], r["b"]): r["n"]
        for r in cells.groupBy("day", "c.i", "c.b")
        .count()
        .groupBy(F.col("i"), F.col("b"))
        .agg(F.sum("count").alias("n"))
        .collect()
    }
    whole_range = {
        (r["i"], r["b"]): r["n"]
        for r in cells.groupBy(F.col("c.i").alias("i"), F.col("c.b").alias("b"))
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert per_day_merged == whole_range


def test_aqp_estimate_within_sampling_error(spark):
    """The 10% hash-sample estimator must land within a plausible
    sampling-error band of the exact answer for every group (~1500
    sampled lines per priority at sf0.01 -> a few percent), and every
    group must actually receive sampled rows (no NULL estimates)."""
    from conftest import CORPUS, SF_ORACLE

    rows = CORPUS.queries()["agg_approx_sample_estimate"](spark, SF_ORACLE).collect()
    assert len(rows) == 5
    for r in rows:
        assert r["est_revenue"] is not None, r
        assert r["rel_err_e4"] < 2000, r  # within 20%, generous band


def test_new_entry_plan_shapes(spark):
    """Plan-shape regression guards for the round-6 analytics entries:
    the salted join must broadcast its replicated side (never
    sort-merge), the anomaly window must partition by event type (a
    global window over the hourly series would single-task at scale),
    and the OHLC window must partition by (type, bucket)."""
    plan = _plan(_entry().queries()["join_salted_skew"](spark, SF_ORACLE))
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan

    plan = _plan(_entry().queries()["anomaly_rolling_zscore"](spark, SF_ORACLE))
    assert "windowspecdefinition(event_type" in plan, plan

    plan = _plan(_entry().queries()["timeseries_ohlc_resample"](spark, SF_ORACLE))
    assert "windowspecdefinition(event_type" in plan and "bucket" in plan, plan


def test_quantile_sketch_random_ranges_vs_python(spark):
    """Random day ranges through the histogram-sketch machinery vs a
    pure-Python recompute: for ANY range, the merged bin counts and
    the rank-selected bin edges must match the model exactly (the
    entry pins one range; this pins the general mechanism)."""
    import math
    import random

    import pyspark.sql.functions as F

    from conftest import SF_ORACLE
    from netflow_analysis_with_spark_streaming_spark import tables

    ev = (
        tables.load(spark, "events", SF_ORACLE)
        .filter(F.col("value").isNotNull())
        .select(
            "event_type",
            F.date_format("ts", "yyyy-MM-dd").alias("day"),
            "value",
        )
        .collect()
    )
    sketch_df = (
        tables.load(spark, "events", SF_ORACLE)
        .filter(F.col("value").isNotNull())
        .groupBy(
            "event_type",
            F.date_format("ts", "yyyy-MM-dd").alias("day"),
            F.floor(F.col("value") / 4.0).cast("long").alias("bin"),
        )
        .agg(F.count("*").alias("c"))
        .collect()
    )
    rng = random.Random(13)
    days = sorted({r["day"] for r in ev})
    for _ in range(4):
        lo, hi = sorted(rng.sample(range(len(days)), 2))
        d0, d1 = days[lo], days[hi]
        # model: per-type sorted values in range
        vals: dict = {}
        for r in ev:
            if d0 <= r["day"] <= d1:
                vals.setdefault(r["event_type"], []).append(r["value"])
        # merged sketch from the per-day rows
        merged: dict = {}
        for r in sketch_df:
            if d0 <= r["day"] <= d1:
                merged[(r["event_type"], r["bin"])] = (
                    merged.get((r["event_type"], r["bin"]), 0) + r["c"]
                )
        for t, xs in vals.items():
            xs.sort()
            n = len(xs)
            assert n == sum(c for (tt, _), c in merged.items() if tt == t)
            for q in (0.5, 0.9, 0.99):
                # sketch pick: first bin whose cumsum >= ceil(q*n)
                target = math.ceil(q * n)
                cum = 0
                for b in sorted(b for (tt, b) in merged if tt == t):
                    cum += merged[(t, b)]
                    if cum >= target:
                        pick = b
                        break
                exact = xs[target - 1]
                assert pick == math.floor(exact / 4.0), (t, q, d0, d1)
