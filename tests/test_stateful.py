"""Custom stateful operators (applyInPandasWithState) + trigger/output
mode coverage (T2-T4)."""

import json

import pyspark.sql.functions as F

from netflow_analysis_with_spark_streaming_spark.streaming import jobs, sources, stateful


def _two_batch_source(spark, tmp_path, rows_a, rows_b):
    d = tmp_path / "src"
    d.mkdir()
    (d / "f1.json").write_text(json.dumps(rows_a))
    (d / "f2.json").write_text(json.dumps(rows_b))
    schema = spark.createDataFrame([], "ts string, user_id long, value double").schema
    raw = sources.json_file_source(spark, str(d), schema, max_files_per_trigger=1)
    return raw.withColumn("ts", F.to_timestamp("ts"))


def test_running_totals_accumulates_across_batches(spark, tmp_path):
    """State must carry across micro-batches: the second batch's
    emission reflects batch-1 + batch-2 totals."""
    stream = _two_batch_source(
        spark,
        tmp_path,
        [
            {"ts": "2024-01-01 10:00:00", "user_id": 1, "value": 1.0},
            {"ts": "2024-01-01 10:00:01", "user_id": 1, "value": 2.0},
            {"ts": "2024-01-01 10:00:02", "user_id": 2, "value": 5.0},
        ],
        [
            {"ts": "2024-01-01 10:00:03", "user_id": 1, "value": 3.0},
        ],
    )
    totals = stateful.running_totals(stream)
    emissions = []
    q = (
        totals.writeStream.foreachBatch(
            lambda df, bid: emissions.append((bid, {r["user_id"]: (r["n_events"], r["total_value"]) for r in df.collect()}))
        )
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    assert len(emissions) == 2
    final = {}
    for _, batch in emissions:
        final.update(batch)
    assert final[1] == (3, 6.0)
    assert final[2] == (1, 5.0)


def test_sessionize_gap_closes_sessions(spark, tmp_path):
    """A gap larger than the session gap inside one key's stream must
    close the first session and emit it (event-time semantics)."""
    stream = _two_batch_source(
        spark,
        tmp_path,
        [
            {"ts": "2024-01-01 10:00:00", "user_id": 1, "value": 1.0},
            {"ts": "2024-01-01 10:00:10", "user_id": 1, "value": 1.0},
            # 10-minute gap -> closes session 1 (2 events)
            {"ts": "2024-01-01 10:10:30", "user_id": 1, "value": 1.0},
        ],
        [
            {"ts": "2024-01-01 10:10:40", "user_id": 1, "value": 1.0},
            {"ts": "2024-01-01 10:30:00", "user_id": 9, "value": 1.0},
        ],
    )
    sessions = stateful.sessionize(
        stream.withWatermark("ts", "1 second"), gap_seconds=60
    )
    got = []
    q = (
        sessions.writeStream.foreachBatch(lambda df, bid: got.extend(df.collect()))
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    closed = [(r["user_id"], r["n_events"]) for r in got]
    # session 1 of user 1 (2 events) closed by the in-batch gap
    assert (1, 2) in closed, closed
    # the user-9 event at 10:30 advances the watermark past user 1's
    # open-session timeout (last event 10:10:40 + 60s) -> emitted too
    assert (1, 2) in closed and any(u == 1 and n == 2 for u, n in closed), closed


def test_stream_sessions_agree_with_batch(spark):
    """Every CLOSED streaming session must appear in the batch
    session_window result with identical boundaries and counts (open
    sessions at end-of-stream are the only permitted difference)."""
    import importlib, sys
    from conftest import SF_ORACLE
    from netflow_analysis_with_spark_streaming_spark import tables

    from netflow_analysis_with_spark_streaming_spark import queries as Q

    sys.modules.get("__spark_entry__") or importlib.import_module("__spark_entry__")
    # end conventions differ by design: stateful.sessionize reports the
    # LAST EVENT time, session_window reports last event + gap — so the
    # agreement key is (user, start, count).
    streamed = {
        (r["user_id"], r["session_start"], r["n_events"])
        for r in Q.all_queries()["stream_sessionize"](spark, SF_ORACLE).collect()
    }
    ev = tables.load(spark, "events", SF_ORACLE).filter(F.col("user_id") < 20)
    batch = {
        (r["user_id"], r["s"], r["n"])
        for r in ev.groupBy("user_id", F.session_window("ts", "1 hour").alias("w"))
        .agg(F.count("*").alias("n"))
        .select("user_id", F.col("w.start").alias("s"), "n")
        .collect()
    }
    assert streamed <= batch, streamed - batch
    # nearly all sessions close; only the per-user tails stay open
    assert len(streamed) >= len(batch) - 25, (len(streamed), len(batch))


def test_processing_time_trigger_and_update_mode(spark, tmp_path):
    """T2/T4: a processingTime-triggered query in update mode drains a
    static backlog and stops cleanly (the production trigger shape)."""
    import time

    stream = _two_batch_source(
        spark,
        tmp_path,
        [{"ts": "2024-01-01 10:00:00", "user_id": 1, "value": 1.0}],
        [{"ts": "2024-01-01 10:00:05", "user_id": 1, "value": 2.0}],
    )
    agg = stream.groupBy("user_id").agg(F.sum("value").alias("total"))
    q = (
        agg.writeStream.format("memory")
        .queryName("t_proc_trigger")
        .outputMode("update")
        .trigger(processingTime="1 second")
        .start()
    )
    try:
        deadline = time.time() + 30
        while time.time() < deadline:
            rows = {r["user_id"]: r["total"] for r in spark.table("t_proc_trigger").collect()}
            if rows.get(1) == 3.0:
                break
            time.sleep(0.5)
        assert rows.get(1) == 3.0, rows
    finally:
        q.stop()


def test_funnel_stages_cross_batch_progression(spark, tmp_path):
    """State carries the reached-time across batches: a click in batch
    2 that PRECEDES batch 1's view must not advance the funnel, while
    one after it must; intra-batch arrival order is irrelevant (events
    are sorted by event time inside the operator)."""
    import json as _json

    from netflow_analysis_with_spark_streaming_spark.streaming import (
        sources,
        stateful,
    )

    t = lambda m: f"2024-01-01T10:{m:02d}:00"  # noqa: E731
    # batch 1: user 1 views at :05 (file carries events SHUFFLED)
    b1 = [
        {"user_id": 1, "event_type": "view", "ts": t(5)},
        {"user_id": 1, "event_type": "click", "ts": t(2)},  # before view
        {"user_id": 2, "event_type": "view", "ts": t(1)},
    ]
    # batch 2: user 1 clicks at :03 (stale, ignored) and :08 (advances),
    # then purchases at :07 (before click -> ignored) — stays stage 2
    b2 = [
        {"user_id": 1, "event_type": "purchase", "ts": t(7)},
        {"user_id": 1, "event_type": "click", "ts": t(3)},
        {"user_id": 1, "event_type": "click", "ts": t(8)},
        {"user_id": 2, "event_type": "click", "ts": t(9)},
    ]
    src = tmp_path / "src"
    src.mkdir()
    (src / "b1.json").write_text(_json.dumps(b1))
    (src / "b2.json").write_text(_json.dumps(b2))
    raw = sources.json_file_source(
        spark,
        str(src),
        spark.createDataFrame([], "user_id long, event_type string, ts timestamp").schema,
        max_files_per_trigger=1,
    )
    out = stateful.funnel_stages(raw)
    q = (
        out.writeStream.format("memory")
        .queryName("funnel_t")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = spark.sql(
        "SELECT user_id, stage FROM funnel_t"
    ).collect()
    # stages are monotone non-decreasing, so max == the final state
    # (memory-sink row order carries no batch identity to fold on)
    final: dict[int, int] = {}
    for r in rows:
        final[r["user_id"]] = max(final.get(r["user_id"], 0), r["stage"])
    assert final == {1: 2, 2: 2}, (final, rows)
    # batch 1 alone must NOT have credited the stale click
    batch1_emissions = [r["stage"] for r in rows if r["user_id"] == 1]
    assert 1 in batch1_emissions, rows
