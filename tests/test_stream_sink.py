"""VersionedTable as a native Structured Streaming SINK (storage/
stream_sink.py): writeStream.format("versioned_table") lands each
micro-batch as one atomic, batch-id-idempotent version through the
Python Data Source API's two-phase writer. The battery pins the
contract at both levels: end-to-end (a real stream from the feed
SOURCE into the sink — engine reading itself writing itself) and
unit (replay idempotency, type fidelity, mapping/constraint
fail-close, staged-group hygiene)."""

import json
import os
from datetime import date, datetime

import pyspark.sql.functions as F
import pytest

from netflow_analysis_with_spark_streaming_spark.storage.stream_sink import (
    FORMAT_NAME as SINK_FORMAT,
)
from netflow_analysis_with_spark_streaming_spark.storage.stream_sink import (
    VersionedSinkDataSource,
    VersionedSinkWriter,
    register_table_sink,
)
from netflow_analysis_with_spark_streaming_spark.storage.stream_source import (
    FORMAT_NAME as FEED_FORMAT,
)
from netflow_analysis_with_spark_streaming_spark.storage.stream_source import (
    register_feed_source,
)
from netflow_analysis_with_spark_streaming_spark.storage.versioned import (
    VersionedTable,
)


def _df(spark, rows):
    return spark.createDataFrame(rows, "k long, v string")


def _rows_batch(schema_json, rows):
    """Arrow batch shaped the way Spark's transport delivers data to
    the arrow writer: logical field order, timestamps as epoch-micros
    arrays (a naive local wall-clock datetime becomes the aware
    instant the JVM would tag with the session zone — collect()'s own
    convention, so round-trip asserts stay zone-honest)."""
    import pyarrow as pa
    from pyspark.sql.pandas.types import to_arrow_schema
    from pyspark.sql.types import StructType

    sch = to_arrow_schema(StructType.fromJson(json.loads(schema_json)))
    cols = []
    for i, f in enumerate(sch):
        vals = [r[i] for r in rows]
        if pa.types.is_timestamp(f.type) and f.type.tz is not None:
            vals = [
                v.astimezone() if v is not None and v.tzinfo is None else v
                for v in vals
            ]
        cols.append(pa.array(vals, type=f.type))
    return pa.RecordBatch.from_arrays(cols, schema=sch)


def test_stream_feed_into_sink_end_to_end(spark, tmp_path):
    """The headline: a versioned table's typed change feed streams
    into ANOTHER versioned table through the native sink — no
    foreachBatch, no driver-side landing code. Each availableNow run
    commits batch-id-stamped appends; a second run with new source
    commits picks up exactly the delta."""
    src = VersionedTable(str(tmp_path / "src"))
    src.append(_df(spark, [(1, "a"), (2, "b")]))
    src.append(_df(spark, [(3, "c")]))
    register_feed_source(spark)
    register_table_sink(spark)
    dst_root = str(tmp_path / "dst")

    def run():
        q = (
            spark.readStream.format(FEED_FORMAT)
            .option("path", src.root)
            .load()
            .writeStream.format(SINK_FORMAT)
            .option("path", dst_root)
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    run()
    dst = VersionedTable(dst_root)
    got = {
        (r["k"], r["v"], r["_change_type"], r["_commit_version"])
        for r in dst.read(spark).collect()
    }
    want = {
        (r["k"], r["v"], r["_change_type"], r["_commit_version"])
        for r in src.read_change_feed(spark, -1).collect()
    }
    assert got == want and len(got) == 3
    assert all(h["action"] == "append" for h in dst.history())
    assert all(h["batch_id"] is not None for h in dst.history())
    assert dst.fsck() == []
    # incremental: one more source commit, same checkpoint -> delta only
    src.append(_df(spark, [(4, "d")]))
    n_versions = len(dst.versions())
    run()
    got2 = {(r["k"], r["_commit_version"]) for r in dst.read(spark).collect()}
    assert got2 == {(1, 0), (2, 0), (3, 1), (4, 2)}
    assert len(dst.versions()) == n_versions + 1
    # third run with nothing new: empty batch commits nothing
    run()
    assert len(dst.versions()) == n_versions + 1
    # stats recorded at write time: out-of-range prune hits nothing
    assert dst.snapshot_files(prune=("k", 10_000, 20_000)) == []


def test_sink_replayed_batch_is_noop_and_drops_staging(spark, tmp_path):
    """Exactly-once at the unit level: commit() with an
    already-committed batchId must publish nothing AND delete the
    replay's freshly staged groups (they hold the same rows — leaving
    them would leak unreferenced garbage)."""
    root = str(tmp_path / "t")
    os.makedirs(root)
    schema_json = json.dumps(
        {
            "type": "struct",
            "fields": [
                {"name": "k", "type": "long", "nullable": True, "metadata": {}},
                {"name": "v", "type": "string", "nullable": True, "metadata": {}},
            ],
        }
    )
    w = VersionedSinkWriter(root, schema_json, {}, [], ["k"])
    m1 = w.write(iter([_rows_batch(schema_json, [(1, "a"), (2, "b")])]))
    w.commit([m1], 7)
    t = VersionedTable(root)
    assert t.read(spark).count() == 2
    assert t.history()[-1]["batch_id"] == 7
    # replay: same batch id, fresh staging
    m2 = w.write(iter([_rows_batch(schema_json, [(1, "a"), (2, "b")])]))
    staged_dir = os.path.join(root, m2.group)
    assert os.path.isdir(staged_dir)
    w.commit([m2], 7)
    assert len(t.versions()) == 1  # nothing double-landed
    assert t.read(spark).count() == 2
    assert not os.path.isdir(staged_dir)  # replay staging reclaimed
    assert t.fsck() == []
    # abort: staged groups deleted, nothing committed
    m3 = w.write(iter([_rows_batch(schema_json, [(9, "z")])]))
    w.abort([m3], 8)
    assert not os.path.isdir(os.path.join(root, m3.group))
    assert len(t.versions()) == 1


def test_sink_type_fidelity_roundtrip(spark, tmp_path):
    """Worker-side arrow staging must round-trip every supported
    type through a Spark read: integral/floating/string/boolean/
    binary/date/timestamp/array. Timestamps are the treacherous one
    (naive local-zone Rows -> integer micros -> UTC-adjusted
    parquet); integer-exact conversion is asserted to the
    microsecond."""
    root = str(tmp_path / "t")
    fields = [
        ("i", "integer"),
        ("l", "long"),
        ("d", "double"),
        ("s", "string"),
        ("b", "boolean"),
        ("raw", "binary"),
        ("dt", "date"),
        ("ts", "timestamp"),
        ("arr", {"type": "array", "elementType": "float", "containsNull": True}),
    ]
    schema_json = json.dumps(
        {
            "type": "struct",
            "fields": [
                {"name": n, "type": t, "nullable": True, "metadata": {}}
                for n, t in fields
            ],
        }
    )
    ts = datetime(2026, 3, 14, 15, 9, 26, 535897)
    row = (
        7,
        2**40,
        3.5,
        "x",
        True,
        b"\x00\x01",
        date(2026, 2, 28),
        ts,
        [1.5, -2.0],
    )
    w = VersionedSinkWriter(root, schema_json, {}, [], ["l", "dt", "ts"])
    os.makedirs(root)
    w.commit([w.write(iter([_rows_batch(schema_json, [row, tuple([None] * 9)])]))], 0)
    t = VersionedTable(root)
    got = t.read(spark).orderBy(F.col("i").asc_nulls_last()).collect()
    assert len(got) == 2
    r = got[0]
    assert (r["i"], r["l"], r["d"], r["s"], r["b"]) == (7, 2**40, 3.5, "x", True)
    assert bytes(r["raw"]) == b"\x00\x01"
    assert r["dt"] == date(2026, 2, 28)
    assert r["ts"] == ts  # microsecond-exact through the local-zone hop
    assert r["arr"] == [1.5, -2.0]
    assert all(v is None for v in got[1].asDict().values())
    # temporal stats recorded (JSON-stringified like every writer)
    s = t._manifest(0)["stats"]
    (g,) = s
    assert s[g]["l"] == [2**40, 2**40]
    assert s[g]["__rows__"] == 2


def test_sink_refuses_constraints_and_unsupported_types(spark, tmp_path):
    """Fail-closed surfaces: a CHECK-constrained table refuses the
    sink at writer creation AND at commit_staged (no SparkSession to
    enforce predicates in the data-source worker); an unsupported
    column type refuses at creation, never mid-stream."""
    from pyspark.sql.types import StructType

    root = str(tmp_path / "t")
    t = VersionedTable(root)
    t.append(_df(spark, [(1, "a")]))
    t.set_check_constraint("k_pos", "k > 0")
    ds = VersionedSinkDataSource(options={"path": root})
    schema = StructType.fromJson(
        json.loads(_df(spark, [(1, "a")]).schema.json())
    )
    with pytest.raises(ValueError, match="CHECK constraint"):
        ds.streamWriter(schema, False)
    with pytest.raises(ValueError, match="CHECK constraint"):
        t.commit_staged(["data/xyz"], {}, schema.json())
    # generated columns refuse the sink the same way (no SparkSession
    # to evaluate the expression at commit time)
    t2 = VersionedTable(str(tmp_path / "tg"))
    t2.append(_df(spark, [(1, "a")]))
    # expressions OUTSIDE the narrow arrow subset refuse at creation
    # (the foreachBatch+append contract); commit_staged without the
    # staging-side attestation refuses regardless
    t2.set_generated_column("vu", "upper(v)")
    ds_g = VersionedSinkDataSource(options={"path": t2.root})
    with pytest.raises(ValueError, match="outside the sink's supported"):
        ds_g.streamWriter(schema, False)
    with pytest.raises(ValueError, match="generated column"):
        t2.commit_staged(["data/xyz"], {}, schema.json())
    # unsupported type (interval — arrow duration, no parquet story)
    # fails at creation; nested/map/decimal are SUPPORTED since the
    # arrow-writer rework, so the probe type is an interval column
    bad = spark.sql(
        "SELECT id * INTERVAL '1' SECOND AS dur FROM range(1)"
    ).schema
    ds2 = VersionedSinkDataSource(options={"path": str(tmp_path / "t2")})
    with pytest.raises(ValueError, match="unsupported column type"):
        ds2.streamWriter(bad, False)
    # VARIANT would silently round-trip as a bare struct-of-binaries
    bad_v = spark.sql("SELECT parse_json('{\"a\":1}') AS v").schema
    with pytest.raises(ValueError, match="unsupported column type"):
        ds2.streamWriter(bad_v, False)


def test_sink_fails_closed_on_concurrent_rename(spark, tmp_path):
    """A rename landing between staging and commit means the staged
    files bind to the OLD physical names — commit must fail with the
    actionable restart message and reclaim the staged groups, never
    publish a manifest whose mapping mismatches its files."""
    root = str(tmp_path / "t")
    t = VersionedTable(root)
    t.append(_df(spark, [(1, "a")]))
    schema_json = _df(spark, [(1, "a")]).schema.json()
    w = VersionedSinkWriter(root, schema_json, {}, [], ["k"])
    m = w.write(iter([_rows_batch(schema_json, [(2, "b")])]))
    staged = os.path.join(root, m.group)
    t.rename_column("v", "w")  # race winner
    with pytest.raises(ValueError, match="restart the stream"):
        w.commit([m], 1)
    assert not os.path.isdir(staged)
    assert len(t.versions()) == 2  # append + rename only
    assert t.fsck() == []


def test_sink_writes_under_pinned_column_mapping(spark, tmp_path):
    """A table renamed BEFORE the stream starts: the writer pins the
    mapping at creation and stages files under PHYSICAL names, so the
    landed rows surface under the new LOGICAL name next to the carried
    pre-rename bytes — the same translation discipline every other
    write path follows."""
    root = str(tmp_path / "t")
    t = VersionedTable(root)
    t.append(_df(spark, [(1, "a")]))
    t.rename_column("v", "label")  # files keep physical name 'v'
    register_table_sink(spark)
    spark.createDataFrame([(2, "b")], "k long, label string").write.format(
        SINK_FORMAT
    ).option("path", root).mode("append").save()
    got = {(r["k"], r["label"]) for r in t.read(spark).collect()}
    assert got == {(1, "a"), (2, "b")}
    assert t.fsck() == []
    # the staged file really is physical-named: reading the newest
    # group raw shows column 'v', not 'label'
    import pyarrow.parquet as pq

    g = [f for f in t.snapshot_files() if f not in set(t.snapshot_files(0))]
    (gdir,) = g
    raw = pq.read_table(os.path.join(root, gdir))
    assert "v" in raw.column_names and "label" not in raw.column_names


def test_sink_batch_twin_and_schema_evolution(spark, tmp_path):
    """The batch writer twin: df.write.format("versioned_table")
    appends (or overwrites under mode("overwrite")) through the same
    staging path; an evolved frame (new column) commits the UNION
    schema, and earlier rows read NULL for the new column."""
    register_table_sink(spark)
    root = str(tmp_path / "t")
    _df(spark, [(1, "a"), (2, "b")]).write.format(SINK_FORMAT).option(
        "path", root
    ).mode("append").save()
    t = VersionedTable(root)
    assert t.read(spark).count() == 2
    # evolution: extra column appends the union schema
    spark.createDataFrame(
        [(3, "c", 9.5)], "k long, v string, score double"
    ).write.format(SINK_FORMAT).option("path", root).mode("append").save()
    got = {r["k"]: (r["v"], r["score"]) for r in t.read(spark).collect()}
    assert got == {1: ("a", None), 2: ("b", None), 3: ("c", 9.5)}
    # overwrite twin replaces the rowset and the schema
    _df(spark, [(9, "z")]).write.format(SINK_FORMAT).option(
        "path", root
    ).mode("overwrite").save()
    assert [r["k"] for r in t.read(spark).collect()] == [9]
    assert t.history()[-1]["action"] == "overwrite"
    # pre-overwrite history stays addressable (time travel)
    assert t.read(spark, version=t.latest_version() - 1).count() == 3


def test_sink_idempotency_scoped_per_query(spark, tmp_path):
    """Exactly-once must be scoped per QUERY (Delta's txnAppId rule):
    batch ids restart at 0 for every fresh checkpoint, so a second
    query into the same table — or a restart with a new checkpoint —
    must LAND, not be silently dropped as a fake replay; only a
    replay of the SAME query's batch no-ops."""
    root = str(tmp_path / "t")
    os.makedirs(root)
    schema_json = _df(spark, [(1, "a")]).schema.json()
    w_q1 = VersionedSinkWriter(root, schema_json, {}, [], ["k"], app_id="q1")
    w_q2 = VersionedSinkWriter(root, schema_json, {}, [], ["k"], app_id="q2")
    w_q1.commit([w_q1.write(iter([_rows_batch(schema_json, [(1, "a")])]))], 0)
    t = VersionedTable(root)
    assert t.read(spark).count() == 1
    # different query, same bare batchId: LANDS (the data-loss bug)
    w_q2.commit([w_q2.write(iter([_rows_batch(schema_json, [(2, "b")])]))], 0)
    assert t.read(spark).count() == 2
    # same query replaying its batch: no-op, staging reclaimed
    m = w_q1.write(iter([_rows_batch(schema_json, [(1, "a")])]))
    staged = os.path.join(root, m.group)
    w_q1.commit([m], 0)
    assert t.read(spark).count() == 2
    assert not os.path.isdir(staged)
    # the committed keys are the scoped pairs, not bare ints
    assert {h["batch_id"] for h in t.history()} == {"q1#0", "q2#0"}
    assert t.fsck() == []


def test_sink_stream_writer_requires_query_identity(spark, tmp_path):
    """streamWriter without txnAppId or checkpointLocation fails at
    creation (ambiguous idempotency scope is data loss waiting);
    txnAppId alone satisfies it."""
    from pyspark.sql.types import StructType

    root = str(tmp_path / "t")
    VersionedTable(root).append(_df(spark, [(1, "a")]))
    schema = StructType.fromJson(json.loads(_df(spark, [(1, "a")]).schema.json()))
    with pytest.raises(ValueError, match="per-query identity"):
        VersionedSinkDataSource(options={"path": root}).streamWriter(
            schema, False
        )
    w = VersionedSinkDataSource(
        options={"path": root, "txnappid": "jobA"}
    ).streamWriter(schema, False)
    assert w.app_id == "jobA"
    w2 = VersionedSinkDataSource(
        options={"path": root, "checkpointlocation": "/ck/pt/"}
    ).streamWriter(schema, False)
    assert w2.app_id == "/ck/pt"


def test_sink_nested_timestamps_match_toplevel_encoding(tmp_path):
    """Instant fidelity at every nesting depth on the arrow path:
    Spark's transport delivers timestamps as epoch-micros arrays
    tagged with the SESSION zone, and the staged cast to UTC must
    RELABEL — never shift — those instants, for a top-level column,
    an array element, and a two-deep NTZ leaf alike. Pin it
    zone-independently by feeding a batch tagged with a non-UTC zone
    and asserting the STORED micros (raw parquet, no Spark session)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    root = str(tmp_path / "t")
    os.makedirs(root)
    schema_json = json.dumps(
        {
            "type": "struct",
            "fields": [
                {"name": "ts", "type": "timestamp", "nullable": True, "metadata": {}},
                {
                    "name": "arr",
                    "type": {
                        "type": "array",
                        "elementType": "timestamp",
                        "containsNull": True,
                    },
                    "nullable": True,
                    "metadata": {},
                },
                {
                    "name": "nested",
                    "type": {
                        "type": "array",
                        "elementType": {
                            "type": "array",
                            "elementType": "timestamp_ntz",
                            "containsNull": True,
                        },
                        "containsNull": True,
                    },
                    "nullable": True,
                    "metadata": {},
                },
            ],
        }
    )
    micros = 1773559812345678  # one fixed instant, as epoch micros
    ny = pa.timestamp("us", tz="America/New_York")  # hostile session zone
    ntz = pa.timestamp("us")
    batch = pa.RecordBatch.from_arrays(
        [
            pa.array([micros, None], type=pa.int64()).cast(ny),
            pa.array([[micros, None], None], type=pa.list_(pa.int64())).cast(
                pa.list_(ny)
            ),
            # NTZ arrives zone-free from Spark: wall-clock micros
            pa.array(
                [[[micros]], None], type=pa.list_(pa.list_(pa.int64()))
            ).cast(pa.list_(pa.list_(ntz))),
        ],
        names=["ts", "arr", "nested"],
    )
    w = VersionedSinkWriter(root, schema_json, {}, [], [])
    m = w.write(iter([batch]))
    w.commit([m], 0)
    raw = pq.read_table(os.path.join(root, m.group))
    # stored micros identical between nesting levels (instant columns)
    assert raw.column("ts").type == pa.timestamp("us", tz="UTC")
    assert raw.column("ts").cast(pa.int64()).to_pylist() == [micros, None]
    arr = raw.column("arr").combine_chunks()
    assert arr.type == pa.list_(pa.timestamp("us", tz="UTC"))
    assert arr.to_pylist()[1] is None
    assert arr.flatten().cast(pa.int64()).to_pylist() == [micros, None]
    # NTZ leaf two levels deep: zone-free wall-clock, byte-identical
    deep = raw.column("nested").combine_chunks()
    assert deep.type == pa.list_(pa.list_(pa.timestamp("us")))
    assert deep.flatten().flatten().cast(pa.int64()).to_pylist() == [micros]
    assert deep.to_pylist()[0][0][0] == datetime(2026, 3, 15, 7, 30, 12, 345678)


def test_sink_empty_overwrite_truncates(spark, tmp_path):
    """mode('overwrite') with an EMPTY frame must still publish the
    truncating commit — an early return would silently keep the old
    contents, diverging from VersionedTable.overwrite."""
    register_table_sink(spark)
    root = str(tmp_path / "t")
    _df(spark, [(1, "a"), (2, "b")]).write.format(SINK_FORMAT).option(
        "path", root
    ).mode("append").save()
    t = VersionedTable(root)
    assert t.read(spark).count() == 2
    _df(spark, []).write.format(SINK_FORMAT).option("path", root).mode(
        "overwrite"
    ).save()
    assert t.read(spark).count() == 0
    assert t.history()[-1]["action"] == "overwrite"
    # time travel still serves the pre-truncate snapshot
    assert t.read(spark, version=t.latest_version() - 1).count() == 2
    assert t.fsck() == []


def test_sink_chunked_staging_bounds_memory(spark, tmp_path, monkeypatch):
    """write() buffers incoming arrow batches only up to FLUSH_ROWS
    before writing one parquet row group: with the flush size forced
    tiny, a task fed five 5-row batches still lands ONE staged file
    whose parquet has multiple row groups (10+10+5), with min/max
    stats folded across every flush — executor memory stays O(flush),
    never O(micro-batch partition)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    monkeypatch.setattr(VersionedSinkWriter, "FLUSH_ROWS", 7)
    root = str(tmp_path / "t")
    os.makedirs(root)
    schema_json = _df(spark, [(1, "a")]).schema.json()
    w = VersionedSinkWriter(root, schema_json, {}, [], ["k"])
    batches = [
        pa.RecordBatch.from_arrays(
            [
                pa.array([i * 5 + j for j in range(5)], type=pa.int64()),
                pa.array([f"r{i * 5 + j}" for j in range(5)]),
            ],
            names=["k", "v"],
        )
        for i in range(5)
    ]
    m = w.write(iter(batches))
    assert m.rows == 25
    assert m.stats["k"] == [0, 24]  # folded across all 3 flushes
    assert m.stats["__rows__"] == 25
    pf = pq.ParquetFile(os.path.join(root, m.group, "part-0.parquet"))
    assert pf.metadata.num_row_groups == 3  # 10+10+5 (flush at >=7)
    w.commit([m], 0)
    t = VersionedTable(root)
    got = sorted(r["k"] for r in t.read(spark).collect())
    assert got == list(range(25))
    assert t.fsck() == []


def test_sink_writer_is_arrow_native(spark, tmp_path):
    """The sink writer subclasses the Arrow writer ABCs — the exact
    isinstance Spark's write worker dispatches on — so rows never
    materialize as Python objects on the staging path (measured ~7.5x
    staging throughput vs the row-iterator writer; BASELINE.md
    round 11)."""
    from pyspark.sql.datasource import (
        DataSourceArrowWriter,
        DataSourceStreamArrowWriter,
    )

    root = str(tmp_path / "t")
    os.makedirs(root)
    ds = VersionedSinkDataSource(options={"path": root, "txnappid": "q1"})
    schema = _df(spark, [(1, "a")]).schema
    assert isinstance(ds.writer(schema, False), DataSourceArrowWriter)
    assert isinstance(
        ds.streamWriter(schema, False), DataSourceStreamArrowWriter
    )


def test_sink_refuses_unorderable_stats_cols_at_creation(spark, tmp_path):
    """An explicit statsCols naming an array/binary/boolean column
    must refuse at WRITER CREATION — min/max over those would only
    blow up at the first arrow chunk, mid-stream."""
    from pyspark.sql.types import StructType

    root = str(tmp_path / "t")
    VersionedTable(root).append(_df(spark, [(1, "a")]))
    schema = StructType.fromJson(
        json.loads(
            spark.createDataFrame(
                [(1, [1.0])], "k long, emb array<double>"
            ).schema.json()
        )
    )
    with pytest.raises(ValueError, match="not orderable"):
        VersionedSinkDataSource(
            options={"path": root, "statscols": "emb", "txnappid": "q"}
        ).streamWriter(schema, False)
    # a valid explicit list still works
    w = VersionedSinkDataSource(
        options={"path": root, "statscols": "k", "txnappid": "q"}
    ).streamWriter(schema, False)
    assert w.stats_cols == ["k"]


def test_sink_nested_types_roundtrip(spark, tmp_path):
    """The sink accepts the full nested surface — struct, map, array,
    decimal, nested timestamps — and the table reads back EXACTLY,
    through both the Python API and the vanilla format reader (the
    document shapes the reference pushed at Mongo, README.md:130-142,
    now land as typed parquet instead of BSON)."""
    register_table_sink(spark)
    root = str(tmp_path / "t")
    src = spark.sql(
        """
        SELECT id,
               named_struct('a', CAST(id AS INT),
                            'when', timestamp_micros(1700000000000000 + id),
                            'tags', array(CAST(id AS STRING), 'x')) AS st,
               map('k1', CAST(id AS DECIMAL(10,2)),
                   'k2', CAST(id * 2 AS DECIMAL(10,2))) AS m,
               array(named_struct('d', date_add(date'2024-01-01', CAST(id AS INT)))) AS arr
        FROM range(100)
        """
    )
    src.write.format(SINK_FORMAT).option("path", root).mode("append").save()
    t = VersionedTable(root)
    exp = sorted(src.collect(), key=lambda r: r.id)

    got_api = sorted(t.read(spark).collect(), key=lambda r: r.id)
    assert got_api == exp

    got_fmt = sorted(
        spark.read.format(SINK_FORMAT).option("path", root).load().collect(),
        key=lambda r: r.id,
    )
    assert got_fmt == exp

    # nested columns carry no skipping stats; the scalar still does
    v = t.latest_version()
    stats = next(iter(t._load_record(v)["stats"].values()))
    assert "id" in stats
    assert "st" not in stats and "m" not in stats and "arr" not in stats
    assert t.fsck() == []

def test_sink_nested_types_survive_dv_delete_and_stream(spark, tmp_path):
    """Nested columns flow through the WHOLE storage stack, not just
    the writer: a merge-on-read DV delete anti-filters files carrying
    struct columns executor-side, and the insert-only table stream
    serves them through the arrow read path."""
    register_table_sink(spark)
    root = str(tmp_path / "t")
    src = spark.sql(
        """
        SELECT id, named_struct('a', CAST(id AS INT), 'b', CAST(id AS STRING)) AS st
        FROM range(50)
        """
    )
    src.write.format(SINK_FORMAT).option("path", root).mode("append").save()
    t = VersionedTable(root)
    t.delete_where_dv(spark, "id % 5 = 0")
    kept = t.read(spark)
    assert kept.count() == 40
    assert sorted(r.st.a for r in kept.collect()) == sorted(
        i for i in range(50) if i % 5
    )
    # vanilla-session stream over the table (bare rows): the snapshot
    # open serves the DV-filtered struct rows through _read_partition
    out = (
        spark.readStream.format(SINK_FORMAT)
        .option("path", root)
        .option("initialSnapshot", "true")
        .option("skipChangeCommits", "true")
        .load()
    )
    q = (
        out.writeStream.format("memory")
        .queryName("nested_tbl_stream")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT * FROM nested_tbl_stream").collect()
    assert sorted(r.st.a for r in rows) == sorted(
        i for i in range(50) if i % 5
    )

def test_sink_stats_cols_exclude_nested_and_decimal(spark, tmp_path):
    """Explicit statsCols naming a nested or decimal column refuses at
    creation (no order / lexicographic traps in the skipping index)."""
    register_table_sink(spark)
    root = str(tmp_path / "t")
    os.makedirs(root)
    df = spark.sql(
        """
        SELECT id, CAST(id AS DECIMAL(10,2)) AS dec,
               named_struct('a', id) AS st
        FROM range(3)
        """
    )
    for bad in ("dec", "st"):
        with pytest.raises(Exception, match="not orderable"):
            df.write.format(SINK_FORMAT).option("path", root).option(
                "statsCols", f"id,{bad}"
            ).mode("append").save()


def test_sink_generated_columns_narrow_evaluator(spark, tmp_path):
    """The two derived-pruning-key shapes (shard-from-id, day-from-ts)
    MATERIALIZE through the native sink's arrow evaluator, and the
    values are DIFFERENTIALLY identical to append's Catalyst
    evaluation — including negative dividends (Spark's % keeps the
    dividend sign) and the timestamp->date session-zone hop. The
    generated columns land in the skipping stats (they are pruning
    keys — the point of declaring them)."""
    register_table_sink(spark)
    src = spark.createDataFrame(
        [
            (7, datetime(2026, 3, 14, 23, 59, 59)),
            (-7, datetime(2026, 3, 15, 0, 0, 0)),
            (10, None),
            (None, datetime(2026, 1, 2, 3, 4, 5)),
        ],
        "k long, ts timestamp",
    )
    # reference values via Catalyst (_enforce inside append)
    t_ref = VersionedTable(str(tmp_path / "ref"))
    t_ref.set_generated_column("shard", "k % 3")
    t_ref.set_generated_column("day", "to_date(ts)")
    t_ref.append(src)
    # same rows via the native sink's arrow evaluator
    t_got = VersionedTable(str(tmp_path / "got"))
    t_got.set_generated_column("shard", "k % 3")
    t_got.set_generated_column("day", "to_date(ts)")
    # one task -> one staged group, so the group's day/shard stats
    # cover every row (a null-only group would be unprunable)
    src.coalesce(1).write.format(SINK_FORMAT).option(
        "path", t_got.root
    ).mode("append").save()
    key = lambda r: (r[0] is None, r[0])
    ref = sorted(map(tuple, t_ref.read(spark).collect()), key=key)
    got = sorted(map(tuple, t_got.read(spark).collect()), key=key)
    assert got == ref
    # Spark's sign rule really held: -7 % 3 == -1, not 2
    by_k = {r[0]: r for r in got}
    assert by_k[-7][2] == -1
    # generated columns are in the skipping index (pruning keys)
    stats = next(iter(t_got._load_record(t_got.latest_version())["stats"].values()))
    assert "shard" in stats and "day" in stats
    # and pruning on the generated day actually skips
    assert t_got.snapshot_files(prune=("day", "2027-01-01", "2027-12-31")) == []


def test_sink_generated_provided_values_validate(spark, tmp_path):
    """A stream that PROVIDES a generated column is validated
    value-for-value against the expression (append's _enforce rule):
    a disagreeing batch aborts with nothing landed and staging
    reclaimed."""
    register_table_sink(spark)
    t = VersionedTable(str(tmp_path / "t"))
    t.set_generated_column("shard", "k % 3")
    ok = spark.createDataFrame([(7, 1), (6, 0)], "k long, shard long")
    ok.write.format(SINK_FORMAT).option("path", t.root).mode("append").save()
    assert {(r["k"], r["shard"]) for r in t.read(spark).collect()} == {
        (7, 1),
        (6, 0),
    }
    bad = spark.createDataFrame([(7, 2)], "k long, shard long")
    with pytest.raises(Exception, match="disagree with the declared"):
        bad.write.format(SINK_FORMAT).option("path", t.root).mode(
            "append"
        ).save()
    assert t.read(spark).count() == 2  # nothing landed
    assert t.fsck() == []  # no orphaned staged garbage in the manifest
    # provided-with-wrong-TYPE refuses at creation
    wrong = spark.createDataFrame([(1, "x")], "k long, shard string")
    with pytest.raises(Exception, match="expression yields"):
        wrong.write.format(SINK_FORMAT).option("path", t.root).mode(
            "append"
        ).save()


def test_sink_generated_definition_change_fails_commit(spark, tmp_path):
    """The pinned definitions are attested at commit (the
    mapping-identity discipline): a generated column added while the
    batch was staged fails the commit closed and the sink's wrapper
    reclaims the staged group."""
    import pyarrow as pa

    register_table_sink(spark)
    t = VersionedTable(str(tmp_path / "t"))
    t.set_generated_column("shard", "k % 3")
    schema_json = spark.createDataFrame([], "k long").schema.json()
    ds = VersionedSinkDataSource(options={"path": t.root, "txnappid": "q"})
    w = ds.streamWriter(
        spark.createDataFrame([], "k long").schema, False
    )
    batch = pa.RecordBatch.from_arrays(
        [pa.array([1, 2], type=pa.int64())], names=["k"]
    )
    m = w.write(iter([batch]))
    staged = os.path.join(t.root, m.group)
    assert os.path.isdir(staged)
    t.set_generated_column("day2", "k % 7")  # race winner
    with pytest.raises(ValueError, match="current definitions"):
        w.commit([m], 0)
    assert not os.path.isdir(staged)  # wrapper reclaimed staging
    assert t.latest_version() is None  # nothing published


def test_sink_generated_columns_stream_end_to_end(spark, tmp_path):
    """Generated columns through a REAL stream: the feed of a source
    table streams into a destination that declares shard-from-id, the
    arrow evaluator materializes it per micro-batch, and a second
    availableNow run lands only the delta — exactly-once unchanged by
    the generation step."""
    src = VersionedTable(str(tmp_path / "src"))
    src.append(_df(spark, [(1, "a"), (-7, "b")]))
    register_feed_source(spark)
    register_table_sink(spark)
    dst = VersionedTable(str(tmp_path / "dst"))
    dst.set_generated_column("shard", "k % 3")

    def run():
        q = (
            spark.readStream.format(FEED_FORMAT)
            .option("path", src.root)
            .load()
            .select("k", "v")  # bare data cols; shard is generated
            .writeStream.format(SINK_FORMAT)
            .option("path", dst.root)
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    run()
    got = {(r["k"], r["v"], r["shard"]) for r in dst.read(spark).collect()}
    assert got == {(1, "a", 1), (-7, "b", -1)}  # Spark sign rule
    src.append(_df(spark, [(5, "c")]))
    run()
    got2 = {(r["k"], r["shard"]) for r in dst.read(spark).collect()}
    assert got2 == {(1, 1), (-7, -1), (5, 2)}
    assert dst.fsck() == []


def test_sink_generated_dropped_definition_fails_commit(spark, tmp_path):
    """Dropping EVERY generated definition while a batch is staged
    also fails the commit closed (the attestation compares whenever
    either side is non-empty — gens == {} must not skip the check and
    silently publish a stale materialized column)."""
    import pyarrow as pa

    register_table_sink(spark)
    t = VersionedTable(str(tmp_path / "t"))
    t.set_generated_column("shard", "k % 3")
    ds = VersionedSinkDataSource(options={"path": t.root, "txnappid": "q"})
    w = ds.streamWriter(spark.createDataFrame([], "k long").schema, False)
    batch = pa.RecordBatch.from_arrays(
        [pa.array([1], type=pa.int64())], names=["k"]
    )
    m = w.write(iter([batch]))
    t.drop_generated_column("shard")  # race winner drops the LAST one
    with pytest.raises(ValueError, match="current definitions"):
        w.commit([m], 0)
    assert not os.path.isdir(os.path.join(t.root, m.group))
    assert t.latest_version() is None


def test_sink_generated_missing_source_column_diagnosis(spark, tmp_path):
    """A supported-shape expression whose SOURCE column the stream
    does not carry (or carries mistyped) gets the precise diagnosis —
    not the misleading 'outside the supported subset' message, whose
    foreachBatch suggestion would fail on the same missing column."""
    register_table_sink(spark)
    t = VersionedTable(str(tmp_path / "t"))
    t.set_generated_column("day", "to_date(ts)")
    ds = VersionedSinkDataSource(options={"path": t.root, "txnappid": "q"})
    no_ts = spark.createDataFrame([], "k long").schema
    with pytest.raises(ValueError, match="absent from the stream schema"):
        ds.streamWriter(no_ts, False)
    wrong_ts = spark.createDataFrame([], "k long, ts string").schema
    with pytest.raises(ValueError, match="not a timestamp"):
        ds.streamWriter(wrong_ts, False)

def test_sink_generated_modulus_zero_gets_precise_diagnosis():
    """`k % 0` on an integral column is a declaration bug (Catalyst
    evaluates it to constant NULL) — the compiler must say 'modulus
    must be >= 1', never the misleading 'not an integral type' path
    the n >= 1 guard used to fall into."""
    from netflow_analysis_with_spark_streaming_spark.storage.stream_sink import (
        _compile_generated,
    )

    with pytest.raises(ValueError, match="modulus must be >= 1"):
        _compile_generated("k % 0", {"k": "long"})
    # a zero modulus is diagnosed FIRST even when the column is also
    # mistyped — the declaration itself is unacceptable regardless
    with pytest.raises(ValueError, match="modulus must be >= 1"):
        _compile_generated("k % 0", {"k": "string"})
    # n >= 1 with a non-integral column keeps the column diagnosis
    with pytest.raises(ValueError, match="not an integral type"):
        _compile_generated("k % 3", {"k": "string"})


def test_sink_rejects_negative_scale_decimal():
    """The type allowlist's contract is 'parquet round-trip is exact';
    negative-scale decimals (legal in Spark's grammar, never emitted
    by schema JSON) are not round-trippable and must not slip through
    the decimal regex."""
    from netflow_analysis_with_spark_streaming_spark.storage.stream_sink import (
        _check_type,
    )

    _check_type("decimal(10,2)")  # the real shape still passes
    with pytest.raises(ValueError, match="unsupported column type"):
        _check_type("decimal(10,-2)")


def test_sink_write_failure_after_flush_reclaims_staged_group(
    spark, tmp_path, monkeypatch
):
    """A validation failure AFTER a prior flush in the same task must
    remove the already-staged data/<uuid> group: the commit message
    never reaches abort()'s _cleanup, so without in-task reclamation
    every retried batch of a misbehaving stream would leak a staged
    directory until vacuum."""
    import pyarrow as pa

    monkeypatch.setattr(VersionedSinkWriter, "FLUSH_ROWS", 1)
    register_table_sink(spark)
    t = VersionedTable(str(tmp_path / "t"))
    t.set_generated_column("shard", "k % 3")
    ds = VersionedSinkDataSource(options={"path": t.root, "txnappid": "q"})
    schema = spark.createDataFrame([], "k long, shard long").schema
    w = ds.streamWriter(schema, False)
    good = pa.RecordBatch.from_arrays(
        [pa.array([6], type=pa.int64()), pa.array([0], type=pa.int64())],
        names=["k", "shard"],
    )
    bad = pa.RecordBatch.from_arrays(
        [pa.array([7], type=pa.int64()), pa.array([2], type=pa.int64())],
        names=["k", "shard"],
    )
    with pytest.raises(ValueError, match="disagree with the declared"):
        w.write(iter([good, bad]))  # good flushed a group, bad aborts
    data_dir = os.path.join(t.root, "data")
    leftover = os.listdir(data_dir) if os.path.isdir(data_dir) else []
    assert leftover == []  # the flushed group was reclaimed in-task
