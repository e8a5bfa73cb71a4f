"""VersionedTable as a native Structured Streaming SINK.

``df.writeStream.format("versioned_table").option("path", root)`` —
the write-side twin of storage/stream_source.py, through PySpark 4's
Python Data Source API (DataSourceStreamWriter). The reference's
pipeline pushed results row-wise at a Mongo store (SURVEY §2 K1-K3;
reference README.md:130-142 — `sendMongoDB(partition)` opening a
client per partition and `collection.insert_one(record)` per row, no
atomicity, no replay safety); this sink lands each micro-batch as ONE
atomic, exactly-once version of a versioned table, with data-skipping
stats recorded at write time.

Two-phase commit, Delta-style:

- ``write()`` runs on EXECUTORS, one call per task, and — like the
  feed source's read path — never imports this package: rows are
  buffered to a pyarrow table (schema mapped from the pickled stream
  schema JSON), written as a single-file staged group under
  ``data/<uuid>/``, and the task returns a commit MESSAGE carrying
  the group path, its row count, and per-column min/max bounds
  computed from the arrow buffers. A crash here leaves unreferenced
  staged files (garbage for fsck/vacuum), never torn state.
- ``commit()`` runs once per micro-batch on the driver-side data
  source worker with ALL task messages: it publishes one manifest
  referencing every non-empty staged group, stamped with the
  micro-batch's ``batchId`` — the SAME batch-id idempotency slot the
  foreachBatch sinks use, so a replayed batch is a no-op (its staged
  groups are deleted, nothing double-lands) and a crash between
  commit and checkpoint write is absorbed exactly-once.
  ``abort()`` deletes the staged groups.

Semantics and fail-closed edges:

- **Schema evolution at commit**: the committed manifest schema is
  the UNION of the table schema and the stream schema (same rules as
  append — new columns add, numerics widen, irreconcilable types
  raise before anything is referenced).
- **Column mapping**: the writer pins the table's (mapping, retired)
  identity at creation; staged files are written under PHYSICAL
  names, and commit fails closed if a concurrent rename/drop changed
  the identity (the staged bytes bind to the old mapping — restart
  the stream; same stance as append's retry fail-close).
- **CHECK constraints**: enforcing a SQL predicate requires a
  SparkSession, which the data-source worker does not have — a table
  with constraints refuses this sink at writer creation AND at
  commit (add constraints only to tables fed via foreachBatch +
  ``append``, which enforces them).
- **Conflict handling**: the published version is a blind append, so
  losing a commit race auto-resolves by re-pinning and re-publishing
  the same staged groups (bounded retries), exactly like ``append``.

Options: ``path`` (table root, required), ``statsCols`` (csv of
columns to record min/max for; default = every primitive
non-binary top-level column).

Pair a continuous ingest with ``maybe_compact``/``compact_where`` —
each task lands its own single-file group (a 32-partition batch is 32
small groups), which is what the predicate-scoped OPTIMIZE exists to
fold; ``df.coalesce(k)`` before ``writeStream`` bounds it at the
source.

The batch twin (``df.write.format("versioned_table")``) lands one
un-stamped append (or an overwrite under ``mode("overwrite")``)
through the identical staging path.
"""

from __future__ import annotations

import json
import os
import shutil
import uuid
from typing import Iterator, List, Optional

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamWriter,
    DataSourceWriter,
    WriterCommitMessage,
)

FORMAT_NAME = "versioned_table"


class SinkCommitMessage(WriterCommitMessage):
    """One task's staged output: the group it landed (None = the task
    saw zero rows and staged nothing), its row count, and the
    per-column [min, max] bounds for the manifest's skipping index."""

    def __init__(self, group: str | None, rows: int, stats: dict):
        self.group = group
        self.rows = rows
        self.stats = stats


def _arrow_type(spark_type: dict | str):
    """Map a Spark schema-JSON type to an arrow type. Primitives, the
    two timestamp flavors, date, and arrays of primitives — the same
    surface the feed source's read path serves. Anything else raises
    at WRITER CREATION (never mid-stream)."""
    import pyarrow as pa

    if isinstance(spark_type, dict):
        if spark_type.get("type") == "array":
            return pa.list_(_arrow_type(spark_type["elementType"]))
        raise ValueError(
            f"versioned_table sink: unsupported column type {spark_type!r}"
        )
    scalars = {
        "byte": pa.int8(),
        "short": pa.int16(),
        "integer": pa.int32(),
        "long": pa.int64(),
        "float": pa.float32(),
        "double": pa.float64(),
        "string": pa.string(),
        "boolean": pa.bool_(),
        "binary": pa.binary(),
        "date": pa.date32(),
        # instant semantics: micros since epoch, marked UTC-adjusted so
        # Spark reads back TimestampType exactly
        "timestamp": pa.timestamp("us", tz="UTC"),
        # wall-clock semantics: no zone
        "timestamp_ntz": pa.timestamp("us"),
    }
    t = scalars.get(spark_type)
    if t is None:
        raise ValueError(
            f"versioned_table sink: unsupported column type {spark_type!r}"
        )
    return t


def _ts_to_micros(dt, wall_clock: bool) -> int | None:
    """datetime -> integer microseconds, integer-exact (float
    ``.timestamp()`` loses sub-microsecond precision at current
    epochs). Naive instants are in the worker's local zone — the same
    convention pyspark used to BUILD the Row value — and wall-clock
    (NTZ) values convert zone-free."""
    import calendar
    from datetime import datetime, timedelta, timezone

    if dt is None:
        return None
    if wall_clock:
        return (dt.replace(tzinfo=None) - datetime(1970, 1, 1)) // timedelta(
            microseconds=1
        )
    if dt.tzinfo is not None:
        return (dt - datetime(1970, 1, 1, tzinfo=timezone.utc)) // timedelta(
            microseconds=1
        )
    import time as _time

    return (
        int(_time.mktime(dt.timetuple())) * 1_000_000 + dt.microsecond
    )


class VersionedSinkWriter(DataSourceStreamWriter, DataSourceWriter):
    """Executor-side staging writer + driver-side committer. One class
    serves both the streaming sink (batchId-stamped commits) and the
    batch twin (un-stamped append / overwrite)."""

    def __init__(
        self,
        root: str,
        schema_json: str,
        mapping: dict,
        retired: list,
        stats_cols: list[str],
        overwrite: bool = False,
    ):
        self.root = root
        self.schema_json = schema_json
        self.mapping = mapping
        self.retired = retired
        self.stats_cols = stats_cols
        self.overwrite = overwrite

    # --- executor side (no package imports) ---------------------------

    def write(self, iterator: Iterator) -> SinkCommitMessage:
        import pyarrow as pa
        import pyarrow.compute as pc
        import pyarrow.parquet as pq

        fields = json.loads(self.schema_json)["fields"]
        rows = list(iterator)
        if not rows:
            return SinkCommitMessage(None, 0, {})
        names = [f["name"] for f in fields]
        arrays = []
        pa_fields = []
        for i, f in enumerate(fields):
            t = f["type"]
            at = _arrow_type(t)
            col = [r[i] for r in rows]
            if t == "timestamp" or t == "timestamp_ntz":
                col = [_ts_to_micros(v, t == "timestamp_ntz") for v in col]
                arr = pa.array(col, type=pa.int64()).cast(at)
            else:
                arr = pa.array(col, type=at)
            # staged files carry PHYSICAL names (column mapping)
            pa_fields.append(pa.field(self.mapping.get(f["name"], f["name"]), at))
            arrays.append(arr)
        table = pa.table(dict(zip([fl.name for fl in pa_fields], arrays)))
        group = uuid.uuid4().hex
        gdir = os.path.join(self.root, "data", group)
        os.makedirs(gdir, exist_ok=True)
        pq.write_table(table, os.path.join(gdir, "part-0.parquet"))
        stats: dict = {"__rows__": len(rows)}
        for c in self.stats_cols:
            i = names.index(c)
            mm = pc.min_max(arrays[i])
            lo, hi = mm["min"].as_py(), mm["max"].as_py()
            if lo is not None and hi is not None:
                if hasattr(lo, "isoformat"):  # temporal: manifest JSON
                    lo, hi = str(lo), str(hi)
                stats[c] = [lo, hi]
        return SinkCommitMessage(f"data/{group}", len(rows), stats)

    # --- driver side ---------------------------------------------------

    def _staged(self, messages: List[Optional[SinkCommitMessage]]):
        return [m for m in messages if m is not None and m.group]

    def commit(self, messages, batchId: int | None = None) -> None:
        from .versioned import VersionedTable

        staged = self._staged(messages)
        t = VersionedTable(self.root)
        if not staged:
            return  # empty batch: nothing lands, replay is naturally a no-op
        try:
            t.commit_staged(
                [m.group for m in staged],
                {m.group: m.stats for m in staged},
                self.schema_json,
                batch_id=batchId,
                write_mapping=self.mapping,
                write_retired=self.retired,
                overwrite=self.overwrite,
            )
        except Exception:
            self._cleanup(staged)
            raise

    def abort(self, messages, batchId: int | None = None) -> None:
        self._cleanup(self._staged(messages))

    def _cleanup(self, staged) -> None:
        for m in staged:
            shutil.rmtree(
                os.path.join(self.root, m.group), ignore_errors=True
            )


class VersionedSinkDataSource(DataSource):
    """spark.writeStream.format("versioned_table").option("path", root)."""

    @classmethod
    def name(cls) -> str:
        return FORMAT_NAME

    def _build_writer(self, schema, overwrite: bool) -> VersionedSinkWriter:
        from .versioned import VersionedTable

        root = self.options.get("path")
        if not root:
            raise ValueError(
                "versioned_table requires .option('path', <table root>)"
            )
        t = VersionedTable(root)
        if t.check_constraints() or t.generated_columns():
            raise ValueError(
                f"table {root} has CHECK constraints or generated columns; "
                "the versioned_table sink cannot evaluate SQL expressions "
                "(no SparkSession at commit time) — write via foreachBatch "
                "+ VersionedTable.append, which enforces them"
            )
        mapping, retired = ({}, [])
        if t.latest_version() is not None:
            mapping, retired = t._mapping_identity(t.latest_version())
        fields = json.loads(schema.json())["fields"]
        for f in fields:
            _arrow_type(f["type"])  # unsupported types fail at CREATION
        csv = self.options.get("statscols")
        if csv:
            stats_cols = [c.strip() for c in csv.split(",") if c.strip()]
            known = {f["name"] for f in fields}
            bad = [c for c in stats_cols if c not in known]
            if bad:
                raise ValueError(
                    f"statsCols {bad} not in the stream schema {sorted(known)}"
                )
        else:
            stats_cols = [
                f["name"]
                for f in fields
                if isinstance(f["type"], str)
                and f["type"] not in ("binary", "boolean")
            ]
        return VersionedSinkWriter(
            root, schema.json(), mapping, retired, stats_cols, overwrite
        )

    def streamWriter(self, schema, overwrite: bool) -> VersionedSinkWriter:
        return self._build_writer(schema, overwrite)

    def writer(self, schema, overwrite: bool) -> VersionedSinkWriter:
        return self._build_writer(schema, overwrite)


def register_table_sink(spark) -> None:
    """Idempotently register the sink format with a session."""
    spark.dataSource.register(VersionedSinkDataSource)
