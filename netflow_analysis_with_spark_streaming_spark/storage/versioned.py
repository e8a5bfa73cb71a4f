"""Versioned parquet tables: a dependency-free Delta-style table
format — manifest-log snapshots, time travel, copy-on-write upsert,
idempotent streaming commits.

The reference's store (Mongo upserted per record, README.md:132-153)
has no snapshot isolation, no history and no replay safety. Real
lakehouse formats (Delta/Iceberg/Hudi) solve this with an append-only
metadata log; this module implements the same core construction on
plain parquet + JSON, because the container ships no lakehouse jars:

- ``_log/{version:08d}.json`` manifests are immutable and list the
  COMPLETE data-file set visible at that version (copy-forward), so a
  reader of version N never sees a torn write: data files are written
  BEFORE the manifest, and the manifest appears atomically via
  os.rename. Single-writer by assumption (documented, like early
  Delta on non-S3 stores).
- time travel = read any old manifest; history() lists the log.
- ``upsert`` is copy-on-write MERGE: current snapshot anti-joined on
  the key, unioned with the updates, written as a new snapshot — all
  distributed DataFrame ops, nothing row-shaped on the driver.
- streaming exactly-once: each manifest records the foreachBatch
  ``batch_id`` that produced it; a replayed batch id is a no-op
  BEFORE any write (same idempotent-commit construction as
  streaming/sinks.IdempotentParquetSink, lifted to table semantics).

Scale notes: manifests list file paths, so the log grows with commit
count, not data size; compaction folds small files. At 100 TB you
would add file-level column stats for data skipping (Delta/Iceberg
do) — out of scope here, the snapshot/merge/replay semantics are the
point. Reads go through ``spark.read.parquet(*files)`` so all normal
pushdown applies within a snapshot.
"""

from __future__ import annotations

import json
import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


class VersionedTable:
    """A managed, versioned parquet table rooted at ``root``."""

    def __init__(self, root: str) -> None:
        self.root = root
        self._log = os.path.join(root, "_log")
        self._data = os.path.join(root, "data")
        os.makedirs(self._log, exist_ok=True)
        os.makedirs(self._data, exist_ok=True)

    # --- log plumbing ------------------------------------------------------

    def versions(self) -> list[int]:
        return sorted(
            int(f.split(".")[0]) for f in os.listdir(self._log) if f.endswith(".json")
        )

    def latest_version(self) -> int | None:
        vs = self.versions()
        return vs[-1] if vs else None

    def _manifest(self, version: int) -> dict:
        with open(os.path.join(self._log, f"{version:08d}.json"), encoding="utf-8") as f:
            return json.load(f)

    def history(self) -> list[dict]:
        return [
            {k: m.get(k) for k in ("version", "action", "batch_id", "n_files")}
            for m in (self._manifest(v) for v in self.versions())
        ]

    def committed_batch_ids(self) -> set[int]:
        return {
            m["batch_id"]
            for m in (self._manifest(v) for v in self.versions())
            if m.get("batch_id") is not None
        }

    def _commit(
        self,
        files: list[str],
        action: str,
        schema_json: str,
        batch_id: int | None = None,
    ) -> int:
        version = (self.latest_version() + 1) if self.versions() else 0
        manifest = {
            "version": version,
            "action": action,
            "files": sorted(files),
            "n_files": len(files),
            "schema": schema_json,
            "batch_id": batch_id,
        }
        tmp = os.path.join(self._log, f".tmp-{uuid.uuid4().hex}.json")
        with open(tmp, "w", encoding="utf-8") as f:
            json.dump(manifest, f)
        # rename = the atomic commit point; a crash before it leaves
        # only unreferenced data files (garbage, never torn reads)
        os.rename(tmp, os.path.join(self._log, f"{version:08d}.json"))
        return version

    def _write_files(self, df: DataFrame) -> list[str]:
        """Write df as a new immutable file group; return its paths
        relative to the table root."""
        group = uuid.uuid4().hex
        out = os.path.join(self._data, group)
        df.write.mode("overwrite").parquet(out)
        return [f"data/{group}"]

    # --- table operations --------------------------------------------------

    def append(self, df: DataFrame, batch_id: int | None = None) -> int:
        if batch_id is not None and batch_id in self.committed_batch_ids():
            return self.latest_version()  # replay: no-op before any write
        new = self._write_files(df)
        prev = self._manifest(self.latest_version())["files"] if self.versions() else []
        return self._commit(prev + new, "append", df.schema.json(), batch_id)

    def overwrite(self, df: DataFrame, batch_id: int | None = None) -> int:
        if batch_id is not None and batch_id in self.committed_batch_ids():
            return self.latest_version()
        new = self._write_files(df)
        return self._commit(new, "overwrite", df.schema.json(), batch_id)

    def read(self, spark: SparkSession, version: int | None = None) -> DataFrame:
        """The snapshot at ``version`` (default: latest). Old versions
        stay readable until vacuum() — that IS time travel."""
        if version is None:
            version = self.latest_version()
        if version is None:
            raise ValueError(f"table {self.root} has no committed version")
        m = self._manifest(version)
        if not m["files"]:
            schema = StructType.fromJson(json.loads(m["schema"]))
            return spark.createDataFrame([], schema)
        return spark.read.parquet(*[os.path.join(self.root, f) for f in m["files"]])

    def upsert(
        self,
        spark: SparkSession,
        updates: DataFrame,
        keys: list[str],
        batch_id: int | None = None,
    ) -> int:
        """Copy-on-write MERGE: rows matching ``keys`` are replaced,
        new keys appended. Updates with duplicate keys keep one
        arbitrary-but-deterministic row (max over remaining columns is
        NOT imposed — callers dedupe; streaming update-mode emissions
        are already one row per key per batch)."""
        if batch_id is not None and batch_id in self.committed_batch_ids():
            return self.latest_version()
        if self.versions():
            current = self.read(spark)
            merged = current.join(updates.select(*keys), keys, "left_anti").unionByName(
                updates
            )
        else:
            merged = updates
        new = self._write_files(merged)
        return self._commit(new, "upsert", merged.schema.json(), batch_id)

    def compact(self, spark: SparkSession, target_partitions: int = 8) -> int:
        """Fold the current snapshot's file groups into one coalesced
        group (the streaming small-file fix); history before the
        compaction stays readable."""
        df = self.read(spark).coalesce(target_partitions)
        new = self._write_files(df)
        return self._commit(new, "compact", df.schema.json())

    def vacuum(self, keep_last: int = 1) -> int:
        """Drop data files referenced ONLY by versions older than the
        last ``keep_last`` — bounds storage, forfeits time travel
        beyond the horizon. Returns number of file groups removed."""
        vs = self.versions()
        keep = set()
        for v in vs[-keep_last:]:
            keep.update(self._manifest(v)["files"])
        removed = 0
        for group in os.listdir(self._data):
            rel = f"data/{group}"
            if rel not in keep:
                shutil.rmtree(os.path.join(self._data, group), ignore_errors=True)
                removed += 1
        for v in vs[:-keep_last]:
            os.remove(os.path.join(self._log, f"{v:08d}.json"))
        return removed

    # --- streaming integration --------------------------------------------

    def streaming_upsert_sink(self, keys: list[str]):
        """foreachBatch callable: lands every micro-batch as an
        idempotent keyed upsert — replayed batch ids are no-ops, so
        the table is exactly-once end-to-end (T7 on table semantics).
        Use with update-mode stateful queries whose emissions are
        one-row-per-key-per-batch."""

        def sink(batch_df: DataFrame, batch_id: int) -> None:
            self.upsert(batch_df.sparkSession, batch_df, keys, batch_id=batch_id)

        return sink
