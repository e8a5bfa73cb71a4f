"""Streaming sinks: exactly-once foreachBatch table sink + Kafka sink.

Reference provenance and the bugs being fixed:
- K1 (README.md:132-153): per-partition Mongo client doing
  `insert_one` per record — at-least-once, duplicates on retry.
- K2 (README.md:161-181): Kafka producer that `collect()`s the whole
  RDD to the driver — acknowledged broken on a cluster
  (README.md:182).
- K3 (README.md:290-296): per-ROW client open/insert/close.
- T7: no checkpointing anywhere in the reference.

Replacement: ``foreachBatch`` writing parquet with a batch-id commit
log. Structured Streaming replays a batch with the SAME batch_id after
failure; the sink skips already-committed ids, so the table is
exactly-once even though the sink itself is at-least-once — the
standard idempotent-sink construction. The Kafka sink is distributed
(`df.write.format('kafka')` from inside foreachBatch or
`writeStream.format('kafka')`), eliminating the driver collect.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame


class IdempotentParquetSink:
    """Exactly-once batch sink: parquet appends guarded by a batch-id
    commit log.

    Layout: ``<root>/data/batch_id=<id>/*.parquet`` plus an empty
    commit marker ``<root>/_commits/<id>``. A replayed batch id is a
    no-op BEFORE any write, and the partition-dir-per-batch layout
    means a crash between write and commit leaves an uncommitted dir
    that the reader filters out via the commit log — no partial-batch
    reads, no duplicates.

    Scale: the marker is one empty file per micro-batch (not per row);
    data writes are distributed parquet appends; nothing touches the
    driver except the marker creation.
    """

    def __init__(self, root: str) -> None:
        self.root = root
        self._data = os.path.join(root, "data")
        self._commits = os.path.join(root, "_commits")
        os.makedirs(self._data, exist_ok=True)
        os.makedirs(self._commits, exist_ok=True)

    def committed_ids(self) -> set[int]:
        return {int(f) for f in os.listdir(self._commits)}

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        marker = os.path.join(self._commits, str(batch_id))
        if os.path.exists(marker):  # replay of a committed batch: no-op
            return
        out = os.path.join(self._data, f"batch_id={batch_id}")
        batch_df.write.mode("overwrite").parquet(out)
        with open(marker, "w", encoding="utf-8"):
            pass

    def read(self, spark) -> DataFrame:
        """Committed rows only (uncommitted partial dirs excluded)."""
        ids = self.committed_ids()
        if not ids:
            return spark.createDataFrame([], "dummy string").limit(0)
        paths = [os.path.join(self._data, f"batch_id={i}") for i in sorted(ids)]
        return spark.read.parquet(*paths)

    def compact(self, spark, target_partitions: int = 8) -> None:
        """Merge committed per-batch dirs into one compacted batch.

        A dir-per-micro-batch layout accumulates small files (10 s
        triggers = 8640 dirs/day — the classic streaming small-file
        problem). Compaction rewrites all committed rows as a single
        coalesced batch dir and re-points the commit log atomically-
        enough for a single-writer sink: the compacted dir is written
        and committed BEFORE old markers are removed, so a crash
        mid-compaction leaves duplicates visible to `read` (detectable
        by the marker overlap) rather than data loss, and a re-run
        completes the swap.
        """
        ids = self.committed_ids()
        if len(ids) <= 1:
            return
        compact_id = max(ids) + 1
        out = os.path.join(self._data, f"batch_id={compact_id}")
        self.read(spark).coalesce(target_partitions).write.mode("overwrite").parquet(out)
        with open(os.path.join(self._commits, str(compact_id)), "w", encoding="utf-8"):
            pass
        for i in ids:
            os.remove(os.path.join(self._commits, str(i)))
        # old data dirs are dead (no marker); prune opportunistically
        import shutil

        for i in ids:
            shutil.rmtree(os.path.join(self._data, f"batch_id={i}"), ignore_errors=True)


def kafka_sink_options(brokers: str, topic: str) -> dict[str, str]:
    """K2 replacement options for `writeStream.format('kafka')` — the
    producer runs on executors (distributed), not the driver."""
    return {"kafka.bootstrap.servers": brokers, "topic": topic}


def to_kafka_records(df: DataFrame, key_col: str | None = None) -> DataFrame:
    """Shape a DataFrame for the Kafka sink: value = JSON of all
    columns (and optional key). Mirrors the reference's re-publish of
    normalized records (README.md:170) without the driver collect."""
    from pyspark.sql import functions as F

    cols = [F.to_json(F.struct(*df.columns)).alias("value")]
    if key_col is not None:
        cols.insert(0, F.col(key_col).cast("string").alias("key"))
    return df.select(*cols)
