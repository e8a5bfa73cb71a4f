"""Declarative data-quality EXPECTATIONS on streaming ingest — the
Delta Live Tables pattern (`@dlt.expect / expect_or_drop /
expect_or_fail`), re-expressed over this engine's versioned tables:
a pipeline declares named SQL predicates once, and every micro-batch
is gated, audited, and routed by them instead of each job hand-rolling
filters and counters. The reference pipeline (README.md:115-153)
upserted whatever arrived — no validation, no audit trail; this is
the quality gate a 100 TB training-data ingest needs at the table
boundary.

Semantics per expectation ``(name, predicate_sql, action)``:

- ``warn``  — violating rows still land; the violation count is
  recorded in the metrics table (observability without data loss).
- ``drop``  — violating rows are routed to the DEAD-LETTER table with
  the list of failed expectation names attached (auditable,
  reprocessable — never silently vanished).
- ``fail``  — any violation aborts the batch BEFORE anything lands
  (the strict-ingest contract; the stream stops with an actionable
  error).

Scale + exactly-once:

- One combined aggregation pass counts every expectation's violations
  (the same single-job discipline as the write gate's `_enforce`) —
  no per-expectation scans.
- The clean/dead-letter split is one predicate each over the batch —
  no shuffle.
- All three landings (destination, dead-letter, metrics) are
  batch-id-stamped appends to versioned tables, data first and
  metrics LAST, so a crash anywhere replays the batch and every
  append resolves to a no-op or completes the missing piece — the
  late_router discipline. Replayed batches are detected on the
  METRICS table (committed last = the batch fully landed).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..storage.versioned import VersionedTable

_ACTIONS = ("warn", "drop", "fail")


@dataclass(frozen=True)
class Expectation:
    name: str
    predicate_sql: str  # rows SATISFYING this are clean
    action: str = "warn"

    def __post_init__(self):
        if self.action not in _ACTIONS:
            raise ValueError(
                f"expectation {self.name!r}: action must be one of "
                f"{_ACTIONS}, got {self.action!r}"
            )


class ExpectationsSink:
    """foreachBatch target: gate each micro-batch through the declared
    expectations, land clean rows in ``root/dest``, dropped rows in
    ``root/dlq`` (with the failed-expectation names), and one metrics
    row per expectation per batch in ``root/metrics``."""

    def __init__(self, root: str, expectations: list[Expectation]) -> None:
        if not expectations:
            raise ValueError("declare at least one expectation")
        names = [e.name for e in expectations]
        if len(set(names)) != len(names):
            raise ValueError(f"duplicate expectation names: {names}")
        self.expectations = list(expectations)
        self.dest = VersionedTable(root + "/dest")
        self.dlq = VersionedTable(root + "/dlq")
        self.metrics = VersionedTable(root + "/metrics")

    def process_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        if batch_id in self.metrics.committed_batch_ids():
            return  # metrics commit LAST: present = batch fully landed
        clash = [
            c
            for c in batch_df.columns
            if c.startswith("__ok_") or c == "_failed_expectations"
        ]
        if clash:
            # the gate's working columns would silently shadow (or be
            # shadowed by) same-named data columns — refuse loudly
            raise ValueError(
                f"batch columns {clash} collide with the expectations "
                "gate's reserved names (__ok_* / _failed_expectations); "
                "rename them upstream"
            )
        flags = [
            F.coalesce(F.expr(e.predicate_sql), F.lit(False)).alias(
                f"__ok_{e.name}"
            )
            for e in self.expectations
        ]
        # persist the flagged batch: the count pass plus up to two
        # landings (dest, DLQ) would otherwise recompute the
        # micro-batch source 3x; MEMORY_AND_DISK spills instead of
        # OOMing on a fat batch, and the unpersist below bounds the
        # footprint to one batch
        from pyspark import StorageLevel

        flagged = batch_df.select("*", *flags).persist(
            StorageLevel.MEMORY_AND_DISK
        )
        try:
            self._gate_and_land(spark, flagged, batch_df.columns, batch_id)
        finally:
            flagged.unpersist()

    def _gate_and_land(
        self, spark, flagged: DataFrame, data_cols: list, batch_id: int
    ) -> None:
        # ONE aggregation pass for every expectation's violation count
        counts_row = flagged.agg(
            F.count(F.lit(1)).alias("__n"),
            *[
                F.sum(
                    (~F.col(f"__ok_{e.name}")).cast("long")
                ).alias(f"__viol_{e.name}")
                for e in self.expectations
            ],
        ).collect()[0]
        n_in = int(counts_row["__n"])
        violations = {
            e.name: int(counts_row[f"__viol_{e.name}"])
            for e in self.expectations
        }
        hard_failures = [
            e.name
            for e in self.expectations
            if e.action == "fail" and violations[e.name] > 0
        ]
        if hard_failures:
            # abort BEFORE anything lands: strict expectations gate the
            # whole batch (the stream surfaces this as a query failure)
            raise ValueError(
                f"batch {batch_id}: expectation(s) {hard_failures} "
                f"violated ({ {k: violations[k] for k in hard_failures} } "
                "rows) — fail action aborts the batch"
            )
        drop_names = [e.name for e in self.expectations if e.action == "drop"]
        if drop_names:
            keep_pred = None
            for name in drop_names:
                ok = F.col(f"__ok_{name}")
                keep_pred = ok if keep_pred is None else (keep_pred & ok)
            failed_list = F.filter(
                F.array(
                    *[
                        F.when(
                            ~F.col(f"__ok_{name}"), F.lit(name)
                        ).otherwise(F.lit(None))
                        for name in drop_names
                    ]
                ),
                lambda x: x.isNotNull(),
            )
            clean = flagged.filter(keep_pred).select(*data_cols)
            dead = (
                flagged.filter(~keep_pred)
                .select(
                    *data_cols,
                    F.concat_ws(",", failed_list).alias(
                        "_failed_expectations"
                    ),
                )
            )
            # the two DATA landings are independent (different tables,
            # both before the metrics fence) — overlap them so the
            # second write job back-fills the first's task tail
            # instead of queuing behind it (round 15, guide §2.6;
            # each append stays batch-id idempotent, so a failure of
            # either surfaces and the replay re-resolves both)
            from concurrent.futures import ThreadPoolExecutor

            with ThreadPoolExecutor(max_workers=2) as pool:
                f_dlq = pool.submit(self.dlq.append, dead, batch_id=batch_id)
                f_dest = pool.submit(
                    self.dest.append, clean, batch_id=batch_id
                )
                f_dlq.result()
                f_dest.result()
        else:
            clean = flagged.select(*data_cols)
            # data first, metrics LAST (the replay detector)
            self.dest.append(clean, batch_id=batch_id)
        metrics_rows = [
            (
                int(batch_id),
                e.name,
                e.action,
                n_in,
                violations[e.name],
            )
            for e in self.expectations
        ]
        # driver-local landing (round 15): the metrics frame is
        # len(expectations) rows BY CONSTRUCTION — append_rows writes
        # the parquet bytes driver-side and commits pure metadata,
        # zero Spark jobs, replacing the one-task parallelize job the
        # round-14 version still paid per batch
        from pyspark.sql.types import (
            LongType,
            StringType,
            StructField,
            StructType,
        )

        self.metrics.append_rows(
            metrics_rows,
            StructType(
                [
                    StructField("batch_id", LongType()),
                    StructField("expectation", StringType()),
                    StructField("action", StringType()),
                    StructField("rows_in", LongType()),
                    StructField("violations", LongType()),
                ]
            ),
            batch_id=batch_id,
        )

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        self.process_batch(batch_df, batch_id)
