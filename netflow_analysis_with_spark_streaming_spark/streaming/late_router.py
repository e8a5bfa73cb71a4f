"""Late-data dead-letter routing — the operational tap Structured
Streaming's watermark does not give you: rows later than the
watermark are silently DROPPED by stateful operators (the documented
contract), but a production pipeline wants them audited, reprocessed
or billed, not vanished. The reference pipeline (README.md:115-153)
had no late handling at all — every record was upserted whenever it
arrived, silently rewriting history.

``LateDataRouter`` is a foreachBatch target that splits each
micro-batch against a DURABLE event-time watermark and lands both
sides in versioned tables:

    on-time:  ts >= watermark(before this batch)
    late:     ts <  watermark           -> the dead-letter table

The watermark is ``max(event ts over all PRIOR batches) - delay`` —
the same definition Spark uses, recovered after a crash from a tiny
versioned bookkeeping table (one row per batch: the batch's max event
ts in integer microseconds). All three landings carry the batch id,
so replays are exactly-once end to end: a crash between the data
landing and the bookkeeping append replays the batch and every append
resolves to a no-op or completes the missing piece.

Scale: the split is one predicate over the batch (no shuffle); the
bookkeeping row is one tiny agg per batch. Integer-microsecond
comparisons keep the routing decision exact and engine-mirrorable
(no float time arithmetic)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..storage.versioned import VersionedTable


class LateDataRouter:
    def __init__(self, root: str, delay_us: int, ts_col: str = "ts") -> None:
        self.ontime = VersionedTable(root + "/ontime")
        self.late = VersionedTable(root + "/late")
        self._wm = VersionedTable(root + "/wm")
        self.delay_us = int(delay_us)
        self.ts_col = ts_col

    def watermark_us(self, spark: SparkSession) -> int | None:
        """max(prior batches' max event ts) - delay, in microseconds;
        None before any batch. Durable: read from the bookkeeping
        table, so a restarted router routes identically."""
        if not self._wm.versions():
            return None
        row = self._wm.read(spark).agg(F.max("max_ts_us").alias("m")).collect()[0]
        return None if row["m"] is None else int(row["m"]) - self.delay_us

    def process_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        if batch_id in self._wm.committed_batch_ids():
            return  # fully landed already (bookkeeping commits LAST)
        wm = self.watermark_us(spark)
        ts_us = F.unix_micros(F.col(self.ts_col))
        # NULL event times cannot be ordered against any watermark —
        # they route to the dead-letter table unconditionally (both
        # before and after the first watermark, so the rule is
        # arrival-independent). Leaving them to the comparison
        # predicates would satisfy NEITHER filter and silently drop
        # them — exactly the vanishing this component exists to stop.
        null_ts = F.col(self.ts_col).isNull()
        if wm is None:
            ontime = batch_df.filter(~null_ts)
            late = batch_df.filter(null_ts)
        else:
            ontime = batch_df.filter(ts_us >= F.lit(wm))
            late = batch_df.filter(null_ts | (ts_us < F.lit(wm)))
        # data first, bookkeeping last: a crash in between replays the
        # batch; the data appends are batch-id no-ops the second time
        self.ontime.append(ontime, batch_id=batch_id)
        self.late.append(late, batch_id=batch_id)
        row = batch_df.agg(F.max(ts_us).alias("m")).collect()[0]
        self._wm.append(
            spark.createDataFrame(
                [(batch_id, row["m"])], "batch_id long, max_ts_us long"
            ),
            batch_id=batch_id,
        )

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        self.process_batch(batch_df, batch_id)
