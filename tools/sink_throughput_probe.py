"""Staging throughput of the native ``versioned_table`` sink.

Measures the batch-twin write path end-to-end (Spark -> data-source
write worker -> staged parquet groups -> one commit) at N rows x 5
mixed columns, under a hostile (non-UTC) session zone so the
timestamp path is exercised honestly.

Round-11 context: the writer moved from ``DataSourceStreamWriter``
(row iterator — every value converted to a Python object per row by
Spark's write worker) to ``DataSourceStreamArrowWriter`` (arrow
RecordBatches straight off the transport; the staged cast is
metadata-only for timestamps). Measured on this sandbox (local[8],
2M rows, min of reps 1-2 after a warm-up rep):

    row-iterator writer : 8.24 s   (0.24 M rows/s)
    arrow-batch writer  : 1.09 s   (1.83 M rows/s)   ~7.5x

At 20M rows (same sandbox): 7.19 s = 2.78 M rows/s — per-row cost
improves as fixed costs amortize; memory stays O(flush).

Usage: python tools/sink_throughput_probe.py [n_rows]
"""

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "America/New_York")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from netflow_analysis_with_spark_streaming_spark.storage.stream_sink import (
        register_table_sink,
    )

    register_table_sink(spark)
    df = spark.sql(
        f"""
        SELECT id, cast(id % 1000 as int) k, uuid() s,
               timestamp_micros(1700000000000000 + id) ts,
               cast(id as double) / 7 v
        FROM range({n})
        """
    ).repartition(8).cache()
    df.count()
    root = "/tmp/netflow_sink_probe_tbl"
    for rep in range(3):
        shutil.rmtree(root, ignore_errors=True)
        t0 = time.time()
        df.write.format("versioned_table").option("path", root).mode(
            "append"
        ).save()
        dt = time.time() - t0
        print(
            f"rep{rep}: {dt:.2f}s  ({n / dt / 1e6:.2f} M rows/s)"
            + ("  (warm-up)" if rep == 0 else "")
        )
    shutil.rmtree(root, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
