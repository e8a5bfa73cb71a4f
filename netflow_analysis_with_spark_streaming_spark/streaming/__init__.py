"""Structured Streaming layer (SURVEY.md §2.1/2.2/2.6, build plan §7.4).

- sources.py: file JSON/parquet streaming sources (S2) and Kafka
  source/sink option builders (S1/S6/K2 — config is testable without
  a broker; the broker-side integration needs a live Kafka).
- sinks.py: checkpointed idempotent foreachBatch parquet sink (the
  K1/K3 replacement with exactly-once semantics, T7) and memory-sink
  test helpers.
- jobs.py: the two reference pipelines re-expressed as streaming jobs
  (Path-1 normalize, Path-2 flatten) plus watermarked tumbling-window
  aggregation (A2/T5) and streaming dedup (T6).
"""
