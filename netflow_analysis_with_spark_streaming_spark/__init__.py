"""PySpark-native network-flow / event analytics engine.

A from-scratch re-expression of the capabilities of the reference
RocketWill/Netflow-Analysis-with-Spark-Streaming (see SURVEY.md) as an
idiomatic Spark DataFrame / Structured Streaming engine:

- ``session``    — SparkSession factory tuned for large-scale batch + streaming
- ``schemas``    — the reference's record schemas (A-D) as ``StructType``
- ``tables``     — parquet loaders / view registration for the test star schema
- ``operators``  — batch operators: normalization, flagship access-trend,
                   relational completeness, dedup, similarity, text analysis
- ``sources``    — Kafka / streaming-file source builders
- ``streaming``  — Structured Streaming pipelines, watermarking, idempotent sinks
- ``functions``  — shared column-expression helpers
- ``plans``      — plan-inspection helpers used by tests and bench

Everything here is public-API Spark only; no custom Catalyst rules are
needed (SURVEY.md §4.2).
"""

__version__ = "0.1.0"
