"""PySpark-native network-flow / event analytics engine.

A from-scratch re-expression of the capabilities of the reference
RocketWill/Netflow-Analysis-with-Spark-Streaming (see SURVEY.md) as an
idiomatic Spark DataFrame / Structured Streaming engine:

- ``session``    — SparkSession factory tuned for large-scale batch + streaming
- ``schemas``    — the reference's record schemas (A-D) as ``StructType``
- ``tables``     — parquet loaders / view registration for the test star schema
- ``operators``  — batch operators: access-trend, JSON normalize, nested flatten
- ``queries_*``  — the registered corpus: relational completeness, reference
                   parity, LLM-pipeline extensions, streaming entries
- ``streaming``  — sources, exactly-once sinks, windowed/stateful jobs
- ``functions``  — text/vector/multimodal/udf column helpers
- ``plans``      — physical layout (day partitioning, bucketing) + plan asserts

Everything here is public-API Spark only; no custom Catalyst rules are
needed (SURVEY.md §4.2).
"""

__version__ = "0.1.0"
