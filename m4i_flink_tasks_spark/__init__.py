"""m4i_flink_tasks_spark — a PySpark-native re-engine of the query and
data-processing capabilities of ``wombach/m4i-flink-tasks``.

The reference (see /root/reference, SURVEY.md) is a chain of four PyFlink
DataStream jobs doing Kafka-driven metadata CDC + denormalized graph-document
maintenance. This package re-expresses every operator in that pipeline —
plus the LLM-data-pipeline extensions (dedup, similarity search, multimodal
plumbing, text analysis) — as idiomatic Spark DataFrame / Structured
Streaming plans designed for 100 TB scale:

- ``schemas``    typed StructType envelopes + MapType payloads (SURVEY §1)
- ``operators``  diff kernels, as-of lookup, dedup, similarity, text (§2.3+)
- ``functions``  type-closure / hierarchy / classification helpers (§2.5)
- ``sources``    batch+stream source/sink plumbing, dead-letter split (§2.1)
- ``streaming``  the four pipelines as Structured Streaming jobs (§0)
- ``queries``    the driver-facing query inventory with DuckDB oracles
"""

__version__ = "0.1.0"
