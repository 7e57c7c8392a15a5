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

# Ship this package's worker-executed Python (pandas UDFs, stateful
# group functions, mapInPandas kernels) BY VALUE inside the pickled
# command instead of by module reference: executors on a real cluster
# (or any driver whose Python workers don't share our sys.path) have no
# import path for this package unless it is pip-installed or shipped via
# --py-files. By-value pickling removes that deploy-time coupling — the
# registry check walks up parent packages, so registering the top-level
# package covers every submodule.
try:
    import sys as _sys

    from pyspark import cloudpickle as _cloudpickle

    _cloudpickle.register_pickle_by_value(_sys.modules[__name__])
except Exception:  # pragma: no cover - pyspark always present in-container
    pass
