"""kafka_streams_sandbox_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the capabilities of the reference repo
``productiveAnalytics/kafka-streams-sandbox`` (a Kafka Streams
stream->changelog-table sandbox, see SURVEY.md), built Spark-first:

- Layer A (reference semantics): stream->table upsert (latest-by-key),
  tombstone-emitting table filter, changelog sinks, interactively
  queryable materialized state — as Structured Streaming jobs
  (``streaming/ktable.py``).
- Layer B (driver-mandated extensions): a batch relational core
  (joins, aggs, windows, set ops, rollup), JSON/event semantics, and
  LLM-data-pipeline operators (dedup, similarity search, text
  analysis, multimodal plumbing) — as declarative DataFrame plans that
  Catalyst/Tungsten optimize (``operators/``).

Every operator is registered in ``registry.py`` together with an ANSI
SQL oracle (DuckDB-runnable) used by the correctness harness.
"""

from kafka_streams_sandbox_spark.session import configure, get_spark

__all__ = ["configure", "get_spark"]
