"""Layer A: the reference topology as Structured Streaming.

Reference dataflow (KStreamsToKTable.java buildTopology(), :66-107):

    stream(input)                          A1  -> sources/replay.py | sources/kafka.py
      ├── .to(streams-output)             A6  -> raw passthrough sink
      └── .toTable(materialized)          A2  -> latest_by_key_stream (update-mode agg)
            ├── .mapValues(peek)          A3  -> peek() console tap
            ├── interactive queries       A9  -> memory-sink view + watch()
            └── .filter(k ==ic v)         A4  -> ktable_filter (tombstone-emitting)
                  ├── .toStream().to(...) A7/A8 -> changelog sinks
                  └── materialized store      -> ParquetKTableStore (foreachBatch upsert/delete)

Semantics carried over exactly:
- toTable = upsert by key, later records win (A2): streaming max_by
  aggregation keyed on the record key — Spark keeps one row of state
  per key (RocksDB provider at scale), the direct analog of the
  reference's keyed state store.
- KTable.filter emits *tombstones* for keys whose latest value fails
  the predicate (A4, KStreamsToKTable.java:87-98): rows are flagged
  is_delete rather than dropped, and the store MERGE deletes them —
  Spark sinks have no native retraction, so this is the one custom
  piece (SURVEY.md §4.2), implemented as foreachBatch merge into a
  parquet store (Delta MERGE WHEN MATCHED DELETE in production).
- Interactive queries (A9, :152-167, :205-210): complete-mode memory
  sink registers a queryable view; watch() full-scans it on a cadence
  like the reference's 10 s watcher thread.

Scale notes: state is hash-partitioned by key across executors
(shuffle on groupBy key) — the 3-partition topic of the reference
generalizes to spark.sql.shuffle.partitions. The parquet store swap
is per-microbatch and atomic via directory rename.
"""

from __future__ import annotations

import os
import shutil
import tempfile
import time
import uuid
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_streams_sandbox_spark.registry import query
from kafka_streams_sandbox_spark.sources.replay import (
    events_as_kafka_records,
    events_stream,
)

EVENT_COLS = ("event_id", "ts", "event_type", "value")


def latest_by_key_stream(
    events: DataFrame,
    key: str = "user_id",
    ts: str = "ts",
    tiebreak: str = "event_id",
    payload: tuple[str, ...] = EVENT_COLS,
) -> DataFrame:
    """A2 — KStream.toTable: continuously-updated latest row per key.

    max_by over a (ts, tiebreak) ordering struct = one state row per
    key, updated in place; identical result to the batch
    latest_per_key (operators/semantic.py) — the stream-table duality
    the reference demonstrates, pinned by tests/test_streaming.py.
    """
    ord_struct = F.struct(F.col(ts), F.col(tiebreak))
    return (
        events.groupBy(key)
        .agg(F.max_by(F.struct(*payload), ord_struct).alias("latest"))
        .select(key, *[F.col(f"latest.{c}").alias(c) for c in payload])
    )


def ktable_filter(ktable: DataFrame, predicate) -> DataFrame:
    """A4 — KTable.filter with tombstone emission: every key stays in
    the changelog, flagged ``is_delete`` when its *latest* row fails
    the predicate (filter-after-upsert; pushing it below the
    aggregation would be wrong — SURVEY.md §4.1)."""
    return ktable.withColumn("is_delete", ~predicate)


def key_eq_value_predicate(k: str = "k", v: str = "v"):
    """The reference's only predicate: case-insensitive key == value
    (KStreamsToKTable.java:89, null-safe on key)."""
    return F.col(k).isNotNull() & (F.lower(F.col(k)) == F.lower(F.col(v)))


def peek(df: DataFrame, tag: str = "KTABLE-WATCH") -> DataFrame:
    """A3 — mapValues debug tap (KStreamsToKTable.java:85): a
    console-printing foreachBatch observer; no-op on the data path."""
    def _show(batch: DataFrame, batch_id: int) -> None:
        print(f"[{tag}] batch={batch_id} rows={batch.count()}")

    df.writeStream.outputMode("update").foreachBatch(_show)
    return df


class ParquetKTableStore:
    """Materialized, point-queryable KTable state (A2/A4 stores +
    tombstone propagation, the custom piece of Layer A).

    foreachBatch merges each micro-batch of changelog rows
    (key, payload..., is_delete) into a parquet directory:
    upsert latest-per-key, then delete tombstoned keys — the
    Delta ``MERGE WHEN MATCHED AND src.is_delete THEN DELETE``
    pattern on plain parquet. Swap is atomic via rename so readers
    never see a half-written store.
    """

    def __init__(self, spark: SparkSession, path: str, key: str = "user_id"):
        self.spark = spark
        self.path = path
        self.key = key

    def read(self) -> DataFrame | None:
        if not os.path.exists(self.path):
            return None
        return self.spark.read.parquet(self.path)

    def merge_batch(self, batch: DataFrame, batch_id: int) -> None:
        from kafka_streams_sandbox_spark.operators.semantic import latest_per_key

        existing = self.read()
        if "__batch" not in batch.columns:
            batch = batch.withColumn("__batch", F.lit(batch_id))
        combined = (
            existing.unionByName(batch) if existing is not None else batch
        )
        merged = latest_per_key(
            combined, key=self.key, ts="__batch", tiebreak="__batch"
        )
        survivors = merged.filter(~F.col("is_delete"))
        tmp = f"{self.path}.tmp-{uuid.uuid4().hex[:8]}"
        survivors.write.mode("overwrite").parquet(tmp)
        old = f"{self.path}.old-{uuid.uuid4().hex[:8]}"
        if os.path.exists(self.path):
            os.rename(self.path, old)
        os.rename(tmp, self.path)
        if os.path.exists(old):
            shutil.rmtree(old, ignore_errors=True)

    def foreach_batch(self) -> Callable[[DataFrame, int], None]:
        return self.merge_batch


def watch(
    spark: SparkSession,
    view: str,
    interval_s: float = 10.0,
    iterations: int = 3,
    sink: Callable[[list], None] | None = None,
) -> list[list]:
    """A9 — the reference's state watcher (KStreamsToKTable.java:152-167):
    full-scan the materialized view every ``interval_s``; returns the
    snapshots. The reference runs 10 s cadence for an hour; tests run
    a few fast iterations."""
    snapshots = []
    for i in range(iterations):
        rows = spark.sql(f"SELECT * FROM {view}").collect()
        snapshots.append(rows)
        (sink or (lambda r: print(f"[WATCH {view}] {len(r)} keys")))(rows)
        if i + 1 < iterations:
            time.sleep(interval_s)
    return snapshots


# ---------------------------------------------------------------------------
# Runnable pipelines (registered rows-only: streaming ≠ SQL-expressible)
# ---------------------------------------------------------------------------
def _run_to_memory(df: DataFrame, mode: str) -> str:
    """Run a streaming DF availableNow into a memory-sink view."""
    name = f"ktable_{uuid.uuid4().hex[:8]}"
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .option("checkpointLocation", tempfile.mkdtemp(prefix="kss-ckpt-"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return name


@query("a01_stream_passthrough")  # rows-only (A1 + A6)
def a01_stream_passthrough(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1 source -> A6 raw sink: replay events as Kafka-shaped records
    through a file stream into an append parquet sink, read back."""
    out = tempfile.mkdtemp(prefix="kss-passthrough-")
    records = events_as_kafka_records(spark, sf_dir).drop("event_id")
    q = (
        records.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", tempfile.mkdtemp(prefix="kss-ckpt-"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.read.parquet(out)


@query("a02_stream_table_latest")  # rows-only (A2 + A5 + A9)
def a02_stream_table_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2 stream->table: streaming latest-by-key, materialized as a
    queryable memory view (A9). Equals batch b17 (duality test)."""
    tbl = latest_by_key_stream(events_stream(spark, sf_dir))
    view = _run_to_memory(tbl, "complete")
    return spark.table(view)


@query("a04_stream_filtered_table")  # rows-only (A4 changelog w/ tombstones)
def a04_stream_filtered_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4 tombstone-emitting table filter on the live table: latest row
    per user with derived k/v digits (b18's predicate) + is_delete
    flag — the full changelog a downstream store MERGEs."""
    tbl = latest_by_key_stream(events_stream(spark, sf_dir))
    keyed = tbl.select(
        "user_id",
        "event_id",
        "event_type",
        (F.col("user_id") % 3).cast("string").alias("k"),
        (F.floor("value").cast("bigint") % 3).cast("string").alias("v"),
    )
    filtered = ktable_filter(keyed, key_eq_value_predicate())
    view = _run_to_memory(filtered, "complete")
    return spark.table(view)


@query("a08_stream_tombstone_store")  # rows-only (A8: store w/ deletes)
def a08_stream_tombstone_store(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A8 end-to-end tombstone propagation: changelog (with deletes
    for keys whose latest event is an 'error' — the stand-in for the
    reference's null-value tombstone) MERGEd into a parquet store via
    foreachBatch; returns the surviving store."""
    tbl = latest_by_key_stream(events_stream(spark, sf_dir))
    changelog = tbl.withColumn("is_delete", F.col("event_type") == "error")
    store = ParquetKTableStore(
        spark, tempfile.mkdtemp(prefix="kss-store-") + "/store"
    )
    q = (
        changelog.writeStream.foreachBatch(store.foreach_batch())
        .outputMode("update")
        .option("checkpointLocation", tempfile.mkdtemp(prefix="kss-ckpt-"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    result = store.read()
    assert result is not None
    return result.drop("__batch")
