"""Layer A streaming semantics — including the reference's core
invariant: stream-table duality (the streaming latest-by-key table
equals the batch window-rank form)."""

from __future__ import annotations

from pyspark.sql import functions as F

from kafka_streams_sandbox_spark.catalog import normalize_event_ts
from kafka_streams_sandbox_spark.registry import all_queries
from kafka_streams_sandbox_spark.streaming.ktable import ParquetKTableStore


def _sorted_rows(df, cols):
    return sorted(df.select(*cols).collect(), key=lambda r: tuple(str(x) for x in r))


def test_stream_table_duality(spark, sf_dir):
    """A2 streaming toTable == B17 batch latest-per-key (SURVEY §5.2)."""
    qs = all_queries()
    streamed = qs["a02_stream_table_latest"](spark, sf_dir)
    batch = qs["b17_latest_per_user"](spark, sf_dir)
    cols = ["user_id", "event_id", "ts", "event_type", "value"]
    assert _sorted_rows(streamed, cols) == _sorted_rows(batch, cols)


def test_filtered_table_matches_batch_filter(spark, sf_dir):
    """A4 streaming filter-after-upsert == B18 batch form; non-matching
    keys are present but tombstoned (is_delete), matching KTable
    filter semantics (emit tombstone, don't silently drop)."""
    qs = all_queries()
    streamed = qs["a04_stream_filtered_table"](spark, sf_dir)
    batch = qs["b18_table_filter_key_eq_value"](spark, sf_dir)
    survivors = streamed.filter(~F.col("is_delete"))
    cols = ["user_id", "event_id", "event_type", "k", "v"]
    assert _sorted_rows(survivors, cols) == _sorted_rows(batch, cols)
    # every key appears exactly once in the changelog (it's a table)
    n_keys = streamed.select("user_id").distinct().count()
    assert streamed.count() == n_keys


def test_tombstone_store_deletes_error_keys(spark, sf_dir):
    """A8: keys whose latest event is an error are deleted from the
    materialized store; all others hold their latest row."""
    qs = all_queries()
    store = qs["a08_stream_tombstone_store"](spark, sf_dir)
    latest = qs["b17_latest_per_user"](spark, sf_dir)
    expected = latest.filter(F.col("event_type") != "error")
    assert store.count() == expected.count()
    assert (
        _sorted_rows(store, ["user_id", "event_id"])
        == _sorted_rows(expected, ["user_id", "event_id"])
    )


def test_store_merge_upsert_and_delete(spark, tmp_path):
    """ParquetKTableStore unit semantics across two batches: upsert
    then tombstone-delete (the KTable changelog contract)."""
    store = ParquetKTableStore(spark, str(tmp_path / "store"), key="k")
    b1 = spark.createDataFrame(
        [("a", 1, False), ("b", 2, False)], "k string, v int, is_delete boolean"
    )
    store.merge_batch(b1, 0)
    assert {r.k: r.v for r in store.read().collect()} == {"a": 1, "b": 2}
    b2 = spark.createDataFrame(
        [("a", 9, False), ("b", 0, True), ("c", 3, False)],
        "k string, v int, is_delete boolean",
    )
    store.merge_batch(b2, 1)
    assert {r.k: r.v for r in store.read().collect()} == {"a": 9, "c": 3}


def test_store_restart_upserts_win_over_persisted_rows(spark, tmp_path):
    """A new app run's micro-batch ids restart at 0 (StreamsApp builds
    a fresh checkpoint per start), so the store's upsert order must
    NOT be the raw Spark batch id: a persisted row from run 1 batch 2
    would outrank run 2 batch 0 and the restart's writes would be
    silently discarded. The store re-bases its ordering stamp from the
    persisted version watermark on first merge."""
    root = str(tmp_path / "store")
    run1 = ParquetKTableStore(spark, root, key="k")
    run1.merge_batch(_store_batch(spark, [("a", 1, False)]), 0)
    run1.merge_batch(_store_batch(spark, [("a", 2, False)]), 1)
    assert {r.k: r.v for r in run1.read().collect()} == {"a": 2}
    # simulate restart: fresh store object over the same path, fresh
    # batch ids starting at 0
    run2 = ParquetKTableStore(spark, root, key="k")
    run2.merge_batch(_store_batch(spark, [("a", 7, False)]), 0)
    assert {r.k: r.v for r in run2.read().collect()} == {"a": 7}
    run2.merge_batch(_store_batch(spark, [("a", 0, True)]), 1)
    assert run2.read().count() == 0  # restart tombstone also wins


def test_running_stats_tiebreak_matches_batch_latest(spark, tmp_path):
    """a21's latest-event pick must use (ts, event_id) lexicographic
    order like b17 — on an exact event-time collision the higher
    event_id wins, not the first-arriving row."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from kafka_streams_sandbox_spark.streaming.windows import (
        running_stats_stream,
    )
    from kafka_streams_sandbox_spark.sources.replay import events_stream

    t = pa.table(
        {
            "event_id": pa.array([10, 11, 12], pa.int64()),
            "ts": pa.array(
                [1_700_000_000_000_000] * 2 + [1_600_000_000_000_000],
                pa.timestamp("us"),
            ),  # 10 and 11 collide on the MAX ts; 12 is older
            "user_id": pa.array([1, 1, 1], pa.int64()),
            "event_type": pa.array(["first", "second", "old"], pa.string()),
            "value": pa.array([1.0, 2.0, 3.0], pa.float64()),
            "props": pa.array(["{}", "{}", "{}"], pa.string()),
        }
    )
    pq.write_table(t, str(tmp_path / "events.parquet"))
    out = running_stats_stream(events_stream(spark, str(tmp_path)))
    from kafka_streams_sandbox_spark.streaming.windows import run_to_memory

    view = run_to_memory(out, "update")
    rows = spark.table(view).collect()
    assert len(rows) == 1
    assert rows[0]["n_events"] == 3
    assert rows[0]["last_event_type"] == "second"  # id 11 beats id 10


def test_passthrough_preserves_every_record(spark, sf_dir):
    """A6: the raw sink is append-only passthrough — no upsert."""
    qs = all_queries()
    out = qs["a01_stream_passthrough"](spark, sf_dir)
    n_events = spark.read.parquet(f"{sf_dir}/events.parquet").count()
    assert out.count() == n_events
    assert set(out.columns) == {"key", "value", "timestamp"}


def test_tumbling_window_duality(spark, sf_dir):
    """A19 streaming watermarked tumbling agg == B19 batch windows."""
    qs = all_queries()
    streamed = qs["a19_stream_tumbling_window"](spark, sf_dir)
    batch = qs["b19_tumbling_window_agg"](spark, sf_dir)
    cols = ["window_start", "event_type", "n_events", "sum_value"]
    assert _sorted_rows(streamed, cols) == _sorted_rows(batch, cols)


def test_session_window_duality(spark, sf_dir):
    """A20 native session_window == B20 lag/cumsum sessionization on
    session starts and sizes (the native form's session_end is
    last-event + gap; the batch form records last-event itself)."""
    qs = all_queries()
    streamed = qs["a20_stream_session_window"](spark, sf_dir)
    batch = qs["b20_sessionization"](spark, sf_dir)
    cols = ["user_id", "session_start", "n_events"]
    assert _sorted_rows(streamed, cols) == _sorted_rows(batch, cols)


def test_running_stats_matches_batch(spark, sf_dir):
    """A21 applyInPandasWithState running stats == batch groupBy."""
    qs = all_queries()
    streamed = qs["a21_stream_running_stats"](spark, sf_dir)
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    batch = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("n_events"))
    cols = ["user_id", "n_events"]
    assert _sorted_rows(streamed, cols) == _sorted_rows(batch, cols)
    latest = qs["b17_latest_per_user"](spark, sf_dir).select(
        "user_id", F.col("event_type").alias("last_event_type")
    )
    assert _sorted_rows(
        streamed.select("user_id", "last_event_type"), ["user_id", "last_event_type"]
    ) == _sorted_rows(latest, ["user_id", "last_event_type"])


def test_stream_static_join_matches_batch(spark, sf_dir):
    """A22 stream-static broadcast join == the same join in batch."""
    qs = all_queries()
    streamed = qs["a22_stream_static_join"](spark, sf_dir)
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet").selectExpr(
        "c_custkey AS user_id", "c_name", "c_mktsegment"
    )
    batch = ev.join(cust, "user_id", "left").select(
        "event_id", "user_id", "event_type", "c_name", "c_mktsegment"
    )
    cols = ["event_id", "user_id", "event_type", "c_name", "c_mktsegment"]
    assert _sorted_rows(streamed, cols) == _sorted_rows(batch, cols)


def test_stream_stream_join_matches_batch(spark, sf_dir):
    """A23 watermarked interval join == the same join in batch."""
    qs = all_queries()
    streamed = qs["a23_stream_stream_join"](spark, sf_dir)
    raw = normalize_event_ts(spark.read.parquet(f"{sf_dir}/events.parquet"))
    p = raw.filter(F.col("event_type") == "purchase").selectExpr(
        "user_id AS p_user", "event_id AS purchase_id", "ts AS p_ts"
    )
    c = raw.filter(F.col("event_type") == "click").selectExpr(
        "user_id AS c_user", "event_id AS click_id", "ts AS c_ts"
    )
    batch = p.join(
        c,
        (F.col("p_user") == F.col("c_user"))
        & (F.col("c_ts") <= F.col("p_ts"))
        & (F.col("c_ts") >= F.col("p_ts") - F.expr("INTERVAL 1 HOUR")),
    ).selectExpr(
        "purchase_id", "p_user AS user_id", "p_ts AS purchase_ts",
        "click_id", "c_ts AS click_ts",
    )
    cols = ["purchase_id", "user_id", "purchase_ts", "click_id", "click_ts"]
    assert _sorted_rows(streamed, cols) == _sorted_rows(batch, cols)


def test_multi_batch_store_merge_equals_batch(spark, sf_dir, tmp_path):
    """KTable upsert semantics across MANY micro-batches: split events
    into 4 files, force one file per trigger, MERGE each batch into
    the parquet store — the final store must equal the single-shot
    batch latest-per-key (B17). This exercises cross-batch overwrite
    ordering, which the single-file availableNow replay never does."""
    from kafka_streams_sandbox_spark.streaming.ktable import (
        ParquetKTableStore,
        latest_by_key_stream,
    )
    from kafka_streams_sandbox_spark.catalog import normalize_event_ts
    from kafka_streams_sandbox_spark.sources.replay import _events_raw_schema

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    src = str(tmp_path / "src")
    # deterministic 4-way split ordered by event_id so later files hold
    # later events (the realistic arrival order)
    ev.withColumn("part", F.col("event_id") % 4).write.partitionBy(
        "part"
    ).parquet(src)
    stream = normalize_event_ts(
        spark.readStream.schema(_events_raw_schema(spark, sf_dir))
        .option("maxFilesPerTrigger", 1)
        .format("parquet")
        .load(src + "/part=*")
    )
    tbl = latest_by_key_stream(stream).withColumn("is_delete", F.lit(False))
    store = ParquetKTableStore(spark, str(tmp_path / "store"), key="user_id")
    q = (
        tbl.writeStream.foreachBatch(store.foreach_batch())
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = store.read().drop("__batch")
    expected = (
        normalize_event_ts(spark.read.parquet(f"{sf_dir}/events.parquet"))
    )
    from kafka_streams_sandbox_spark.operators.semantic import latest_per_key

    exp = latest_per_key(expected)
    cols = ["user_id", "event_id"]
    assert _sorted_rows(got, cols) == _sorted_rows(exp, cols)


def test_checkpoint_recovery_exactly_once(spark, tmp_path):
    """Exactly-once append sink across a restart: run to completion,
    add more input, restart from the SAME checkpoint — previously
    processed files must not be re-emitted."""
    src = tmp_path / "src"
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    src.mkdir()

    def write_file(name, start, n):
        spark.range(start, start + n).toDF("v").coalesce(1).write.mode(
            "overwrite"
        ).parquet(str(src / name))

    def run():
        stream = (
            spark.readStream.schema("v long")
            .format("parquet")
            .load(str(src) + "/*")
        )
        q = (
            stream.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    write_file("f1", 0, 100)
    run()
    assert spark.read.parquet(out).count() == 100
    write_file("f2", 100, 50)
    run()
    got = spark.read.parquet(out)
    assert got.count() == 150  # no re-emission of f1
    assert got.agg(F.countDistinct("v")).collect()[0][0] == 150


# ---------------------------------------------------------------------------
# Null-value tombstones, peek observer, bucketed store internals
# ---------------------------------------------------------------------------
_RECORDS_SCHEMA = "key string, value string, timestamp timestamp, event_id long"


def _records_stream(spark, tmp_path, rows, name="records-src"):
    """Kafka-source-shaped streaming DF from literal rows."""
    src = str(tmp_path / name)
    spark.createDataFrame(rows, _RECORDS_SCHEMA).coalesce(1).write.parquet(src)
    return (
        spark.readStream.schema(_RECORDS_SCHEMA).format("parquet").load(src)
    )


def _ts(minute):
    from datetime import datetime

    return datetime(2026, 1, 1, 0, minute, 0)


def test_null_value_record_deletes_key(spark, tmp_path):
    """A2 KTable upsert semantics (KStreamsToKTable.java:78-81): a
    record with a NULL value is a tombstone — after k:v then k:null,
    the materialized table no longer contains k."""
    from kafka_streams_sandbox_spark.streaming.app import AppConfig, StreamsApp

    rows = [
        ("a", "1", _ts(1), 1),
        ("b", "2", _ts(1), 2),
        ("c", "c", _ts(1), 3),
        ("a", None, _ts(2), 4),  # tombstone: deletes "a"
        ("d", None, _ts(1), 5),
        ("d", "d", _ts(2), 6),  # later non-null value resurrects "d"
    ]
    app = StreamsApp(spark, AppConfig(state_dir=str(tmp_path / "app")))
    app.start(records=_records_stream(spark, tmp_path, rows))
    store = app.store(app.config.table_store)
    assert {r.key: r.value for r in store.collect()} == {
        "b": "2",
        "c": "c",
        "d": "d",
    }
    # filtered store additionally applies key==value (A4): only
    # survivors of BOTH the tombstone and the predicate remain.
    filtered = app.store(app.config.filtered_store)
    live = filtered.filter(~F.col("is_delete"))
    assert {r.key for r in live.collect()} == {"c", "d"}
    app.stop()


def test_peek_observer_emits_lines(spark, tmp_path):
    """A3: the peek tap is a real started query — it must capture at
    least one table update (round 1 shipped a never-started writer)."""
    from kafka_streams_sandbox_spark.streaming.app import AppConfig, StreamsApp

    lines: list[str] = []
    rows = [("a", "1", _ts(1), 1), ("b", "2", _ts(1), 2)]
    app = StreamsApp(
        spark,
        AppConfig(
            state_dir=str(tmp_path / "app"),
            peek=True,
            peek_sink=lines.append,
        ),
    )
    app.start(records=_records_stream(spark, tmp_path, rows))
    app.stop()
    assert lines, "peek observer captured nothing"
    assert all("[KTABLE-WATCH]" in ln for ln in lines)


def test_peek_tap_bounds_driver_transfer(spark, tmp_path):
    """r13 (VERDICT r12 wrong-item #1): the tap collects at most
    sample_rows rows per batch and reports the remainder as a count
    trailer — the debug signal survives while the driver transfer is
    O(N), not O(batch). Semantics pinned with a tiny cap so the
    trailer path actually executes."""
    from kafka_streams_sandbox_spark.streaming.ktable import peek

    lines: list[str] = []
    src = str(tmp_path / "peeksrc")
    spark.createDataFrame(
        [(str(i), i) for i in range(7)], "k string, v int"
    ).write.parquet(src)
    stream = (
        spark.readStream.schema("k string, v int")
        .format("parquet")
        .load(src)
    )
    q = peek(
        stream,
        sink=lines.append,
        checkpoint=str(tmp_path / "peekckpt"),
        sample_rows=2,
    )
    q.awaitTermination()
    row_lines = [ln for ln in lines if "more updates" not in ln]
    trailer = [ln for ln in lines if "more updates" in ln]
    assert len(row_lines) == 2  # capped sample
    assert len(trailer) == 1 and "7 total" in trailer[0]


def _store_batch(spark, rows):
    return spark.createDataFrame(rows, "k string, v int, is_delete boolean")


def _bucket_of(spark, key, n_buckets):
    return (
        spark.range(1)
        .select(
            F.pmod(F.xxhash64(F.lit(key)), F.lit(n_buckets))
            .cast("int")
            .alias("b")
        )
        .collect()[0]
        .b
    )


def test_store_incremental_bucket_rewrite(spark, tmp_path):
    """A one-key micro-batch rewrites ONLY that key's bucket: every
    other bucket is carried as hardlinks to the previous version's
    files (visible per-bucket writes, per-batch cost bounded by
    changed buckets)."""
    import os

    root = str(tmp_path / "store")
    store = ParquetKTableStore(spark, root, key="k", n_buckets=4)
    store.merge_batch(
        _store_batch(spark, [(f"k{i}", i, False) for i in range(20)]), 0
    )
    v1 = store.current_version()
    v1_inodes = {}
    for bucket in os.listdir(os.path.join(root, v1)):
        if bucket.startswith("__bucket="):
            d = os.path.join(root, v1, bucket)
            v1_inodes[bucket] = {
                os.stat(os.path.join(d, f)).st_ino
                for f in os.listdir(d)
                if not f.startswith(("_", "."))
            }
    assert len(v1_inodes) == 4  # 20 keys cover all 4 buckets

    store.merge_batch(_store_batch(spark, [("k3", 99, False)]), 1)
    v2 = store.current_version()
    assert v2 != v1
    changed = f"__bucket={_bucket_of(spark, 'k3', 4)}"
    for bucket, old_inodes in v1_inodes.items():
        d = os.path.join(root, v2, bucket)
        new_inodes = {
            os.stat(os.path.join(d, f)).st_ino
            for f in os.listdir(d)
            if not f.startswith(("_", "."))
        }
        if bucket == changed:
            assert new_inodes.isdisjoint(old_inodes), "changed bucket rewritten"
        else:
            assert new_inodes == old_inodes, "unchanged bucket hardlinked"
    got = {r.k: r.v for r in store.read().collect()}
    assert got["k3"] == 99 and len(got) == 20

    # previous version is pinned for in-flight readers; two merges later
    # it is reclaimed.
    assert os.path.isdir(os.path.join(root, v1))
    store.merge_batch(_store_batch(spark, [("k5", 55, False)]), 2)
    assert not os.path.isdir(os.path.join(root, v1))


def test_store_reader_survives_concurrent_merge(spark, tmp_path):
    """ADVICE fix: the _CURRENT pointer flip means there is no window
    where the store doesn't exist, and a DataFrame handed out before a
    merge stays readable after it (old version retained one cycle)."""
    store = ParquetKTableStore(spark, str(tmp_path / "store"), key="k")
    store.merge_batch(_store_batch(spark, [("a", 1, False), ("b", 2, False)]), 0)
    snapshot = store.read()
    store.merge_batch(_store_batch(spark, [("a", 9, False)]), 1)
    # pre-merge snapshot still collectable (its files weren't renamed away)
    assert {r.k: r.v for r in snapshot.collect()} == {"a": 1, "b": 2}
    assert {r.k: r.v for r in store.read().collect()} == {"a": 9, "b": 2}


def test_store_null_is_delete_is_explicit_tombstone(spark, tmp_path):
    """ADVICE fix: a NULL is_delete row (NULL-predicate filter result)
    deletes the key explicitly rather than silently."""
    store = ParquetKTableStore(spark, str(tmp_path / "store"), key="k")
    store.merge_batch(_store_batch(spark, [("a", 1, False), ("b", 2, False)]), 0)
    store.merge_batch(_store_batch(spark, [("b", 3, None)]), 1)
    assert {r.k for r in store.read().collect()} == {"a"}


def test_store_survives_tombstone_all_and_all_delete_first_batch(
    spark, tmp_path
):
    """ADVICE fix: a micro-batch that tombstones EVERY remaining key
    (or a first batch of only deletes) leaves a version with zero
    parquet part files; read() must yield an empty store and the next
    merge must revive it — not crash on schema inference."""
    store = ParquetKTableStore(spark, str(tmp_path / "store"), key="k")
    # first batch is all deletes -> empty version v0
    store.merge_batch(_store_batch(spark, [("x", 1, True)]), 0)
    assert store.read().count() == 0
    # revive
    store.merge_batch(_store_batch(spark, [("a", 1, False), ("b", 2, False)]), 1)
    assert {r.k: r.v for r in store.read().collect()} == {"a": 1, "b": 2}
    # tombstone everything -> empty again
    store.merge_batch(_store_batch(spark, [("a", 3, True), ("b", 4, True)]), 2)
    assert store.read().count() == 0
    # and revive again through the empty-version merge path
    store.merge_batch(_store_batch(spark, [("c", 5, False)]), 3)
    assert {r.k: r.v for r in store.read().collect()} == {"c": 5}


def test_stream_dedup_matches_batch_distinct(spark, sf_dir):
    """A24 streaming dropDuplicatesWithinWatermark == batch distinct on
    the same content key (stream-batch duality for exact dedup)."""
    from kafka_streams_sandbox_spark.registry import all_queries

    from kafka_streams_sandbox_spark.streaming.windows import dedup_content_key

    qs = all_queries()
    streamed = qs["a24_stream_dedup_watermark"](spark, sf_dir)
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    batch_keys = {
        r.k
        for r in ev.select(dedup_content_key().alias("k")).distinct().collect()
    }
    streamed_keys = {r.dedup_key for r in streamed.collect()}
    assert streamed_keys == batch_keys
    assert streamed.count() == len(batch_keys)  # exactly one row per key


def test_stream_quality_gate_duality(spark):
    """a25 (stream) and b69 (batch) run the SAME quality_verdict
    expressions; their full result sets must be identical."""
    from kafka_streams_sandbox_spark.operators.pipeline import b69_quality_gate
    from kafka_streams_sandbox_spark.streaming.windows import (
        a25_stream_quality_gate,
    )

    sf = "/root/testdata/sf0.001"
    stream = {tuple(r) for r in a25_stream_quality_gate(spark, sf).collect()}
    batch = {tuple(r) for r in b69_quality_gate(spark, sf).collect()}
    assert stream == batch and stream


def test_stream_incremental_dedup_duality(spark):
    """a26's accepted stream must equal b68's unique set: same docs
    rejected as corpus dups, one survivor per fresh fingerprint."""
    from kafka_streams_sandbox_spark.operators.pipeline import (
        b68_incremental_dedup,
    )
    from kafka_streams_sandbox_spark.streaming.windows import (
        a26_stream_incremental_dedup,
    )

    sf = "/root/testdata/sf0.001"
    accepted = {
        r.fingerprint
        for r in a26_stream_incremental_dedup(spark, sf).collect()
    }
    batch = b68_incremental_dedup(spark, sf).collect()
    unique_fps = {r.fingerprint for r in batch if r.status == "unique"}
    assert accepted == unique_fps and accepted


def test_stream_incremental_neardup_duality(spark):
    """a28's per-micro-batch verdicts must equal b98's batch verdicts
    exactly (incl. float jaccard — same expression lineage, no
    aggregation reordering); the in-query assert enforces this on
    every run, the named test documents it and pins the planted
    near-dup count is non-trivial."""
    from kafka_streams_sandbox_spark.operators.dedup import (
        b98_incremental_neardup,
    )
    from kafka_streams_sandbox_spark.streaming.windows import (
        a28_stream_incremental_neardup,
    )

    sf = "/root/testdata/sf0.001"
    stream = {
        tuple(r) for r in a28_stream_incremental_neardup(spark, sf).collect()
    }
    batch = {tuple(r) for r in b98_incremental_neardup(spark, sf).collect()}
    assert stream == batch and stream
    assert any(r[3] == "neardup_corpus" for r in stream)


def test_sliding_window_duality(spark, sf_dir):
    """A27 streaming hopping windows == B51 batch hopping windows."""
    qs = all_queries()
    streamed = qs["a27_stream_sliding_window"](spark, sf_dir)
    batch = qs["b51_sliding_window_agg"](spark, sf_dir)
    cols = ["window_start", "event_type", "n_events", "sum_value"]
    assert _sorted_rows(streamed, cols) == _sorted_rows(batch, cols)


def test_store_concurrent_reader_under_merge_storm(spark, tmp_path):
    """VERDICT r3 #6: drive >=20 merges (including the all-tombstone
    empty-version edge) while a concurrent reader thread hammers
    read(); every successful read must observe EXACTLY the store state
    after some completed batch — never a torn mix of two versions.

    Values are unique per (batch, key) so any cross-version tear
    produces a state outside the recorded sequence. A reader losing
    the two-cycle retention race gets a clean read error (counted,
    bounded), never a torn result — that IS the documented contract:
    _CURRENT flips atomically and the previous version is pinned for
    one merge cycle only.
    """
    import threading

    store = ParquetKTableStore(spark, str(tmp_path / "store"), key="k")
    keys = [f"k{i}" for i in range(10)]

    # states[i] = expected {k: v} after batch i; appended BEFORE each
    # merge so a read racing the pointer flip matches either side.
    live: dict[str, int] = {}
    states: list[dict[str, int]] = [dict(live)]
    stop = threading.Event()
    torn: list[dict] = []
    errors: list[str] = []
    good = [0]

    def reader():
        while not stop.is_set():
            df = store.read()
            if df is None:
                continue
            try:
                observed = {r.k: r.v for r in df.collect()}
            except Exception as exc:  # lost the 2-cycle retention race
                errors.append(type(exc).__name__)
                continue
            if observed in states:
                good[0] += 1
            else:
                torn.append(observed)
                stop.set()

    t = threading.Thread(target=reader, daemon=True)
    t.start()
    try:
        for i in range(1, 23):
            if i == 11:  # all-tombstone edge: empty version mid-storm
                rows = [(k, 0, True) for k in sorted(live)]
                live.clear()
            else:
                ups = [keys[i % 10], keys[(i + 3) % 10]]
                dels = [keys[(i + 5) % 10]]
                rows = [(k, i * 100 + int(k[1:]), False) for k in ups]
                rows += [(k, 0, True) for k in dels]
                for k in ups:
                    live[k] = i * 100 + int(k[1:])
                for k in dels:
                    live.pop(k, None)
            states.append(dict(live))
            store.merge_batch(_store_batch(spark, rows), i)
    finally:
        stop.set()
        t.join(timeout=60)

    assert not torn, f"torn read: {torn[:1]} not in any recorded state"
    assert good[0] >= 10, f"only {good[0]} successful concurrent reads"
    # retention-race errors must be the rare exception, not the norm
    assert len(errors) <= good[0], (good[0], errors)
    final = {r.k: r.v for r in store.read().collect()}
    assert final == live


def test_store_recovers_from_writer_killed_mid_merge(spark, tmp_path):
    """A writer that died AFTER writing part files but BEFORE the
    _CURRENT flip must be invisible: readers keep resolving the last
    flipped version, and the next successful merge supersedes (and
    eventually reclaims) the orphan directory. This is the crash-case
    half of the atomic-pointer contract."""
    import os

    root = str(tmp_path / "store")
    store = ParquetKTableStore(spark, root, key="k")
    store.merge_batch(_store_batch(spark, [("a", 1, False), ("b", 2, False)]), 0)
    v0 = store.current_version()

    # simulate the dead writer: a fully-written version dir, no flip
    orphan = _store_batch(spark, [("a", 99, False)]).withColumn(
        "__batch", F.lit(1)
    ).withColumn("__bucket", F.lit(0))
    orphan_dir = os.path.join(root, "v1-deadbeef")
    orphan.write.partitionBy("__bucket").parquet(orphan_dir)

    # reader is unaffected: still the flipped version's state
    assert store.current_version() == v0
    assert {r.k: r.v for r in store.read().collect()} == {"a": 1, "b": 2}

    # the next real merge proceeds from v0 (not the orphan) and the
    # cleanup pass reclaims the orphan directory
    store.merge_batch(_store_batch(spark, [("b", 3, False)]), 2)
    assert {r.k: r.v for r in store.read().collect()} == {"a": 1, "b": 3}
    assert not os.path.isdir(orphan_dir), "orphan version not reclaimed"


def test_multi_batch_stream_static_join_equals_batch(spark, sf_dir, tmp_path):
    """A22's semantics across MANY micro-batches: split events 4 ways,
    one file per trigger, stream-static left join per batch — the
    union of all batches must equal the single-shot batch join (the
    static side is re-resolved per micro-batch, so no batch boundary
    can change the result). The registered a22 only certifies the
    single-batch availableNow replay; this pins the multi-trigger
    case."""
    from kafka_streams_sandbox_spark.catalog import normalize_event_ts
    from kafka_streams_sandbox_spark.sources.replay import _events_raw_schema

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    src = str(tmp_path / "src")
    ev.withColumn("part", F.col("event_id") % 4).write.partitionBy(
        "part"
    ).parquet(src)
    stream = normalize_event_ts(
        spark.readStream.schema(_events_raw_schema(spark, sf_dir))
        .option("maxFilesPerTrigger", 1)
        .format("parquet")
        .load(src + "/part=*")
    )
    dim = spark.read.parquet(f"{sf_dir}/customer.parquet").selectExpr(
        "c_custkey AS user_id", "c_name", "c_mktsegment"
    )
    cols = ["event_id", "user_id", "event_type", "c_name", "c_mktsegment"]
    joined = stream.join(F.broadcast(dim), "user_id", "left").select(*cols)
    name = f"a22mb_{tmp_path.name[-6:]}"
    q = (
        joined.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = spark.table(name)
    assert q.lastProgress is not None  # multiple triggers actually ran
    batch = (
        normalize_event_ts(spark.read.parquet(f"{sf_dir}/events.parquet"))
        .join(F.broadcast(dim), "user_id", "left")
        .select(*cols)
    )
    assert _sorted_rows(got, cols) == _sorted_rows(batch, cols)


def test_multi_batch_stream_stream_join_equals_batch(spark, sf_dir, tmp_path):
    """A23's interval join across MANY micro-batches with IN-ORDER
    arrival: events sorted by ts and split into 4 contiguous time
    ranges, one file per trigger. With arrival following event time,
    no row is ever late, so the watermark's state eviction (clicks
    older than lookback + delay) must never drop a joinable pair —
    the streamed union must EXACTLY equal the batch interval join.
    This is the textbook watermark-correctness claim the single-batch
    a22/a23 replay cannot exercise."""
    from kafka_streams_sandbox_spark.catalog import normalize_event_ts
    from kafka_streams_sandbox_spark.sources.replay import _events_raw_schema

    ev = normalize_event_ts(spark.read.parquet(f"{sf_dir}/events.parquet"))
    src = str(tmp_path / "src")
    # 4 contiguous time ranges via ntile over ts: arrival order ==
    # event-time order at file granularity
    from pyspark.sql import Window as W

    ev.withColumn(
        "part", F.ntile(4).over(W.orderBy("ts", "event_id")) - 1
    ).write.partitionBy("part").parquet(src)
    stream = normalize_event_ts(
        spark.readStream.schema(_events_raw_schema(spark, sf_dir))
        .option("maxFilesPerTrigger", 1)
        .format("parquet")
        .load(src + "/part=*")
    ).withColumn("ts", F.col("ts").cast("timestamp"))

    purchases = (
        stream.filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user"),
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("p_ts"),
        )
        .withWatermark("p_ts", "10 minutes")
    )
    clicks = (
        stream.filter(F.col("event_type") == "click")
        .select(
            F.col("user_id").alias("c_user"),
            F.col("event_id").alias("click_id"),
            F.col("ts").alias("c_ts"),
        )
        .withWatermark("c_ts", "10 minutes")
    )
    joined = purchases.join(
        clicks,
        (F.col("p_user") == F.col("c_user"))
        & (F.col("c_ts") <= F.col("p_ts"))
        & (F.col("c_ts") >= F.col("p_ts") - F.expr("INTERVAL 1 HOUR")),
    ).select("purchase_id", "click_id")
    name = f"a23mb_{tmp_path.name[-6:]}"
    q = (
        joined.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = spark.table(name)

    raw = ev.withColumn("ts", F.col("ts").cast("timestamp"))
    p_b = raw.filter(F.col("event_type") == "purchase").selectExpr(
        "user_id AS p_user", "event_id AS purchase_id", "ts AS p_ts"
    )
    c_b = raw.filter(F.col("event_type") == "click").selectExpr(
        "user_id AS c_user", "event_id AS click_id", "ts AS c_ts"
    )
    batch = p_b.join(
        c_b,
        (F.col("p_user") == F.col("c_user"))
        & (F.col("c_ts") <= F.col("p_ts"))
        & (F.col("c_ts") >= F.col("p_ts") - F.expr("INTERVAL 1 HOUR")),
    ).select("purchase_id", "click_id")
    cols = ["purchase_id", "click_id"]
    assert _sorted_rows(got, cols) == _sorted_rows(batch, cols)


def test_processing_time_cadence_advances_store_versions(spark, tmp_path):
    """The reference program runs CONTINUOUSLY (KafkaStreams.start()
    processes records as they arrive); every other Layer A check here
    replays under availableNow. This drives the a01->a02->a04->a08
    topology with a real processingTime trigger while files arrive
    DURING execution (VERDICT r4 Next #6): >= 3 micro-batches must
    fire, the materialized store's version chain must advance once per
    content-changing batch, and after every advance the store must
    equal the batch-computed KTable over all records seen so far —
    stream-table duality PER BATCH, including a tombstone delete."""
    import time as _time

    from kafka_streams_sandbox_spark.streaming.ktable import (
        key_eq_value_predicate,
        ktable_filter,
        latest_by_key_stream,
    )

    src = tmp_path / "src"
    src.mkdir()

    def drop(name, rows):
        spark.createDataFrame(rows, _RECORDS_SCHEMA).coalesce(1).write.parquet(
            str(src / name)
        )

    drop("f1", [("a", "a", _ts(1), 1), ("b", "x", _ts(1), 2)])
    stream = (
        spark.readStream.schema(_RECORDS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .format("parquet")
        .load(str(src) + "/*")
    )
    tbl = latest_by_key_stream(
        stream,
        key="key",
        ts="timestamp",
        tiebreak="event_id",
        payload=("value", "timestamp", "event_id"),
        tombstone_col="value",
    )
    filtered = ktable_filter(tbl, key_eq_value_predicate("key", "value"))
    store = ParquetKTableStore(spark, str(tmp_path / "store"), key="key")
    fstore = ParquetKTableStore(spark, str(tmp_path / "fstore"), key="key")
    q_tbl = (
        tbl.writeStream.foreachBatch(store.foreach_batch())
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt-tbl"))
        .trigger(processingTime="500 milliseconds")
        .start()
    )
    q_filt = (
        filtered.writeStream.foreachBatch(fstore.foreach_batch())
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt-filt"))
        .trigger(processingTime="500 milliseconds")
        .start()
    )

    def store_dict():
        return {
            r["key"]: r["value"]
            for r in store.read().drop("__batch").collect()
        }

    def wait_advance(prev, timeout=60.0):
        deadline = _time.monotonic() + timeout
        while _time.monotonic() < deadline:
            cur = store.current_version()
            if cur is not None and cur != prev:
                return cur
            _time.sleep(0.2)
        raise AssertionError(f"store version did not advance past {prev}")

    try:
        versions = [wait_advance(None)]
        assert store_dict() == {"a": "a", "b": "x"}

        drop("f2", [("a", "A2", _ts(2), 3), ("c", "c", _ts(2), 4)])
        versions.append(wait_advance(versions[-1]))
        assert store_dict() == {"a": "A2", "b": "x", "c": "c"}

        drop("f3", [("b", None, _ts(3), 5)])  # NULL value = tombstone
        versions.append(wait_advance(versions[-1]))
        assert store_dict() == {"a": "A2", "c": "c"}  # b deleted
    finally:
        q_tbl.stop()
        q_filt.stop()
        q_tbl.awaitTermination(10)
        q_filt.awaitTermination(10)

    # the version chain really advanced once per content change
    assert len(set(versions)) >= 3, versions

    # filtered store (A4/A8) after the full run: only keys whose
    # latest value equals the key case-insensitively survive
    def fstore_dict(timeout=30.0):
        deadline = _time.monotonic() + timeout
        while _time.monotonic() < deadline:
            df = fstore.read()
            if df is not None:
                got = {
                    r["key"]: r["value"]
                    for r in df.drop("__batch").collect()
                }
                if got == {"c": "c"}:
                    return got
            _time.sleep(0.2)
        return {
            r["key"]: r["value"]
            for r in fstore.read().drop("__batch").collect()
        }

    assert fstore_dict() == {"c": "c"}


def test_concurrent_reader_at_cadence_sees_only_consistent_snapshots(
    spark, tmp_path
):
    """Durable-sink IQ (r6, VERDICT r5 Next #8): while the a02 store
    merges at a processingTime cadence, an INDEPENDENT reader loops
    open_store(path) reads — the cross-session endpoint a 100x
    deployment uses instead of the in-process handle. Every snapshot
    the reader collects must be one of the three content states the
    batch sequence can produce (atomic _CURRENT flip + one-cycle
    version pinning => no torn read ever shows a partial merge), and
    the reader must observe the final state."""
    import threading
    import time as _time

    from kafka_streams_sandbox_spark.streaming.app import open_store
    from kafka_streams_sandbox_spark.streaming.ktable import (
        latest_by_key_stream,
    )

    src = tmp_path / "src"
    src.mkdir()

    def drop(name, rows):
        spark.createDataFrame(rows, _RECORDS_SCHEMA).coalesce(1).write.parquet(
            str(src / name)
        )

    drop("f1", [("a", "a", _ts(1), 1), ("b", "x", _ts(1), 2)])
    stream = (
        spark.readStream.schema(_RECORDS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .format("parquet")
        .load(str(src) + "/*")
    )
    tbl = latest_by_key_stream(
        stream,
        key="key",
        ts="timestamp",
        tiebreak="event_id",
        payload=("value", "timestamp", "event_id"),
        tombstone_col="value",
    )
    store = ParquetKTableStore(spark, str(tmp_path / "store"), key="key")
    q = (
        tbl.writeStream.foreachBatch(store.foreach_batch())
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(processingTime="500 milliseconds")
        .start()
    )

    valid_states = [
        {"a": "a", "b": "x"},                      # after f1
        {"a": "A2", "b": "x", "c": "c"},           # after f2
        {"a": "A2", "c": "c"},                     # after f3 (b tombstoned)
    ]
    snapshots: list[dict] = []
    reader_errors: list[BaseException] = []
    stop_flag = threading.Event()

    def reader():
        # a reader knows only the PATH — no shared store object
        while not stop_flag.is_set():
            try:
                df = open_store(spark, str(tmp_path / "store"))
                snapshots.append(
                    {r["key"]: r["value"] for r in df.collect()}
                )
            except RuntimeError:
                pass  # not materialized yet — the documented signal
            except BaseException as exc:  # torn read = test failure
                reader_errors.append(exc)
                return
            _time.sleep(0.05)

    t = threading.Thread(target=reader, daemon=True)
    t.start()

    def wait_for(state, timeout=60.0):
        deadline = _time.monotonic() + timeout
        while _time.monotonic() < deadline:
            if snapshots and snapshots[-1] == state:
                return
            _time.sleep(0.2)
        raise AssertionError(
            f"reader never observed {state}; last: {snapshots[-5:]}"
        )

    try:
        wait_for(valid_states[0])
        drop("f2", [("a", "A2", _ts(2), 3), ("c", "c", _ts(2), 4)])
        wait_for(valid_states[1])
        drop("f3", [("b", None, _ts(3), 5)])  # tombstone during reads
        wait_for(valid_states[2])
    finally:
        stop_flag.set()
        t.join(10)
        q.stop()
        q.awaitTermination(10)

    assert not reader_errors, reader_errors
    assert len(snapshots) >= 3
    for snap in snapshots:  # no torn/partial state ever surfaced
        assert snap in valid_states, snap


def test_stream_incremental_neardup_multi_batch_cadence(spark, tmp_path):
    """r7 (VERDICT r6 Next #7): a28's duality claim is that micro-batch
    boundaries CANNOT change verdicts — so exercise real boundaries.
    The arriving docs are staged as 3 mtime-ordered files read with
    maxFilesPerTrigger=1 (>= 3 live micro-batches, the r5 cadence
    discipline), each batch runs the shared verdict core against the
    same frozen index with the a28 production details (per-batch
    subpath overwrite, checkpoint release), and the unioned verdicts
    must equal b98's single-batch run bit-for-bit."""
    import glob
    import shutil
    import tempfile

    from pyspark import StorageLevel
    from pyspark.sql import functions as F

    from kafka_streams_sandbox_spark.catalog import documents_wide
    from kafka_streams_sandbox_spark.functions.tokens import TOKENS_EXPR
    from kafka_streams_sandbox_spark.operators.dedup import (
        b98_incremental_neardup,
        guarded_band_index,
        incremental_neardup_verdicts,
    )
    from kafka_streams_sandbox_spark.sources.replay import DOCUMENTS_SCHEMA

    sf = "/root/testdata/sf0.001"
    docs = documents_wide(spark, sf)
    tokened = docs.filter(F.expr(f"size({TOKENS_EXPR}) > 0"))
    is_new = (F.col("doc_id") % 10) >= 8
    corpus = tokened.filter(~is_new)
    index = guarded_band_index(corpus).persist(StorageLevel.DISK_ONLY)
    index.count()
    src_dir = tempfile.mkdtemp(prefix="kss-a28cad-src-")
    cols = [f.name for f in DOCUMENTS_SCHEMA.fields]
    for part in range(3):
        stage = tempfile.mkdtemp(prefix=f"kss-a28cad-w{part}-")
        docs.filter(is_new & ((F.col("doc_id") % 3) == part)).select(
            *cols
        ).coalesce(1).write.mode("overwrite").parquet(stage)
        dst = f"{src_dir}/part-{part:02d}.parquet"
        shutil.copyfile(glob.glob(f"{stage}/part-*.parquet")[0], dst)
        import os

        os.utime(dst, (1_000_000_000 + part, 1_000_000_000 + part))
    out_dir = tempfile.mkdtemp(prefix="kss-a28cad-out-")
    batch_ids: list[int] = []

    def ingest(bdf, batch_id):
        batch_ids.append(batch_id)
        handles: list = []
        verdicts = incremental_neardup_verdicts(
            batch=bdf.filter(F.expr(f"size({TOKENS_EXPR}) > 0")),
            batch_all_ids=bdf.select("doc_id"),
            corpus=corpus,
            index_guarded=index,
            release_into=handles,
        )
        verdicts.write.mode("overwrite").parquet(
            f"{out_dir}/batch_id={batch_id}"
        )
        for h in handles:
            h.unpersist()

    try:
        q = (
            spark.readStream.schema(DOCUMENTS_SCHEMA)
            .format("parquet")
            .option("maxFilesPerTrigger", 1)
            .load(src_dir)
            .writeStream.foreachBatch(ingest)
            .option(
                "checkpointLocation", tempfile.mkdtemp(prefix="kss-ckpt-")
            )
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        index.unpersist()
    assert len(batch_ids) >= 3, batch_ids
    out = spark.read.option("recursiveFileLookup", "true").parquet(out_dir)
    stream = {tuple(r) for r in out.collect()}
    batch = {tuple(r) for r in b98_incremental_neardup(spark, sf).collect()}
    assert stream == batch and stream


def test_stream_repetition_gate_duality(spark):
    """a30's per-micro-batch repetition metrics must equal b102's
    batch metrics exactly (per-doc integer divisions — no float drift
    path exists); the in-query assert enforces this every run, the
    named test documents it and pins that verdicts are non-trivial
    (both pass and fail appear on the driver corpus)."""
    from kafka_streams_sandbox_spark.operators.text import (
        b102_gopher_repetition,
    )
    from kafka_streams_sandbox_spark.streaming.windows import (
        a30_stream_repetition_gate,
    )

    sf = "/root/testdata/sf0.001"
    stream = {
        tuple(r) for r in a30_stream_repetition_gate(spark, sf).collect()
    }
    batch = {tuple(r) for r in b102_gopher_repetition(spark, sf).collect()}
    assert stream == batch and stream
    verdicts = {r[-1] for r in stream}
    assert verdicts == {True, False}


def test_stream_pq_encode_duality(spark):
    """a31's ingest-time PQ codes must equal b104's at-rest codes
    bit-for-bit (shared guard, shared kernel, same broadcast books);
    the in-query assert enforces this on every run (packed array
    form), the named test documents it and pins full-corpus coverage
    over the driver-facing EXPLODED (vec_id, pos, code) rows — the
    r8 canonicalizer-safe shape (VERDICT r7 #1)."""
    from collections import defaultdict

    from kafka_streams_sandbox_spark.operators.similarity import (
        pq_corpus_codes,
    )
    from kafka_streams_sandbox_spark.streaming.windows import (
        a31_stream_pq_encode,
    )

    sf = "/root/testdata/sf0.001"
    out = a31_stream_pq_encode(spark, sf)
    assert [f.name for f in out.schema.fields] == ["vec_id", "pos", "code"]
    packed: dict[int, dict[int, int]] = defaultdict(dict)
    for r in out.collect():
        packed[r["vec_id"]][r["pos"]] = r["code"]
    stream = {
        (vid, tuple(codes[i] for i in range(len(codes))))
        for vid, codes in packed.items()
    }
    batch_codes, _, _ = pq_corpus_codes(spark, sf)
    batch = {
        (r["vec_id"], tuple(r["codes"])) for r in batch_codes.collect()
    }
    assert stream == batch and stream


def test_stream_curation_funnel_shape_and_duality(spark):
    """a32 (r8): the ingest-time curation funnel's in-query duality
    assert certifies decisions == batch twin on every run; the named
    test documents it and pins the report shape — 5 stages, docs and
    tokens both monotone non-increasing, 'arrived' equal to the
    arriving slice, and a funnel that actually attrits on the driver
    corpus (dedup_exact < repetition: the corpus plants cross-slice
    exact dups)."""
    from kafka_streams_sandbox_spark.streaming.windows import (
        a32_stream_curation_funnel,
    )

    sf = "/root/testdata/sf0.001"
    rows = {
        r["stage"]: (r["n_docs"], r["n_tokens"])
        for r in a32_stream_curation_funnel(spark, sf).collect()
    }
    order = ["arrived", "quality", "repetition", "dedup_exact", "dedup_near"]
    assert list(rows) == order or set(rows) == set(order)
    n_arriving = (
        spark.read.parquet(f"{sf}/documents.parquet")
        .filter("doc_id % 10 >= 8")
        .count()
    )
    assert rows["arrived"][0] == n_arriving
    for a, b in zip(order, order[1:]):
        assert rows[a][0] >= rows[b][0]
        assert rows[a][1] >= rows[b][1]
    assert rows["dedup_exact"][0] < rows["repetition"][0]
    assert rows["dedup_near"][0] < rows["dedup_exact"][0]


def test_stream_lm_gate_frozen_model_separates(spark, tmp_path):
    """a33 (r8): the frozen-model LM gate must pass in-distribution
    arrivals and fail out-of-distribution ones — the train/apply
    split's whole point, unreachable by self-trained b108 (which
    would fold the OOD doc into its own model). The frozen 80%
    (doc_id % 10 < 8) is template text; arriving doc 8 is the same
    template (scores like the corpus, passes), arriving doc 9 is
    all-unique gibberish (every bigram unseen -> left-join zeros ->
    lm_score 0.0, fails). The in-query duality assert also ran."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from kafka_streams_sandbox_spark.streaming.windows import (
        a33_stream_lm_gate,
    )

    template = "the cat sat on the mat and the dog sat on the rug " * 3
    texts = {i: template for i in range(8)}
    texts[8] = template  # in-distribution arrival
    texts[9] = " ".join(f"ood{j}" for j in range(40))  # OOD arrival
    ids = sorted(texts)
    table = pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "text": pa.array([texts[i] for i in ids], pa.string()),
            "lang": pa.array(["en"] * len(ids), pa.string()),
            "source": pa.array(["srcL"] * len(ids), pa.string()),
            "n_chars": pa.array([len(texts[i]) for i in ids], pa.int64()),
        }
    )
    pq.write_table(table, str(tmp_path / "documents.parquet"))
    got = {
        r["doc_id"]: (r["lm_score"], r["passes_lm"])
        for r in a33_stream_lm_gate(spark, str(tmp_path)).collect()
    }
    assert set(got) == {8, 9}
    assert got[8][1] and got[8][0] > 0.0
    assert got[9] == (0.0, False)


def test_stream_full_funnel_shape(spark):
    """a34 (r9, VERDICT r8 #1): the FULL ingest funnel emits 9
    attrition rows, monotone non-increasing through train, with
    holdout == mixture - train; the in-query duality assert over the
    7-flag decision frame ran by construction."""
    from kafka_streams_sandbox_spark.streaming.windows import (
        a34_stream_full_funnel,
    )

    sf = "/root/testdata/sf0.001"
    rows = {
        r["stage"]: (r["n_docs"], r["n_tokens"])
        for r in a34_stream_full_funnel(spark, sf).collect()
    }
    order = [
        "arrived", "quality", "repetition", "lm_gate",
        "dedup_exact", "dedup_near", "mixture", "train",
    ]
    assert set(rows) == {*order, "holdout"}
    n_arriving = (
        spark.read.parquet(f"{sf}/documents.parquet")
        .filter("doc_id % 10 >= 8")
        .count()
    )
    assert rows["arrived"][0] == n_arriving
    for a, b in zip(order, order[1:]):
        assert rows[a][0] >= rows[b][0], (a, b)
        assert rows[a][1] >= rows[b][1], (a, b)
    assert rows["holdout"][0] == rows["mixture"][0] - rows["train"][0]
    assert rows["holdout"][1] == rows["mixture"][1] - rows["train"][1]
    # the funnel attrits on the driver corpus (planted cross-slice
    # dups + the mixture's sub-1.0 tiers)
    assert rows["dedup_exact"][0] < rows["repetition"][0]
    assert rows["mixture"][0] < rows["dedup_near"][0]


def test_stream_full_funnel_planted_every_stage(spark, tmp_path):
    """a34 planted contract (the b100 pure-Python re-derivation
    discipline at ingest): a corpus where each arrival exercises
    exactly one drop reason, with every expected stage count derived
    by hand — the frozen 80% is one 30-token chain repeated 8x, so
    the bigram model is (w_j, w_j+1) -> n_pn = 8, n_p = 8 and the
    frozen threshold is 29*64 / (232 + 1856) = 0.8889 exactly.

      id 18 (src0): 15-token model chain + 10 uniques -> survives all
          stages; Lehmer keep (w=1.0); md5 bucket 111 -> train
      id 19 (src0): 30 OOD tokens -> lm_score 0.0, drops at lm_gate
      id 28 (src1): in-dist; Lehmer key 596 >= 500 -> drops at mixture
      id 29 (src1): in-dist; key 403 < 500 -> kept; bucket 110 -> train
      id 38 (src2): in-dist; key 666 >= 250 -> drops at mixture
      id 39 (src3): in-dist; key 473 >= 100 -> drops at mixture
      id 48 (src0): EXACT copy of 18 (same seq batch) -> first-wins
          keeps 18, 48 drops at dedup_exact
      id 49 (src0): the full corpus chain + 1 token -> jaccard vs the
          frozen corpus 30/31 = 0.97 >= 0.8 -> drops at dedup_near
          (lm passes first: score 232/262 = 0.885)
      id 98 (src0): in-dist survivor; md5 bucket 244 -> holdout
    """
    import pyarrow as pa
    import pyarrow.parquet as pq

    from kafka_streams_sandbox_spark.streaming.windows import (
        a34_stream_full_funnel,
    )

    W = [f"w{j}" for j in range(30)]
    chain = " ".join(W)
    in_dist_18 = " ".join(W[:15] + [f"u{j}" for j in range(10)])
    texts = {i: chain for i in range(8)}  # frozen 80%
    texts[18] = in_dist_18
    texts[19] = " ".join(f"g{j}" for j in range(30))
    texts[28] = " ".join(W[15:30] + [f"v{j}" for j in range(10)])
    texts[29] = " ".join(W[5:20] + [f"y{j}" for j in range(10)])
    texts[38] = " ".join(W[10:25] + [f"z{j}" for j in range(10)])
    texts[39] = " ".join(W[2:17] + [f"t{j}" for j in range(10)])
    texts[48] = in_dist_18
    texts[49] = chain + " n0"
    texts[98] = " ".join(W[:15] + [f"q{j}" for j in range(10)])
    srcs = {28: "src1", 29: "src1", 38: "src2", 39: "src3"}
    ids = sorted(texts)
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "text": pa.array([texts[i] for i in ids], pa.string()),
                "lang": pa.array(["en"] * len(ids), pa.string()),
                "source": pa.array(
                    [srcs.get(i, "src0") for i in ids], pa.string()
                ),
                "n_chars": pa.array(
                    [len(texts[i]) for i in ids], pa.int64()
                ),
            }
        ),
        str(tmp_path / "documents.parquet"),
    )
    got = {
        r["stage"]: (r["n_docs"], r["n_tokens"])
        for r in a34_stream_full_funnel(spark, str(tmp_path)).collect()
    }
    toks = {i: len(texts[i].split()) for i in ids}
    arriving = [i for i in ids if i % 10 >= 8]
    want = {
        "arrived": arriving,
        "quality": arriving,
        "repetition": arriving,
        "lm_gate": [i for i in arriving if i != 19],
        "dedup_exact": [18, 28, 29, 38, 39, 49, 98],
        "dedup_near": [18, 28, 29, 38, 39, 98],
        "mixture": [18, 29, 98],
        "train": [18, 29],
        "holdout": [98],
    }
    assert got == {
        s: (len(members), sum(toks[i] for i in members))
        for s, members in want.items()
    }


def test_stream_paragraph_dedup_planted_ownership(spark, tmp_path):
    """a35 (r9): CCNet paragraph dedup at ingest — each ownership rule
    planted and asserted on the full rewritten output:
      * corpus wins: arrival 18 loses paragraph A to the frozen doc 0
      * in-batch first-wins: arrival 28 (seq 8) loses B to 18 (seq 8)
      * cross-batch seq order beats doc_id: arrival 19 (seq 9) loses D
        to 28 (seq 8) although 19 < 28
      * intra-doc repeat: arrival 29 keeps only its first H copy
      * short tail blocks are paragraphs too (arrival 38, 7 tokens)
    The in-query duality assert (stream == min-(seq,doc,pos) twin over
    bit-identical new_text strings) ran by construction."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from kafka_streams_sandbox_spark.streaming.windows import (
        a35_stream_paragraph_dedup,
    )

    def block(tag):
        return " ".join(f"{tag}{j}" for j in range(20))

    A, B, D, G, H = (block(t) for t in "abdgh")
    E5 = "e0 e1 e2 e3 e4"
    I7 = "i0 i1 i2 i3 i4 i5 i6"
    texts = {
        0: f"{A} c0 c1 c2 c3 c4",  # frozen: owns A (and its tail)
        18: f"{B} {A} {E5}",       # loses A to the corpus
        28: f"{B} {D}",            # loses B to 18 (same batch)
        19: f"{D} {G}",            # loses D to 28 (earlier seq wins)
        29: f"{H} {H}",            # intra-doc repeat
        38: I7,                    # single short paragraph
    }
    ids = sorted(texts)
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "text": pa.array([texts[i] for i in ids], pa.string()),
                "lang": pa.array(["en"] * len(ids), pa.string()),
                "source": pa.array(["s"] * len(ids), pa.string()),
                "n_chars": pa.array([len(texts[i]) for i in ids], pa.int64()),
            }
        ),
        str(tmp_path / "documents.parquet"),
    )
    got = {
        r["doc_id"]: r
        for r in a35_stream_paragraph_dedup(spark, str(tmp_path)).collect()
    }
    assert set(got) == {18, 19, 28, 29, 38}
    want = {
        18: (3, 2, f"{B} {E5}"),
        28: (2, 1, D),
        19: (2, 1, G),
        29: (2, 1, H),
        38: (1, 1, I7),
    }
    for i, (n, k, t) in want.items():
        r = got[i]
        assert (r["n_paras"], r["kept_paras"], r["new_text"]) == (n, k, t), i


def test_ingest_twins_on_empty_corpus(spark, tmp_path):
    """r9: the ingest-time composites must survive a zero-doc corpus —
    an empty ingest window is routine at deployment. a34 reports its
    9 stage rows of zeros (the b100/b113 always-emit contract); a35
    returns an empty rewritten set. Both duality asserts ran on the
    empty replay."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from kafka_streams_sandbox_spark.streaming.windows import (
        a34_stream_full_funnel,
        a35_stream_paragraph_dedup,
    )

    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "text": pa.array([], pa.string()),
                "lang": pa.array([], pa.string()),
                "source": pa.array([], pa.string()),
                "n_chars": pa.array([], pa.int64()),
            }
        ),
        str(tmp_path / "documents.parquet"),
    )
    rows = a34_stream_full_funnel(spark, str(tmp_path)).collect()
    assert len(rows) == 9
    assert all(r["n_docs"] == 0 and r["n_tokens"] == 0 for r in rows)
    assert a35_stream_paragraph_dedup(spark, str(tmp_path)).count() == 0


def test_span_compaction_cadence_retroactive_flip(spark):
    """a36 planted cadence (r10, VERDICT r9 #3): >= 2 compaction
    rounds over a corpus where round 1's ARRIVAL (doc 8 — ids are
    seq-keyed mod 10, so an arrival can hold a smaller id than a
    standing doc) is the min-id keeper of an 8-token span standing
    doc 17 held uniquely until then. The compactor must rewrite the
    already-stored doc 17 IN PLACE (the retroactive flip no ingest
    gate can express) and report it; every round's in-query
    invariance assert (store == batch b97 over the same union) runs
    as part of the call."""
    from kafka_streams_sandbox_spark.streaming.windows import (
        span_compaction_rounds,
    )

    S = "s1 s2 s3 s4 s5 s6 s7 s8"  # the contested 8-token span
    docs = spark.createDataFrame(
        [
            (1, "u1 u2 u3 u4 u5 u6 u7 u8 u9"),      # standing, clean
            (17, f"q1 q2 {S} q3 q4"),                # standing holder
            (8, f"r1 r2 {S} r3 r4"),                 # seq-08 arrival
            (19, "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10"),  # seq-09 arrival
        ],
        "doc_id long, text string",
    )
    rows = {
        r["round"]: r for r in span_compaction_rounds(spark, docs).collect()
    }
    assert rows[0]["corpus_docs"] == 2 and rows[0]["removed_tokens"] == 0
    # round 1: doc 8 arrives, becomes keeper of S (8 < 17) -> the
    # STORED doc 17 is rewritten: 8 tokens removed, 1 changed doc
    assert rows[1]["arrived_docs"] == 1
    assert rows[1]["changed_docs"] == 1
    assert rows[1]["removed_tokens"] == 8
    # round 2: a clean arrival — the flip persists, nothing re-changes
    assert rows[2]["changed_docs"] == 0
    assert rows[2]["removed_tokens"] == 8
    assert rows[2]["corpus_docs"] == 4


def test_span_compaction_sampled_verify_mode(spark):
    """a36's verify knob (r11, VERDICT r10 #7): the production
    cadence samples the store==batch invariance assert instead of
    re-deriving full multisets both ways. Same corpus as the
    retroactive-flip test (plus doc 16 ≡ 0 mod 16 so the sampled
    slice is NON-empty — asserted); the report must be identical to
    full-verify mode row for row (the knob changes only the
    cross-check's population, never the compaction lineage)."""
    from kafka_streams_sandbox_spark.streaming.windows import (
        span_compaction_rounds,
    )

    S = "s1 s2 s3 s4 s5 s6 s7 s8"
    rows_src = [
        (1, "u1 u2 u3 u4 u5 u6 u7 u8 u9"),
        (16, f"v1 v2 {S} v3 v4"),  # in the doc_id % 16 == 0 sample
        (17, f"q1 q2 {S} q3 q4"),
        (8, f"r1 r2 {S} r3 r4"),
        (19, "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10"),
    ]
    assert any(d % 16 == 0 for d, _ in rows_src)
    docs = spark.createDataFrame(rows_src, "doc_id long, text string")
    full = sorted(
        map(tuple, span_compaction_rounds(spark, docs).collect())
    )
    sampled = sorted(
        map(
            tuple,
            span_compaction_rounds(spark, docs, verify="sampled").collect(),
        )
    )
    assert sampled == full
    # the sampled assert still bites: doc 16 is a contested-span
    # holder inside the sample, so the exceptAll cross-check compared
    # real rewritten content, not an empty slice
    assert any(r[4] > 0 for r in full)  # changed_docs fired some round


def test_ingest_funnel_kill_and_resume(spark):
    """r11: the funnel family's restart contract, DEMONSTRATED (the
    b114 kill-and-resume discipline applied to the flagship ingest
    op). A crash is injected into the nastiest window — batch 0's
    decisions parquet written, state deltas NOT — the availableNow
    query dies, and _ingest_funnel's bounded restart loop re-runs the
    same batch_id on the same checkpoint. committed_state must treat
    the torn attempt's subpaths as invisible (batch_id < upto reads
    only) and the overwrite subpaths must regenerate identically:
    the resumed run's 16-row graded report must equal a clean run's
    EXACTLY, and the in-query duality assert (stream == batch twin,
    9 flags + bucket + p_tokens) runs inside both calls by
    construction."""
    from kafka_streams_sandbox_spark.streaming import windows

    sf = "/root/testdata/sf0.001"
    clean = {
        (r["stage"]): (r["n_docs"], r["n_tokens"])
        for r in windows.a37_stream_graded_funnel(spark, sf).collect()
    }
    windows.INGEST_FAIL_AFTER_DECISIONS.add(0)
    try:
        resumed = {
            (r["stage"]): (r["n_docs"], r["n_tokens"])
            for r in windows.a37_stream_graded_funnel(spark, sf).collect()
        }
    finally:
        windows.INGEST_FAIL_AFTER_DECISIONS.discard(0)
    # the injected crash actually fired (armed entry consumed) ...
    assert 0 not in windows.INGEST_FAIL_AFTER_DECISIONS
    # ... and the resumed run is indistinguishable from a clean one
    assert resumed == clean


def test_stream_graded_funnel_shape(spark):
    """a37 (r10, VERDICT r9 #4): the graded ingest funnel emits b113's
    16-row report; the in-query duality assert over the 9-flag +
    bucket + p_tokens decision frame ran by construction. Pins the
    graded algebra the flat funnel doesn't have: the three bucket _in
    rows partition the near-dedup survivors, each bucket keeps a
    subset of its candidates, and mixture == the kept buckets' sum —
    in BOTH currencies."""
    from kafka_streams_sandbox_spark.streaming.windows import (
        a37_stream_graded_funnel,
    )

    sf = "/root/testdata/sf0.001"
    rows = {
        r["stage"]: (r["n_docs"], r["n_tokens"])
        for r in a37_stream_graded_funnel(spark, sf).collect()
    }
    order = [
        "arrived", "quality", "repetition", "dedup_para", "lm_gate",
        "dedup_exact", "dedup_near", "mixture", "train",
    ]
    buckets = ("head", "middle", "tail")
    assert set(rows) == {
        *order, "holdout",
        *(f"{b}_in" for b in buckets), *(f"{b}_kept" for b in buckets),
    }
    n_arriving = (
        spark.read.parquet(f"{sf}/documents.parquet")
        .filter("doc_id % 10 >= 8")
        .count()
    )
    assert rows["arrived"][0] == n_arriving
    for a, b in zip(order, order[1:]):
        assert rows[a][0] >= rows[b][0], (a, b)
        assert rows[a][1] >= rows[b][1], (a, b)
    for cur in (0, 1):
        assert rows["dedup_near"][cur] == sum(
            rows[f"{b}_in"][cur] for b in buckets
        )
        assert rows["mixture"][cur] == sum(
            rows[f"{b}_kept"][cur] for b in buckets
        )
        assert all(
            rows[f"{b}_kept"][cur] <= rows[f"{b}_in"][cur] for b in buckets
        )
        assert (
            rows["holdout"][cur]
            == rows["mixture"][cur] - rows["train"][cur]
        )
    # the CCNet stages bite on the driver corpus: the paragraph stage
    # drops docs/tokens (cross-slice duplicate paragraphs exist) and
    # the graded mixture downsamples below the near-dedup survivors
    assert rows["dedup_para"][1] < rows["repetition"][1]
    assert rows["mixture"][0] < rows["dedup_near"][0]


def test_compact_committed_state_folds_and_recovers(spark, tmp_path):
    """r13 (VERDICT r12 #8): compaction folds seed + committed deltas
    into one seed with identical content and fewer files; the
    recovery path finishes an interrupted swap instead of folding
    emptiness over the good temp."""
    import glob
    import os
    import shutil

    from kafka_streams_sandbox_spark.streaming.windows import (
        committed_state,
        compact_committed_state,
    )

    root = str(tmp_path / "state")
    schema = "fingerprint string"

    def write(sub, vals):
        spark.createDataFrame(
            [(v,) for v in vals], schema
        ).coalesce(1).write.mode("overwrite").parquet(f"{root}/{sub}")

    write("seed", ["s1", "s2"])
    for b, vals in enumerate((["a"], ["b1", "b2"], ["c"])):
        write(f"batch_id={b}", vals)

    def contents():
        return sorted(
            r["fingerprint"]
            for r in committed_state(
                spark, root, schema, 1 << 30, seed=True
            ).collect()
        )

    before = contents()
    r = compact_committed_state(spark, root, schema, 1 << 30)
    assert contents() == before
    assert r["rows"] == 6
    assert r["files_after"] < r["files_before"]
    assert not glob.glob(f"{root}/batch_id=*")

    # interrupted-swap recovery: temp written, seed+deltas gone
    write("batch_id=7", ["late"])
    state_now = contents()
    os.rename(f"{root}/seed", f"{root}/compact-tmp-stage")
    spark.read.parquet(
        f"{root}/compact-tmp-stage", f"{root}/batch_id=7"
    ).write.mode("overwrite").parquet(f"{root}/compact-tmp")
    shutil.rmtree(f"{root}/compact-tmp-stage")
    shutil.rmtree(f"{root}/batch_id=7")
    # root now has ONLY compact-tmp (the torn window)
    compact_committed_state(spark, root, schema, 1 << 30)
    assert contents() == state_now
