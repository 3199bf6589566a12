"""End-to-end StreamsApp test: the reference program's full lifecycle
(topology -> start -> interactive store queries -> stop) on
console-producer-style key:value records, asserting the semantics the
reference demonstrates (README.md:19-26 in the reference):

- passthrough sink keeps every record (stream, A6)
- table store holds the latest value per key (upsert, A2)
- filtered store holds exactly the keys whose LATEST value equals the
  key case-insensitively; keys that once matched but were overwritten
  by a non-matching value are tombstoned away (A4 + filter-after-
  upsert ordering, SURVEY.md §4.1)
"""

from __future__ import annotations

import os
import tempfile

import pytest

from kafka_streams_sandbox_spark.streaming.app import AppConfig, StreamsApp

# (key, value, ts_offset_s) — mirrors the reference's manual console
# session: later records overwrite earlier ones per key.
RECORDS = [
    ("alpha", "alpha", 0),      # matches -> should survive the filter
    ("beta", "nope", 1),        # never matches
    ("gamma", "GAMMA", 2),      # case-insensitive match survives
    ("delta", "delta", 3),      # matches now...
    ("delta", "changed", 4),    # ...but latest value breaks it -> tombstone
    ("beta", "beta", 5),        # latest value now matches -> appears
    ("alpha", "alpha", 6),      # idempotent re-send
]


@pytest.fixture(scope="module")
def app(spark):
    stage = tempfile.mkdtemp(prefix="kss-app-src-")
    rows = [
        (k, v, f"2024-01-01 00:00:{off:02d}", i)
        for i, (k, v, off) in enumerate(RECORDS)
    ]
    batch = spark.createDataFrame(
        rows, "key string, value string, ts string, event_id long"
    ).selectExpr(
        "key", "value", "CAST(ts AS TIMESTAMP_NTZ) AS timestamp", "event_id"
    )
    batch.coalesce(1).write.mode("overwrite").parquet(stage)
    stream = (
        spark.readStream.schema(batch.schema).format("parquet").load(stage)
    )
    a = StreamsApp(spark, AppConfig())
    a.start(records=stream)
    yield a
    a.stop()


def test_passthrough_keeps_every_record(app):
    assert app.passthrough().count() == len(RECORDS)


def test_table_store_upserts_latest_per_key(app):
    table = {
        r.key: r.value
        for r in app.store("stream-converted-to-table").collect()
    }
    assert table == {
        "alpha": "alpha",
        "beta": "beta",
        "gamma": "GAMMA",
        "delta": "changed",
    }


def test_filtered_store_tombstones_broken_keys(app):
    filtered = {
        r.key: r.value
        for r in app.store("filtered-table-where-key-eq-value").collect()
    }
    # delta matched at ts=3 but its LATEST value ('changed') fails the
    # predicate -> the key must be ABSENT (tombstone), not stale.
    assert filtered == {"alpha": "alpha", "beta": "beta", "gamma": "GAMMA"}


def test_watch_scans_store(app, capsys):
    snaps = app.watch("stream-converted-to-table", iterations=1)
    assert len(snaps) == 1 and len(snaps[0]) == 4
    assert "[WATCH stream-converted-to-table] 4 keys" in capsys.readouterr().out
