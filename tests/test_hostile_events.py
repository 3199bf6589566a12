"""Hostile-input robustness for the event-reading batch family.

A real event stream at scale carries NULL keys (anonymous users), NULL
timestamps (producer bugs), NULL/malformed JSON payloads, and exact
(user, ts) collisions. The batch event queries must complete and keep
their per-group invariants in their presence.
"""

from __future__ import annotations

import datetime as dt

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from kafka_streams_sandbox_spark.operators import semantic
from kafka_streams_sandbox_spark.operators.extended import (
    b41_pivot_event_counts,
    b51_sliding_window_agg,
    b90_time_grid_fill,
)

_T0 = dt.datetime(2024, 1, 1)


def _ev(eid, minutes, user, etype, value, props):
    ts = _T0 + dt.timedelta(minutes=minutes) if minutes is not None else None
    return (eid, ts, user, etype, value, props)


_EVENTS = [
    _ev(0, 0.0, 1, "view", 1.0, '{"k": 1}'),
    _ev(1, 1.0, 1, "click", 2.0, '{"k": 2}'),
    _ev(2, 2.0, 2, "view", 3.0, "not json at all"),
    _ev(3, 3.0, 2, "purchase", 4.0, None),
    _ev(4, 4.0, None, "view", 5.0, '{"k": 5}'),  # anonymous user
    _ev(5, None, 3, "view", 6.0, '{"k": 6}'),  # NULL event time
    _ev(6, 5.0, 3, None, 7.0, '{"broken": '),  # NULL type + truncated JSON
    _ev(7, 5.0, 3, "click", 8.0, "{}"),  # exact ts collision with eid 6
    _ev(8, 125.0, 1, "view", None, '{"k": null}'),  # NULL value, JSON null
    _ev(9, 125.0, 1, "view", 9.0, "[1,2,3]"),  # JSON array, ts collision
]


@pytest.fixture(scope="module")
def hostile_events_dir(tmp_path_factory) -> str:
    tmp = tmp_path_factory.mktemp("hostile_events")
    table = pa.table(
        {
            "event_id": pa.array([e[0] for e in _EVENTS], pa.int64()),
            "ts": pa.array([e[1] for e in _EVENTS], pa.timestamp("us")),
            "user_id": pa.array([e[2] for e in _EVENTS], pa.int64()),
            "event_type": pa.array([e[3] for e in _EVENTS], pa.string()),
            "value": pa.array([e[4] for e in _EVENTS], pa.float64()),
            "props": pa.array([e[5] for e in _EVENTS], pa.string()),
        }
    )
    pq.write_table(table, str(tmp / "events.parquet"))
    return str(tmp)


def test_latest_per_user_hostile(spark, hostile_events_dir):
    rows = semantic.b17_latest_per_user(spark, hostile_events_dir).collect()
    # one winner per user including the NULL-user group; ties and NULL
    # ts must not produce duplicate or missing winners
    users = [r["user_id"] for r in rows]
    assert len(users) == len(set(users)) == 4  # users 1, 2, 3 and NULL


def test_table_filter_hostile(spark, hostile_events_dir):
    # must complete; the key==value predicate is NULL-safe
    semantic.b18_table_filter_key_eq_value(spark, hostile_events_dir).collect()


def test_tumbling_window_hostile(spark, hostile_events_dir):
    rows = semantic.b19_tumbling_window_agg(spark, hostile_events_dir).collect()
    assert rows
    for r in rows:
        assert r["n_events"] >= 1


def test_sessionization_hostile(spark, hostile_events_dir):
    rows = semantic.b20_sessionization(spark, hostile_events_dir).collect()
    assert rows
    # session ids stay dense positive integers per user despite NULL
    # ts rows and exact-ts collisions
    for r in rows:
        assert r["session_id"] >= 1


def test_pivot_hostile(spark, hostile_events_dir):
    rows = b41_pivot_event_counts(spark, hostile_events_dir).collect()
    assert rows


def test_hopping_window_hostile(spark, hostile_events_dir):
    rows = b51_sliding_window_agg(spark, hostile_events_dir).collect()
    assert rows


def test_time_grid_fill_null_ts_never_carries(spark, hostile_events_dir):
    """A NULL-ts event (eid 5) must never fill a grid point: Spark
    sorts NULLs FIRST under ASC while the DuckDB oracle sorts them
    LAST, so carrying it would be a silent engine-parity divergence
    (ADVICE r4). b90 drops NULL-ts events before the union; user 3's
    only other events are at 00:05, after its 00:00 grid instant, so
    that grid row must stay unfilled."""
    rows = b90_time_grid_fill(spark, hostile_events_dir).collect()
    assert rows
    assert all(r["filled_from_id"] != 5 for r in rows)
    u3 = [r for r in rows if r["user_id"] == 3]
    assert len(u3) == 1 and u3[0]["filled_from_id"] is None
