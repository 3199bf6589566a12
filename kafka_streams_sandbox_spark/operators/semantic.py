"""Semantic twins of the reference topology + event analytics (B16–B20).

The reference's core semantics (KStreamsToKTable.java):
- ``stream.toTable(...)`` — latest-value-per-key upsert
  (KStreamsToKTable.java:78-81) → batch form B17 here; streaming form
  in streaming/ktable.py.
- ``table.filter(k equalsIgnoreCase v)`` *on the table, after the
  upsert* (KStreamsToKTable.java:87-98) → B18. Operator order is the
  semantic point: a key whose *latest* value fails the predicate must
  be absent even if an earlier value passed (SURVEY.md §4.1) — so the
  filter must NOT be pushed below the latest-by-key reduction.
  Catalyst respects this (it won't push a filter on non-grouping
  columns through a window-rank), and the tests pin it.

Plus driver-mandated event analytics: JSON extraction (B16), tumbling
windows (B19), gap sessionization (B20).

Scale notes: all three stateful shapes partition by ``user_id`` — one
shuffle each, state bounded per key. At 100 TB the latest-per-key
window-rank is Spark's ``WindowGroupLimit``-optimized path (rank
filter pushed into the window operator, no full materialization).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kafka_streams_sandbox_spark.catalog import table
from kafka_streams_sandbox_spark.functions.numeric import (
    dsum,
    lsum_final,
    lsum_partial,
    sql_dsum,
    sql_lsum,
)
from kafka_streams_sandbox_spark.registry import query


# --------------------------------------------------------------------------
# B16: JSON extraction from a string column (events.props)
# --------------------------------------------------------------------------
B16_ORACLE = f"""
    SELECT CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_val,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           {sql_lsum('value', 6)} AS sum_value
    FROM events
    GROUP BY 1
"""


@query("b16_json_extract", oracle=B16_ORACLE)
def b16_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """get_json_object stays JVM-side (Jackson) — no Python UDF; at
    scale prefer from_json with an explicit schema once the shape is
    known (single parse, typed struct, prunable)."""
    ev = table(spark, sf_dir, "events")
    return (
        ev.withColumn(
            "k_val", F.get_json_object("props", "$.k").cast("int")
        )
        .groupBy("k_val", F.spark_partition_id().alias("__pid"))
        .agg(
            F.count(F.lit(1)).alias("_n"),
            lsum_partial("value", 6).alias("_sv"),
        )
        .groupBy("k_val")
        .agg(
            F.sum("_n").alias("n_events"),
            lsum_final("_sv", 6).alias("sum_value"),
        )
    )


# --------------------------------------------------------------------------
# B17: latest event per user — batch form of KStream.toTable (A2)
# --------------------------------------------------------------------------
B17_ORACLE = """
    SELECT user_id, event_id, ts, event_type, value
    FROM (
        SELECT user_id, event_id, ts, event_type, value,
               ROW_NUMBER() OVER (PARTITION BY user_id
                                  ORDER BY ts DESC, event_id DESC) AS rn
        FROM events
    ) WHERE rn = 1
"""


def latest_per_key(
    df: DataFrame, key: str = "user_id", ts: str = "ts", tiebreak: str = "event_id"
) -> DataFrame:
    """Changelog-table semantics: keep the latest row per key.

    Batch twin of KStream.toTable (KStreamsToKTable.java:78-81); the
    streaming twin (update-mode max_by agg) lives in streaming/ktable.
    row_number + rank-filter compiles to WindowGroupLimit: per-
    partition top-1 is computed during the sort, not after.
    """
    w = Window.partitionBy(key).orderBy(F.col(ts).desc(), F.col(tiebreak).desc())
    return df.withColumn("__rn", F.row_number().over(w)).filter(
        F.col("__rn") == 1
    ).drop("__rn")


@query("b17_latest_per_user", oracle=B17_ORACLE)
def b17_latest_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    return latest_per_key(ev).select(
        "user_id", "event_id", "ts", "event_type", "value"
    )


# --------------------------------------------------------------------------
# B18: key==value filter AFTER the latest-by-key upsert (A4 batch form)
# --------------------------------------------------------------------------
B18_ORACLE = """
    SELECT user_id, event_id, event_type, k, v
    FROM (
        SELECT user_id, event_id, event_type,
               CAST(user_id % 3 AS VARCHAR) AS k,
               CAST(CAST(FLOOR(value) AS BIGINT) % 3 AS VARCHAR) AS v,
               ROW_NUMBER() OVER (PARTITION BY user_id
                                  ORDER BY ts DESC, event_id DESC) AS rn
        FROM events
    ) WHERE rn = 1 AND LOWER(k) = LOWER(v)
"""


@query("b18_table_filter_key_eq_value", oracle=B18_ORACLE)
def b18_table_filter_key_eq_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Case-insensitive key==value predicate on the *table*, mirroring
    KTable.filter (KStreamsToKTable.java:87-98). Filter runs after
    latest_per_key — on the latest row per user, never on raw events
    (the §4.1 ordering subtlety). FLOOR (not int-cast) for the derived
    value digit: double->int casts truncate in Spark but round in
    DuckDB, so FLOOR is the cross-engine-exact choice."""
    ev = table(spark, sf_dir, "events")
    latest = latest_per_key(ev)
    keyed = latest.select(
        "user_id",
        "event_id",
        "event_type",
        (F.col("user_id") % 3).cast("string").alias("k"),
        (F.floor("value").cast("bigint") % 3).cast("string").alias("v"),
    )
    return keyed.filter(F.lower("k") == F.lower("v"))


# --------------------------------------------------------------------------
# B19: tumbling-window aggregation (5-minute windows)
# --------------------------------------------------------------------------
B19_ORACLE = f"""
    SELECT make_timestamp((CAST(FLOOR(epoch_us(ts) / 300000000) AS BIGINT)) * 300000000)
               AS window_start,
           event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           {sql_dsum('value', 6)} AS sum_value
    FROM events
    GROUP BY 1, 2
"""


@query("b19_tumbling_window_agg", oracle=B19_ORACLE)
def b19_tumbling_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F.window tumbling buckets (epoch-aligned, same origin as the
    oracle's epoch_us floor). The streaming twin adds a watermark; the
    bucketing expression is identical."""
    ev = table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "5 minutes").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dsum("value", 6).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


# --------------------------------------------------------------------------
# B20: gap-based sessionization (30-minute inactivity gap)
# --------------------------------------------------------------------------
B20_ORACLE = """
    WITH flagged AS (
        SELECT user_id, ts, event_id,
               CASE WHEN LAG(ts) OVER w IS NULL
                         OR ts - LAG(ts) OVER w > INTERVAL 30 MINUTE
                    THEN 1 ELSE 0 END AS new_session
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), numbered AS (
        SELECT user_id, ts,
               CAST(SUM(new_session) OVER (PARTITION BY user_id
                                           ORDER BY ts, event_id) AS BIGINT)
                   AS session_id
        FROM flagged
    )
    SELECT user_id, session_id,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           MIN(ts) AS session_start,
           MAX(ts) AS session_end
    FROM numbered
    GROUP BY user_id, session_id
"""


@query("b20_sessionization", oracle=B20_ORACLE)
def b20_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sessionization: lag -> new-session flag -> running sum as
    session id -> per-session agg. One shuffle on user_id, reused by
    both windows and the final agg (sessions nest inside users). The
    streaming twin is F.session_window (streaming/ktable.py)."""
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    flagged = ev.withColumn(
        "new_session",
        F.when(
            F.lag("ts").over(w).isNull()
            | (F.col("ts") - F.lag("ts").over(w) > F.expr("INTERVAL 30 MINUTES")),
            1,
        ).otherwise(0),
    )
    numbered = flagged.withColumn(
        "session_id", F.sum("new_session").over(w).cast("bigint")
    )
    return numbered.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
    )
