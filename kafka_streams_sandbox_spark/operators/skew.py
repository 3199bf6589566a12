"""Skew-resistant salted JOIN (the join-side sibling of b50's salted
aggregation).

On a 1000-executor cluster a shuffle join dies when one join key holds
a disproportionate share of the fact side: every row of the hot key
lands on one reducer. Salting splits each hot key's rows across S
reducers by joining on (key, salt) — the dim side is replicated S
ways, the fact side picks a deterministic salt per row — trading an
S× blowup of the SMALL side for an S-way split of the hot key's rows
(b72_key_skew_report is the diagnostic that decides S). The join
output (and so the final aggregate) is byte-identical to the unsalted
join, which is exactly what the oracle checks.

Reference parity note: the reference sandbox (KStreamsToKTable.java)
has no joins; this is part of the mandated scale-technique layer with
b50 (salted agg) and b72 (skew diagnostics).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_streams_sandbox_spark.catalog import table
from kafka_streams_sandbox_spark.functions.numeric import (
    lsum_final,
    lsum_partial,
    sql_lsum,
)
from kafka_streams_sandbox_spark.registry import query

_SALTS = 8

B84_ORACLE = f"""
    SELECT c.c_mktsegment,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           {sql_lsum('e.value')} AS sum_value
    FROM events e JOIN customer c ON e.user_id = c.c_custkey
    GROUP BY 1
"""


@query("b84_salted_join", oracle=B84_ORACLE)
def b84_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events ⋈ customer on a salted key, aggregated per market
    segment — result identical to the plain join (oracle-checked).

    The shuffle_hash hint keeps the join a genuine two-sided shuffle
    (broadcast would hide what salting fixes); the fact side salts by
    event_id so a hot user's rows spread over ``_SALTS`` reducers; the
    dim side replicates each customer row ``_SALTS`` ways via a
    map-only inline(). The downstream aggregate uses the two-phase
    scaled-long exact sum, so the whole query stays on fast paths.
    """
    ev = table(spark, sf_dir, "events").select(
        "user_id",
        "value",
        F.pmod(F.col("event_id"), F.lit(_SALTS)).cast("int").alias("salt"),
    )
    cust = (
        table(spark, sf_dir, "customer")
        .select(
            F.col("c_custkey").alias("user_id"),
            "c_mktsegment",
            F.explode(F.sequence(F.lit(0), F.lit(_SALTS - 1))).alias("salt"),
        )
        .hint("shuffle_hash")
    )
    joined = ev.join(cust, ["user_id", "salt"])
    partials = joined.groupBy(
        "c_mktsegment", F.spark_partition_id().alias("__pid")
    ).agg(
        F.count(F.lit(1)).alias("_n"),
        lsum_partial("value").alias("_v"),
    )
    return partials.groupBy("c_mktsegment").agg(
        F.sum("_n").alias("n_events"),
        lsum_final("_v").alias("sum_value"),
    )
