"""Bucketed co-located joins: the storage-layout lever for repeated
big-table joins at 100 TB.

Writing both sides bucketed by the join key (same bucket count) lets
Spark plan a sort-merge join with NO Exchange on either side — the
shuffle happened once at write time and every subsequent join reuses
it. This test pins that plan property end-to-end through a real
``bucketBy`` write + metastore read."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kafka_streams_sandbox_spark.plans.inspect import (
    count_shuffles,
    plan_string,
)


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir, tmp_path_factory):
    warehouse = tmp_path_factory.mktemp("warehouse")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    lineitem = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    # external tables with explicit paths — the session's (static)
    # warehouse dir is untouched
    for name, df, key in (
        ("orders_b", orders, "o_orderkey"),
        ("lineitem_b", lineitem, "l_orderkey"),
    ):
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        (
            df.write.bucketBy(8, key)
            .sortBy(key)
            .option("path", str(warehouse / name))
            .saveAsTable(name)
        )
    yield "orders_b", "lineitem_b"
    for name in ("orders_b", "lineitem_b"):
        spark.sql(f"DROP TABLE IF EXISTS {name}")


def test_bucketed_join_has_no_exchange(spark, bucketed_tables):
    """orders ⋈ lineitem on the bucketing key: no shuffle Exchange on
    either join side — the join runs on the co-located buckets written
    once. (Broadcast is disabled for the check: at test scale the
    small side would auto-broadcast, which hides the property this
    pins — at 100 TB neither side broadcasts and the bucket layout is
    exactly what saves the shuffle.)"""
    orders_b, lineitem_b = bucketed_tables
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = (
            spark.table(orders_b)
            .join(
                spark.table(lineitem_b),
                F.col("o_orderkey") == F.col("l_orderkey"),
            )
            .groupBy("o_orderstatus")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        plan = plan_string(joined)
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan, plan
        # the join itself must not shuffle either side; the only
        # exchange allowed is the one for the final tiny groupBy
        assert count_shuffles(joined) <= 1, plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_bucketed_join_matches_unbucketed(spark, sf_dir, bucketed_tables):
    orders_b, lineitem_b = bucketed_tables
    bucketed = (
        spark.table(orders_b)
        .join(
            spark.table(lineitem_b),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        .count()
    )
    plain = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .join(
            spark.read.parquet(f"{sf_dir}/lineitem.parquet"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        .count()
    )
    assert bucketed == plain
