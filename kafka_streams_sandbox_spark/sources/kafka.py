"""Kafka source/sink builders (the reference's native transport).

The reference reads ``input-test-topic`` from EARLIEST and produces to
three output topics (KStreamsToKTable.java:75-76, 100-104,
configuration/dev.properties:8-12). These builders produce the same
shapes on Spark's Kafka connector.

This container ships no Kafka broker *and* no spark-sql-kafka package,
so construction is gated: callers get a clear error instead of a
ClassNotFoundException mid-query. All pipeline logic is written
against the source-agnostic (key, value, timestamp) shape
(sources/replay.py), so enabling real Kafka is configuration, not
code.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class KafkaUnavailableError(RuntimeError):
    pass


def _check_kafka_available(spark: SparkSession) -> None:
    try:
        spark._jvm.java.lang.Class.forName(  # type: ignore[union-attr]
            "org.apache.spark.sql.kafka010.KafkaSourceProvider"
        )
    except Exception as exc:  # ClassNotFoundException via py4j
        raise KafkaUnavailableError(
            "spark-sql-kafka connector not on the classpath; add "
            "org.apache.spark:spark-sql-kafka-0-10_2.13 via spark.jars.packages "
            "and point bootstrap_servers at a broker"
        ) from exc


def kafka_stream(
    spark: SparkSession,
    topic: str,
    bootstrap_servers: str = "localhost:9092",
    starting_offsets: str = "earliest",
) -> DataFrame:
    """readStream twin of Consumed.with(String,String).EARLIEST
    (KStreamsToKTable.java:75): key/value cast to string + event time."""
    _check_kafka_available(spark)
    raw = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
        .load()
    )
    return raw.select(
        F.col("key").cast("string").alias("key"),
        F.col("value").cast("string").alias("value"),
        F.col("timestamp").alias("timestamp"),
    )


def kafka_sink_options(
    topic: str, bootstrap_servers: str = "localhost:9092"
) -> dict[str, str]:
    """writeStream options twin of Produced.with(String,String)
    (KStreamsToKTable.java:100-104)."""
    return {
        "kafka.bootstrap.servers": bootstrap_servers,
        "topic": topic,
    }
