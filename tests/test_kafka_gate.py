"""The Kafka transport is configuration, not code: without the
connector jar the builders must fail with a clear gate error, never a
mid-query ClassNotFoundException."""

import pytest

from kafka_streams_sandbox_spark.sources.kafka import (
    KafkaUnavailableError,
    kafka_sink_options,
    kafka_stream,
)


def test_kafka_stream_gated_without_connector(spark):
    with pytest.raises(KafkaUnavailableError, match="spark-sql-kafka"):
        kafka_stream(spark, "input-test-topic")


def test_kafka_sink_options_shape():
    opts = kafka_sink_options("table-output", "broker:9092")
    assert opts == {
        "kafka.bootstrap.servers": "broker:9092",
        "topic": "table-output",
    }
