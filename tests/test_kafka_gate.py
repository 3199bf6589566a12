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


def test_avro_serde_gated_without_module(spark):
    """The schema'd record path (reference's declared Avro intent,
    build.gradle:29-32) gates cleanly when spark-avro is absent."""
    from kafka_streams_sandbox_spark.sources.avro import (
        AvroUnavailableError,
        records_from_avro,
        records_to_avro,
    )

    records = spark.createDataFrame(
        [("a", "1")], "key string, value string"
    )
    with pytest.raises(AvroUnavailableError, match="spark-avro"):
        records_to_avro(records)
    binary = spark.createDataFrame([("a", bytearray(b"x"))], "key string, value binary")
    with pytest.raises(AvroUnavailableError, match="spark-avro"):
        records_from_avro(binary)
