"""A10 topic DDL semantics (AdminClient.createTopics analog)."""

from __future__ import annotations

from kafka_streams_sandbox_spark.streaming.ddl import (
    REFERENCE_TOPICS,
    TopicAdmin,
    TopicSpec,
)


def test_create_list_describe_roundtrip(tmp_path):
    admin = TopicAdmin(str(tmp_path / "topics"))
    specs = [TopicSpec(n, partitions=3, replication=1) for n in REFERENCE_TOPICS]
    assert sorted(admin.create_topics(specs)) == sorted(REFERENCE_TOPICS)
    assert admin.list_topics() == sorted(REFERENCE_TOPICS)
    d = admin.describe("input-test-topic")
    assert d == {"name": "input-test-topic", "partitions": 3, "replication": 1}


def test_recreate_is_idempotent(tmp_path):
    """TopicExistsException semantics: existing topics are skipped."""
    admin = TopicAdmin(str(tmp_path / "topics"))
    admin.create_topics([TopicSpec("t", partitions=5)])
    # re-create with a DIFFERENT spec: the original wins (exists = skip)
    assert admin.create_topics([TopicSpec("t", partitions=9)]) == []
    assert admin.describe("t")["partitions"] == 5


def test_delete_then_recreate(tmp_path):
    admin = TopicAdmin(str(tmp_path / "topics"))
    admin.create_topics([TopicSpec("t")])
    admin.delete_topic("t")
    assert not admin.exists("t")
    assert admin.list_topics() == []
    assert admin.create_topics([TopicSpec("t")]) == ["t"]


def test_a10_query_returns_reference_catalog(spark, sf_dir):
    from kafka_streams_sandbox_spark.registry import all_queries

    df = all_queries()["a10_topic_ddl"](spark, sf_dir)
    rows = {r.topic: (r.partitions, r.replication) for r in df.collect()}
    assert rows == {n: (3, 1) for n in REFERENCE_TOPICS}
