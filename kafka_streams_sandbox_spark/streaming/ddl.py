"""Topic DDL — the reference's AdminClient.createTopics analog (A10).

The reference provisions its four topics (1 input + 3 output) with
3 partitions / replication 1 before starting the streams app
(KStreamsToKTable.java:110-141; partition/RF values from
configuration/dev.properties:5-6), treating an already-existing topic
as success (the TopicExistsException catch at :135-139).

The Spark-native analog of a topic is a managed dataset location: a
directory plus a JSON manifest recording the declared partition count
(the sink's repartition/bucket target — what "3 partitions" means to
a Spark writer) and replication (carried for parity; durability is
the filesystem's job here). ``create_topics`` is idempotent exactly
like AdminClient: existing topics are skipped, not errors.

At 100 TB nothing changes: a "topic" is a table root on object
storage, the manifest is the metastore entry, and the partition count
seeds the sink's parallelism.
"""

from __future__ import annotations

import json
import os
import shutil
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

from kafka_streams_sandbox_spark.registry import query

from kafka_streams_sandbox_spark.session import scratch_dir

_MANIFEST = "_topic.json"

# The reference's four topics (KStreamsToKTable.java:110-118, names
# from configuration/dev.properties).
REFERENCE_TOPICS: tuple[str, ...] = (
    "input-test-topic",
    "streams-output-test-topic",
    "table-output-test-topic",
    "filtered-table-output-test-topic",
)


@dataclass(frozen=True)
class TopicSpec:
    """NewTopic(name, partitions, replicationFactor) analog."""

    name: str
    partitions: int = 3
    replication: int = 1


class TopicAdmin:
    """AdminClient analog over a managed root directory."""

    def __init__(self, root: str | None = None):
        self.root = root or scratch_dir("kss-topics-")
        os.makedirs(self.root, exist_ok=True)

    def _manifest_path(self, name: str) -> str:
        return os.path.join(self.root, name, _MANIFEST)

    def location(self, name: str) -> str:
        """Directory a sink writes this topic's data under."""
        return os.path.join(self.root, name)

    def exists(self, name: str) -> bool:
        return os.path.exists(self._manifest_path(name))

    def create_topics(self, specs: list[TopicSpec]) -> list[str]:
        """Provision topics; returns the names actually created.
        Existing topics are skipped (TopicExistsException semantics,
        KStreamsToKTable.java:135-139)."""
        created = []
        for spec in specs:
            if self.exists(spec.name):
                continue
            os.makedirs(self.location(spec.name), exist_ok=True)
            manifest = {
                "name": spec.name,
                "partitions": int(spec.partitions),
                "replication": int(spec.replication),
            }
            tmp = self._manifest_path(spec.name) + ".tmp"
            with open(tmp, "w") as fh:
                json.dump(manifest, fh)
            os.replace(tmp, self._manifest_path(spec.name))  # atomic
            created.append(spec.name)
        return created

    def list_topics(self) -> list[str]:
        return sorted(
            d
            for d in os.listdir(self.root)
            if os.path.exists(self._manifest_path(d))
        )

    def describe(self, name: str) -> dict:
        with open(self._manifest_path(name)) as fh:
            return json.load(fh)

    def delete_topic(self, name: str) -> None:
        """AdminClient.deleteTopics analog (manifest removal marks the
        topic gone; data files are the caller's retention problem,
        exactly like a broker's async log deletion)."""
        os.remove(self._manifest_path(name))


@query("a10_topic_ddl")
def a10_topic_ddl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Provision the reference's four topics on a fresh root and
    return the resulting catalog — the A10 surface as a query.

    Asserts the AdminClient contract in-query: all four create on a
    fresh root, re-creating is a no-op (idempotent), and describe
    round-trips the spec.
    """
    admin = TopicAdmin()
    try:
        specs = [TopicSpec(n) for n in REFERENCE_TOPICS]
        created = admin.create_topics(specs)
        assert sorted(created) == sorted(REFERENCE_TOPICS), created
        assert admin.create_topics(specs) == []  # idempotent re-create
        rows = []
        for name in admin.list_topics():
            d = admin.describe(name)
            rows.append((name, d["partitions"], d["replication"]))
    finally:
        # the result rows are driver-local; the mkdtemp root would
        # otherwise leak one directory per invocation (re-verify
        # loops, bench passes)
        shutil.rmtree(admin.root, ignore_errors=True)
    return spark.createDataFrame(
        rows, "topic string, partitions int, replication int"
    )
