"""Avro record serde builders (the reference's declared-but-unused
schema path).

The reference depends on avro 1.10.1 + the Confluent Kafka Streams
Avro serde and provisions a Schema Registry container
(build.gradle:29-32, docker-compose.yaml:34-45, registry URL at
configuration/dev.properties:3) — but no .avsc and no Avro serde ever
appears in its code; the implementation stops at String/String
(KStreamsToKTable.java:46,60-61). These builders close that mapping
on Spark: ``from_avro``/``to_avro`` over the same (key, value) record
shape, so swapping the string serde for the schema'd one is one call
on either side of the pipeline.

This container ships pyspark without the spark-avro module (the
core avro jars are present, the SQL data source is not), so
construction is gated exactly like the Kafka transport
(sources/kafka.py): callers get a clear environment error instead of
an AnalysisException mid-query.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame

# The schema the reference's Schema Registry *would* hold for its
# console-producer ``key:value`` messages — a string-valued record,
# nullable so a null value stays a tombstone through serde
# (KTable upsert semantics; see streaming/ktable.py).
RECORD_VALUE_SCHEMA = json.dumps(
    {
        "type": "record",
        "name": "SandboxValue",
        "namespace": "sandbox",
        "fields": [{"name": "value", "type": ["null", "string"]}],
    }
)


class AvroUnavailableError(RuntimeError):
    pass


def _check_avro_available(df: DataFrame) -> None:
    spark = df.sparkSession
    try:
        spark._jvm.java.lang.Class.forName(  # type: ignore[union-attr]
            "org.apache.spark.sql.avro.AvroDataToCatalyst"
        )
    except Exception as exc:  # ClassNotFoundException via py4j
        raise AvroUnavailableError(
            "spark-avro module not on the classpath; add "
            "org.apache.spark:spark-avro_2.13 via spark.jars.packages "
            "to enable the schema'd record path"
        ) from exc


def records_to_avro(
    records: DataFrame, value_schema: str = RECORD_VALUE_SCHEMA
) -> DataFrame:
    """(key string, value string, ...) -> (key, value binary) with the
    value Avro-encoded — the producer-side serde swap the reference's
    build.gradle declares."""
    _check_avro_available(records)
    from pyspark.sql import functions as F
    from pyspark.sql.avro.functions import to_avro

    wrapped = records.withColumn("_rec", F.struct(F.col("value").alias("value")))
    return wrapped.select(
        "key",
        to_avro("_rec", value_schema).alias("value"),
        *[c for c in records.columns if c not in ("key", "value")],
    )


def records_serde_roundtrip(records: DataFrame) -> tuple[DataFrame, str]:
    """Encode then decode the (key, value) records through the schema'd
    value serde; returns ``(decoded, codec)``.

    Uses real Avro (``to_avro``/``from_avro``) when spark-avro is on
    the classpath. In this container it is not, so the GATE FALLBACK
    runs the identical plumbing — wrap the nullable value in a record
    struct, serialize to a ``binary`` column, deserialize back —
    through Spark's JSON codec instead of Avro. The fallback is not a
    stub: it exercises the same null-tombstone-through-serde and
    schema-projection semantics; swapping the codec back is the one
    line the gate error names.
    """
    try:
        return records_from_avro(records_to_avro(records)), "avro"
    except AvroUnavailableError:
        from pyspark.sql import functions as F

        others = [c for c in records.columns if c not in ("key", "value")]
        encoded = records.withColumn(
            "_rec", F.struct(F.col("value").alias("value"))
        ).select(
            "key", F.to_json("_rec").cast("binary").alias("value"), *others
        )
        decoded = encoded.withColumn(
            "_rec",
            F.from_json(F.col("value").cast("string"), "value string"),
        ).select("key", F.col("_rec.value").alias("value"), *others)
        return decoded, "json-fallback"


def records_from_avro(
    records: DataFrame, value_schema: str = RECORD_VALUE_SCHEMA
) -> DataFrame:
    """(key, value binary) -> (key, value string, ...): consumer-side
    serde, tolerant of a null/corrupt payload (mode PERMISSIVE maps it
    to a null value = tombstone)."""
    _check_avro_available(records)
    from pyspark.sql.avro.functions import from_avro

    decoded = records.withColumn(
        "_rec",
        from_avro("value", value_schema, {"mode": "PERMISSIVE"}),
    )
    return decoded.select(
        "key",
        decoded["_rec.value"].alias("value"),
        *[c for c in records.columns if c not in ("key", "value")],
    )
