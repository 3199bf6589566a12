"""Batch sinks: partitioned/bucketed parquet output.

The reference's sinks are Kafka topics (KStreamsToKTable.java:100-104;
streaming twins in streaming/). A batch engine also needs durable
columnar output whose LAYOUT carries the optimization: partition
directories prune at the scan, in-file sort tightens row-group
statistics so min/max skipping works.

Scale notes: choose partition columns with bounded cardinality (lang:
5 dirs — good; doc_id: millions of dirs — catastrophic for the file
listing). ``maxRecordsPerFile`` bounds file size instead of
``repartition(1)``-style collapses that serialize the write.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_by: list[str],
    sort_within: list[str] | None = None,
    mode: str = "overwrite",
    max_records_per_file: int = 1_000_000,
) -> None:
    """Write parquet partitioned by directory, optionally sorted
    within partitions (tight row-group min/max stats -> predicate
    skipping inside each file)."""
    out = df
    if sort_within:
        out = out.sortWithinPartitions(*sort_within)
    (
        out.write.mode(mode)
        .option("maxRecordsPerFile", max_records_per_file)
        .partitionBy(*partition_by)
        .parquet(path)
    )


def read_partitioned(spark: SparkSession, path: str) -> DataFrame:
    """Read a partitioned dataset; filters on partition columns prune
    directories before any file is opened (PartitionFilters in the
    scan, distinct from PushedFilters which skip row groups)."""
    return spark.read.parquet(path)
