"""Multi-format batch sources.

The catalog's native format is parquet (columnar, statistics,
pushdown — the only sane 100 TB format); these readers cover the
ingest boundary where data arrives as CSV/JSON/ORC before
normalization. Schemas are always explicit: ``inferSchema`` scans the
data twice and guesses types per-file — both disqualifying at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def read_csv(
    spark: SparkSession, path: str, schema: StructType, header: bool = True
) -> DataFrame:
    """CSV with explicit schema; malformed rows land in the
    ``_corrupt_record`` column instead of failing the job
    (PERMISSIVE), which is what an ingest pipeline wants — count
    them, don't die on them. PERMISSIVE only CAPTURES the raw line
    when the schema carries the corrupt column, so it is appended
    here if absent — without it a malformed row silently becomes
    all-NULLs, indistinguishable from legitimate null data."""
    from pyspark.sql.types import StringType, StructField

    if "_corrupt_record" not in schema.fieldNames():
        schema = StructType(
            list(schema.fields) + [StructField("_corrupt_record", StringType())]
        )
    return (
        spark.read.schema(schema)
        .option("header", str(header).lower())
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .csv(path)
    )


def read_json(
    spark: SparkSession, path: str, schema: StructType
) -> DataFrame:
    """JSON-lines with explicit schema (single parse, typed struct —
    the from_json discipline applied at the file boundary)."""
    return spark.read.schema(schema).json(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC: columnar like parquet, schema from file metadata; same
    pushdown/pruning machinery applies."""
    return spark.read.orc(path)
