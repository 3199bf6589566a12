"""Registry-wide driver-canonicalizer safety (r8, VERDICT r7 #1/#8).

The round driver canonicalizes every query result with a RAW pandas
sort over all columns before value-hashing. That sort cannot hash
numpy arrays, so an ``array<...>``-typed output column errors the
driver row even when the query itself is correct — exactly how
a31_stream_pq_encode produced the only red row in CORRECTNESS_r07
while passing every local check (the local compare tuple-izes lists;
the driver does not).

This module closes the class, not the instance: EVERY registered
query runs at sf0.001 and its result must (a) carry only scalar
top-level columns and (b) round-trip ``oracle.driver_canon`` — the
strict replica of the driver's sort — without raising. New queries
are covered automatically (parametrize reads the registry).
"""

from __future__ import annotations

import pytest
from pyspark.sql.types import ArrayType, MapType, StructType

from kafka_streams_sandbox_spark.oracle import driver_canon
from kafka_streams_sandbox_spark.registry import all_queries

SF = "/root/testdata/sf0.001"

_QUERIES = all_queries()

# complex top-level types arrive in pandas as numpy arrays / dicts /
# Row objects — none of which the driver's raw sort can hash
_FORBIDDEN = (ArrayType, MapType, StructType)


@pytest.mark.parametrize("name", sorted(_QUERIES))
def test_driver_canonicalizer_roundtrip(spark, name):
    df = _QUERIES[name](spark, SF)
    complex_cols = [
        f.name for f in df.schema.fields if isinstance(f.dataType, _FORBIDDEN)
    ]
    assert not complex_cols, (
        f"{name} returns driver-unhashable column(s) {complex_cols}: "
        "explode or serialize them (a31's (vec_id, pos, code) fix)"
    )
    # the real gate: the driver's exact sort must not raise
    driver_canon(df.toPandas())
