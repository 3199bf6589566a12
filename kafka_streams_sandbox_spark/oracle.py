"""Local oracle comparison harness — a faithful stand-in for the driver.

Runs a registered Spark query and its DuckDB oracle SQL on the same
parquet files, then compares row count, column names, and exact values
order-insensitively (columns sorted by name, rows sorted by all
columns) — the same shape as the driver's value-hash check, but with
readable diffs for local iteration.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

import duckdb
import pandas as pd
from pyspark.sql import SparkSession

from kafka_streams_sandbox_spark.catalog import TABLES
from kafka_streams_sandbox_spark.registry import all_oracles, all_queries


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    """Connection with every table pre-registered as a view (as the
    driver does, __spark_entry__.py docstring)."""
    con = duckdb.connect()
    for name in TABLES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM '{sf_dir}/{name}.parquet'"
        )
    return con


def driver_canon(df: pd.DataFrame) -> pd.DataFrame:
    """The round driver's canonicalization, replicated STRICTLY:
    columns sorted by name, then rows sorted by ALL columns with a
    raw pandas sort — NO list->tuple coercion. ``_normalize`` below
    is deliberately more lenient (it tuple-izes list cells so local
    diffs stay readable), which is exactly how a31's ``array<int>``
    output column passed every local check and still landed the one
    red row in CORRECTNESS_r07: the driver's raw sort cannot hash the
    numpy arrays Spark's toPandas produces for array columns. Every
    registered query must round-trip through THIS function without
    raising (scripts/verify_contract.py + tests/test_canonicalizer.py
    enforce it, r8 VERDICT r7 #1/#8)."""
    df = df[sorted(df.columns)]
    if len(df.columns):
        df = df.sort_values(by=list(df.columns), kind="mergesort")
    return df.reset_index(drop=True)


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for col in df.columns:
        s = df[col]
        if pd.api.types.is_datetime64_any_dtype(s):
            df[col] = pd.to_datetime(s).astype("datetime64[us]")
        elif s.dtype == object:
            df[col] = s.map(lambda v: tuple(v) if isinstance(v, (list, tuple)) else v)
    if len(df.columns):
        df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(
            drop=True
        )
    return df


@dataclass
class CompareResult:
    name: str
    ok: bool
    spark_rows: int
    oracle_rows: int
    detail: str = ""
    mismatches: list[Any] = field(default_factory=list)
    # the query's UN-normalized pandas result, for the driver-strict
    # canon round-trip (driver_canon) without a second Spark run
    spark_raw: pd.DataFrame | None = None


def compare_query(
    spark: SparkSession, sf_dir: str, name: str, max_mismatch: int = 5
) -> CompareResult:
    queries, oracles = all_queries(), all_oracles()
    raw = queries[name](spark, sf_dir).toPandas()
    sdf = _normalize(raw)
    con = duckdb_connection(sf_dir)
    try:
        odf = _normalize(con.execute(oracles[name]).fetchdf())
    finally:
        con.close()

    if len(sdf) != len(odf):
        return CompareResult(name, False, len(sdf), len(odf), "row count mismatch")
    if list(sdf.columns) != list(odf.columns):
        return CompareResult(
            name,
            False,
            len(sdf),
            len(odf),
            f"columns: spark={list(sdf.columns)} oracle={list(odf.columns)}",
        )
    mismatches = []
    for col in sdf.columns:
        a, b = sdf[col], odf[col]
        neq = ~((a == b) | (a.isna() & b.isna()))
        if neq.any():
            idx = neq[neq].index[:max_mismatch]
            mismatches.append(
                (col, [(int(i), a[i], b[i]) for i in idx], int(neq.sum()))
            )
    if mismatches:
        return CompareResult(
            name, False, len(sdf), len(odf), "value mismatch", mismatches
        )
    return CompareResult(name, True, len(sdf), len(odf), spark_raw=raw)
