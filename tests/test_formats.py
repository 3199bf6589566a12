"""Format-boundary roundtrips: the same relation must survive
parquet -> {csv, json, orc} -> DataFrame with values intact, and the
columnar formats must keep predicate pushdown."""

from __future__ import annotations

from pyspark.sql import functions as F

from kafka_streams_sandbox_spark.plans.inspect import scans_with_pushed_filters
from kafka_streams_sandbox_spark.sources.formats import (
    read_csv,
    read_json,
    read_orc,
)


def _docs(spark, sf_dir):
    # text can contain arbitrary separators/newlines-in-quotes; the
    # roundtrip uses the scalar columns (csv would need quoting audit
    # for free-text — that's a parquet-stays-parquet argument, noted)
    return spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "lang", "source", "n_chars"
    )


def _assert_same(a, b, cols=("doc_id", "lang", "source", "n_chars")):
    sa = sorted(map(tuple, a.select(*cols).collect()))
    sb = sorted(map(tuple, b.select(*cols).collect()))
    assert sa == sb


def test_csv_roundtrip(spark, sf_dir, tmp_path):
    docs = _docs(spark, sf_dir)
    out = str(tmp_path / "docs_csv")
    docs.write.option("header", "true").csv(out)
    back = read_csv(spark, out, docs.schema)
    _assert_same(docs, back)


def test_json_roundtrip(spark, sf_dir, tmp_path):
    docs = _docs(spark, sf_dir)
    out = str(tmp_path / "docs_json")
    docs.write.json(out)
    back = read_json(spark, out, docs.schema)
    _assert_same(docs, back)


def test_orc_roundtrip_with_pushdown(spark, sf_dir, tmp_path):
    docs = _docs(spark, sf_dir)
    out = str(tmp_path / "docs_orc")
    docs.write.orc(out)
    back = read_orc(spark, out)
    _assert_same(docs, back)
    q = back.filter(F.col("n_chars") > 500).select("doc_id")
    assert scans_with_pushed_filters(q) >= 1


def test_schema_evolution_merge_on_read(spark, tmp_path):
    """Appended batches gain columns over time (every long-lived
    ingest does); mergeSchema reads must unify old and new footers
    with NULLs for the missing column — the contract that lets a
    100 TB table evolve without rewrite."""
    import pyspark.sql.functions as F

    path = str(tmp_path / "evolving")
    spark.createDataFrame(
        [(1, "a"), (2, "b")], "id long, payload string"
    ).write.parquet(path)
    spark.createDataFrame(
        [(3, "c", "en")], "id long, payload string, lang string"
    ).write.mode("append").parquet(path)
    df = spark.read.option("mergeSchema", "true").parquet(path)
    assert set(df.columns) == {"id", "payload", "lang"}
    rows = {r.id: r.lang for r in df.collect()}
    assert rows == {1: None, 2: None, 3: "en"}
