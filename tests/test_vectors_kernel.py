"""Bit-exactness pins for the r13 stepwise cosine kernel
(functions/vectors.stepwise_cos_block) and the operators that moved
their pair-dot arithmetic onto it (b33's kernel form, b39, b94's
input). The optimization's correctness claim is EXACT double
equality with the r12 interpreted-fold plans, not closeness."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from kafka_streams_sandbox_spark.functions.vectors import (
    dot,
    stepwise_cos_block,
)
from kafka_streams_sandbox_spark.operators import similarity
from kafka_streams_sandbox_spark.operators.similarity import _vectors

SF = "/root/testdata/sf0.001"


def test_stepwise_cos_block_bit_equals_sql_fold(spark):
    """Every pairwise cosine from the numpy kernel matches the SQL
    sequential fold's double BIT FOR BIT on real fixture vectors."""
    rows = _vectors(spark, SF).collect()
    assert rows, "fixture must provide vectors"
    v = spark.createDataFrame(rows)
    a = v.select(
        F.col("vec_id").alias("ia"), F.col("e").alias("ea"),
        F.col("nrm").alias("na"),
    )
    b = v.select(
        F.col("vec_id").alias("ib"), F.col("e").alias("eb"),
        F.col("nrm").alias("nb"),
    )
    ref = (
        a.join(F.broadcast(b), F.col("ia") < F.col("ib"))
        .select("ia", "ib", (dot("ea", "eb") / (F.col("na") * F.col("nb"))).alias("cos"))
        .toPandas()
    )
    ids = [int(r.vec_id) for r in rows]
    pos = {x: k for k, x in enumerate(ids)}
    mat = np.array([r.e for r in rows], dtype=np.float64)
    nrm = np.array([r.nrm for r in rows], dtype=np.float64)
    cos = stepwise_cos_block(mat, nrm, mat, nrm)
    ka = np.array([pos[int(x)] for x in ref["ia"]], dtype=np.int64)
    kb = np.array([pos[int(x)] for x in ref["ib"]], dtype=np.int64)
    mine = cos[ka, kb]
    theirs = ref["cos"].to_numpy(dtype=np.float64)
    assert len(theirs) > 100
    assert (mine == theirs).all(), "kernel must be bit-identical to the fold"


def _canon(df):
    pdf = df.toPandas()
    return pdf.sort_values(list(pdf.columns)).reset_index(drop=True)


def test_b33_kernel_form_equals_fold_form(spark, monkeypatch):
    """b33's two density-adaptive physical forms return row-identical
    results (values AND ranks) — the threshold is a pure plan switch."""
    import pandas as pd

    monkeypatch.setattr(similarity, "_B33_FOLD_MAX_ROWS", 1 << 40)
    fold = _canon(similarity.b33_cosine_topk(spark, SF))
    monkeypatch.setattr(similarity, "_B33_FOLD_MAX_ROWS", 0)
    kern = _canon(similarity.b33_cosine_topk(spark, SF))
    assert len(fold) > 0
    pd.testing.assert_frame_equal(fold, kern)


def test_b39_kernel_equals_fold_join(spark):
    """b39's kernel output matches the r12 broadcast-join + fold plan
    it replaced, row for row (ids and cosine doubles)."""
    import pandas as pd

    from kafka_streams_sandbox_spark.catalog import embeddings_wide
    from kafka_streams_sandbox_spark.functions.vectors import (
        norm2,
        to_double_array,
    )
    from kafka_streams_sandbox_spark.operators import dedup

    kern = _canon(dedup.b39_embedding_neardup(spark, SF))

    emb = (
        embeddings_wide(spark, SF)
        .filter(
            F.col("embedding").isNotNull()
            & (F.size("embedding") == dedup._EMB_DIM)
        )
        .select("vec_id", to_double_array("embedding").alias("e"))
        .withColumn("nrm", norm2("e"))
        .filter((F.col("nrm") > 0) & (F.col("nrm") < F.lit(float("inf"))))
    )
    a = emb.select(
        F.col("vec_id").alias("vec_a"), F.col("e").alias("ea"),
        F.col("nrm").alias("na"),
    )
    b = emb.select(
        F.col("vec_id").alias("vec_b"), F.col("e").alias("eb"),
        F.col("nrm").alias("nb"),
    )
    fold = _canon(
        a.join(F.broadcast(b), F.col("vec_a") < F.col("vec_b"))
        .select(
            "vec_a", "vec_b",
            (dot("ea", "eb") / (F.col("na") * F.col("nb"))).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= dedup._NEARDUP_COS)
    )
    assert len(fold) > 0
    pd.testing.assert_frame_equal(fold, kern)
