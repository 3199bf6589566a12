"""Similarity search over embedding columns (SURVEY.md §2.B B22 +
ANN variants).

Three tiers, mirroring how a 100 TB vector pipeline is actually built:

1. ``b33_cosine_topk`` — exact brute-force cosine top-k, the
   correctness baseline (oracle-checked bit-exactly vs DuckDB thanks
   to sequential-fold dots, functions/vectors.py).
2. ``b34_ann_ivf_label`` — IVF-style partition pruning: probe only the
   coarse cell (here the ``label`` column stands in for the k-means
   cell id a real IVF build step would assign). Still oracle-checkable
   because the pruning is semantic, not probabilistic. At scale the
   win is reading one cell's bucket instead of the full corpus:
   partition the parquet by cell id and Spark prunes at the scan.
3. ``b35_ann_random_projection`` — LSH: 8 signed random projections
   -> 8-bit bucket -> candidates rerank. Probabilistic recall ->
   rows-only check. Bucket join replaces the n² pair space with
   O(n·bucket_size); planes are hash-derived so the signature is
   deterministic across executors with no broadcast state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kafka_streams_sandbox_spark.functions.vectors import dot, norm2, to_double_array
from kafka_streams_sandbox_spark.registry import query

DIM = 64


def _vectors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """embeddings with widened double array + precomputed norm
    (catalog.embeddings_wide handles the partition widening — see its
    docstring for the single-file-scan rationale).

    Degenerate rows are excluded up front: NULL embeddings (failed
    upstream encode), wrong-dimension arrays (schema drift), all-zero
    vectors (norm 0 — cosine undefined), and NaN/Inf components
    (norm NaN/Inf). The ``0 < nrm < Inf`` form covers all of the last
    three in one predicate because Spark and DuckDB both order NaN
    above every double (NaN < Inf is false). At corpus scale these
    rows otherwise crash the job or rank as NaN phantom neighbors —
    NaN sorts FIRST under cos_sim DESC, so one bad vector would
    occupy the top-k of every bucket-mate query
    (tests/test_hostile_vectors.py)."""
    from kafka_streams_sandbox_spark.catalog import embeddings_wide

    return (
        embeddings_wide(spark, sf_dir)
        .filter(F.col("embedding").isNotNull() & (F.size("embedding") == DIM))
        .select(
            "vec_id",
            "label",
            to_double_array("embedding").alias("e"),
        )
        .withColumn("nrm", norm2("e"))
        .filter((F.col("nrm") > 0) & (F.col("nrm") < F.lit(float("inf"))))
    )


# DuckDB twin of the widened/normed/guarded vector table.
_DUCK_VECTORS = f"""
    SELECT * FROM (
        SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS e,
               sqrt(list_aggregate(list_transform(CAST(embedding AS DOUBLE[]),
                                                  x -> x * x), 'sum')) AS nrm
        FROM embeddings
        WHERE embedding IS NOT NULL AND len(embedding) = {DIM}
    ) WHERE nrm > 0 AND nrm < 'infinity'::DOUBLE
"""


# ---------------------------------------------------------------------------
# B22: exact brute-force cosine top-k
# ---------------------------------------------------------------------------
B33_ORACLE = f"""
    WITH v AS ({_DUCK_VECTORS}),
    q AS (SELECT * FROM v WHERE vec_id % 10 = 0),
    pairs AS (
        SELECT q.vec_id AS query_id, v.vec_id AS neighbor_id,
               (list_aggregate(list_transform(range(1, {DIM + 1}),
                                              i -> q.e[i] * v.e[i]), 'sum')
                / (q.nrm * v.nrm)) AS cos_sim
        FROM q JOIN v ON v.vec_id != q.vec_id
    )
    SELECT query_id, neighbor_id, cos_sim, CAST(rnk AS BIGINT) AS rnk
    FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                       ORDER BY cos_sim DESC, neighbor_id) AS rnk
          FROM pairs)
    WHERE rnk <= 5
"""


@query("b33_cosine_topk", oracle=B33_ORACLE)
def b33_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-5 for every 10th vector against the corpus.

    The query side is tiny -> broadcast it; the corpus side streams
    (never materializes the n² pair matrix). At 100 TB: broadcast the
    query batch, one pass over the corpus, per-partition top-k then
    global top-k merge — exactly what this plan compiles to
    (broadcast join + WindowGroupLimit rank filter).
    """
    v = _vectors(spark, sf_dir)
    q = v.filter(F.col("vec_id") % 10 == 0).select(
        F.col("vec_id").alias("query_id"),
        F.col("e").alias("qe"),
        F.col("nrm").alias("qnrm"),
    )
    pairs = v.join(F.broadcast(q), F.col("vec_id") != F.col("query_id")).select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        (dot("qe", "e") / (F.col("qnrm") * F.col("nrm"))).alias("cos_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id")
    )
    return (
        pairs.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 5)
        .select("query_id", "neighbor_id", "cos_sim", F.col("rnk").cast("bigint"))
    )


# ---------------------------------------------------------------------------
# IVF-style ANN: probe only the coarse cell (label = cell id)
# ---------------------------------------------------------------------------
B34_ORACLE = f"""
    WITH v AS ({_DUCK_VECTORS}),
    pairs AS (
        SELECT q.vec_id AS query_id, v.vec_id AS neighbor_id, q.label AS cell,
               (list_aggregate(list_transform(range(1, {DIM + 1}),
                                              i -> q.e[i] * v.e[i]), 'sum')
                / (q.nrm * v.nrm)) AS cos_sim
        FROM v q JOIN v ON v.label = q.label AND v.vec_id != q.vec_id
    )
    SELECT query_id, neighbor_id, cell, cos_sim, CAST(rnk AS BIGINT) AS rnk
    FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                       ORDER BY cos_sim DESC, neighbor_id) AS rnk
          FROM pairs)
    WHERE rnk <= 3
"""


@query("b34_ann_ivf_label", oracle=B34_ORACLE)
def b34_ann_ivf_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF probe: search only vectors sharing the query's coarse cell.

    The equi-join on cell id is the whole trick: Spark shuffles both
    sides by cell (or broadcasts the smaller), so each task does a
    dense little brute-force within one cell. With parquet partitioned
    by cell id, non-probed cells are never read.

    Cost model — the cell count MUST scale with n (IVF doctrine:
    k ~ sqrt(n) centroids): in-cell rerank is sum(|cell|^2), so FIXED
    cells grow quadratically. The data's label column stands in for
    the coarse quantizer here (oracle-checkable: DuckDB runs the same
    join), and the 10x probe measured exactly the fixed-config trap:
    20k vectors over the SAME 10 labels took 349 s, while subdividing
    each label with b35's 8-plane hash bucket (10 x 256 cells — the
    same plan shape, one extra equi-join key) ran 14.2 s
    (BASELINE.md). Same configuration-must-scale class as
    b35@8planes; the remedy needs no new machinery — compose the
    label cell with the hash sub-bucket, or feed real k-means
    centroid ids in as `label`.
    """
    v = _vectors(spark, sf_dir)
    q = v.select(
        F.col("vec_id").alias("query_id"),
        F.col("label").alias("cell"),
        F.col("e").alias("qe"),
        F.col("nrm").alias("qnrm"),
    )
    # merge-pinned: both sides are the corpus-sized vector table.
    # Catalyst estimates scan sizes from FILE bytes, but float-array
    # rows balloon ~10-20x when built into a broadcast hash relation —
    # the round-4 100x probe OOMed b39_lsh's driver on that static
    # pick at 51 MB of parquet under the 64 MB threshold. SMJ spills.
    pairs = v.join(
        q.hint("merge"), (v.label == q.cell) & (v.vec_id != q.query_id)
    ).select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        "cell",
        (dot("qe", "e") / (F.col("qnrm") * F.col("nrm"))).alias("cos_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id")
    )
    return (
        pairs.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select(
            "query_id", "neighbor_id", "cell", "cos_sim", F.col("rnk").cast("bigint")
        )
    )


# ---------------------------------------------------------------------------
# Random-hyperplane LSH ANN (rows-only: probabilistic recall)
# ---------------------------------------------------------------------------
# 8 planes -> 256 buckets: sized so the test corpora (500-2000 vecs)
# actually collide; scale the bit count with log2(n) in production.
_N_PLANES = 8

# plane[j][i] derived from xxhash64 — deterministic everywhere, no
# driver-side state to broadcast. Components ~ uniform[-1, 1).
_PLANE_COMPONENT = (
    "CAST(pmod(xxhash64({j} * 64 + i), 1000) AS DOUBLE) / 500.0 - 1.0"
)

_SIGNATURE_EXPR = f"""
    aggregate(sequence(0, {_N_PLANES - 1}), 0,
        (acc, j) -> acc + CASE WHEN
            aggregate(zip_with(e, transform(sequence(0, 63),
                          i -> {_PLANE_COMPONENT.format(j="j")}),
                      (x, p) -> x * p),
                      CAST(0.0 AS DOUBLE), (s, x) -> s + x) > 0
            THEN CAST(pow(2, j) AS INT) ELSE 0 END)
"""


@query("b35_ann_random_projection")  # rows-only: LSH recall is probabilistic
def b35_ann_random_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sign-random-projection LSH: 8-bit signature buckets, exact
    cosine rerank inside each bucket, top-3 per query.

    Map-only signatures -> shuffle on the 8-bit bucket key -> small
    dense blocks. Expected bucket population n/256 keeps the rerank
    cheap at test scale; at larger corpora raise the plane count
    (bits) with the log of n.
    """
    v = _vectors(spark, sf_dir).withColumn("sig", F.expr(_SIGNATURE_EXPR))
    q = v.select(
        F.col("vec_id").alias("query_id"),
        F.col("sig").alias("qsig"),
        F.col("e").alias("qe"),
        F.col("nrm").alias("qnrm"),
    )
    # merge-pinned for the same reason as b34: corpus x corpus with
    # array columns must never ride a file-size-estimated broadcast.
    pairs = v.join(
        q.hint("merge"), (v.sig == q.qsig) & (v.vec_id != q.query_id)
    ).select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        (dot("qe", "e") / (F.col("qnrm") * F.col("nrm"))).alias("cos_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id")
    )
    return (
        pairs.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select("query_id", "neighbor_id", "cos_sim", F.col("rnk").cast("bigint"))
    )


@query("b91_ann_ivf_scaled_cells")  # rows-only: sub-bucket recall is
def b91_ann_ivf_scaled_cells(  # probabilistic (xxhash planes, no DuckDB twin)
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """b34's IVF with the cell count scaled the way production IVF
    demands: each coarse label cell is subdivided by b35's 8-plane
    hash bucket, so cells = |labels| x 256 and expected in-cell
    population stays flat as the corpus grows (raise the plane count
    with log2(n) exactly as b35 documents).

    This is the measured remedy for the fixed-config trap the late-r4
    sweep caught in b34 (BASELINE.md): the same 10x corpus that takes
    349 s over 10 fixed label cells runs in 14.2 s over 10 x 256 —
    identical plan shape (merge-pinned SMJ self-join, WindowGroupLimit
    top-3), one extra equi-join key. Recall within a label follows
    b35's bucket-collision odds; b34 stays the oracle-checked exact
    within-cell twin.
    """
    v = (
        _vectors(spark, sf_dir)
        .withColumn("sub", F.expr(_SIGNATURE_EXPR))
    )
    q = v.select(
        F.col("vec_id").alias("query_id"),
        F.col("label").alias("cell"),
        F.col("sub").alias("qsub"),
        F.col("e").alias("qe"),
        F.col("nrm").alias("qnrm"),
    )
    # merge-pinned: corpus x corpus with array columns (see b34).
    pairs = v.join(
        q.hint("merge"),
        (v.label == q.cell) & (v.sub == q.qsub) & (v.vec_id != q.query_id),
    ).select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        "cell",
        (dot("qe", "e") / (F.col("qnrm") * F.col("nrm"))).alias("cos_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id")
    )
    return (
        pairs.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select(
            "query_id",
            "neighbor_id",
            "cell",
            "cos_sim",
            F.col("rnk").cast("bigint"),
        )
    )
