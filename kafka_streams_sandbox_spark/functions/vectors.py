"""Vector math over ArrayType(Float/Double) columns.

Determinism contract: dot products / norms are *sequential* left-fold
sums (SQL ``aggregate``), which both Spark and DuckDB evaluate in
element order — so cosine values are bit-identical across engines and
across cluster sizes. A BLAS-backed matmul (pandas UDF path) is faster
per pair but sums in SIMD-blocked order; it exists as the explicitly
non-oracle variant (b44).

r13 optimization round adds ``stepwise_cos_block``: a numpy kernel
that keeps the EXACT fold rounding sequence (so it stays on the
oracle path) while vectorizing across pairs — the dimension loop runs
in Python, the pair axis in numpy. Interpreted SQL higher-order
lambdas cost ~1-2 us per element-op (HOFs are CodegenFallback);
measured 11.3 s for 79,800 pair-dots vs 0.04 s for the stepwise
kernel on identical sf0.1 data with zero double mismatches.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def to_double_array(col: str) -> Column:
    """array<float> -> array<double> (one exact widening per element)."""
    return F.expr(f"transform({col}, x -> CAST(x AS DOUBLE))")


def norm2(col: str) -> Column:
    """L2 norm of a double-array column, sequential sum."""
    return F.expr(
        f"sqrt(aggregate({col}, CAST(0.0 AS DOUBLE), (acc, x) -> acc + x * x))"
    )


def dot(a: str, b: str) -> Column:
    """Sequential-fold dot product of two double-array columns."""
    return F.expr(
        f"aggregate(zip_with({a}, {b}, (x, y) -> x * y),"
        " CAST(0.0 AS DOUBLE), (acc, x) -> acc + x)"
    )


def guarded_norm_rows(df, keep_cols, emb_col: str = "embedding", dim: int = 64):
    """``(keep_cols..., e, nrm)`` with the standard degenerate-vector
    guard (NULL / wrong-dim dropped at the scan; 0 < nrm < Inf), where
    ``e`` (the double-widened array) and ``nrm`` (the sequential-fold
    L2 norm) are each computed exactly ONCE per row.

    r13 optimization (guide §4.4's duplicated-derived-column class):
    the plain ``withColumn("nrm", norm2("e")).filter(...)`` form lets
    CollapseProject + predicate inlining re-derive the whole
    64-element interpreted fold once per filter conjunct PLUS once in
    the projection — the executed scan Filter carried TWO
    ``SQRT(aggregate(transform(...)))`` trees and the Project a third,
    each also re-running the e-transform (captured in
    plans/r13/b39_before.txt). Generate barriers fix it the same way
    b27's text-carry verify does: Projects and pushed predicates do
    not collapse across a Generate, so ``explode(array(expr))`` makes
    the expr a generated ATTRIBUTE its consumers reference instead of
    re-deriving (plans/r13/b35_after.txt: one fold, one transform).
    Row-for-row identical output — explode of a 1-element array is an
    identity on rows, values, and order of the kept columns.
    """
    base = df.filter(
        F.col(emb_col).isNotNull() & (F.size(emb_col) == dim)
    )
    return (
        base.select(
            *keep_cols, F.explode(F.array(to_double_array(emb_col))).alias("e")
        )
        .select(*keep_cols, "e", F.explode(F.array(norm2("e"))).alias("nrm"))
        .filter((F.col("nrm") > 0) & (F.col("nrm") < F.lit(float("inf"))))
    )


def stepwise_cos_block(a_mat, a_nrm, b_mat, b_nrm):
    """(len_a x len_b) cosine matrix, bit-identical to the SQL
    ``dot(a, b) / (nrm_a * nrm_b)`` fold (and therefore to the DuckDB
    oracle's ``list_aggregate`` sum) — numpy inputs, numpy output.

    Exactness argument, op for op against the SQL fold:
    - ``zip_with(a, b, (x, y) -> x * y)`` rounds each product once;
      ``np.multiply.outer(a[:, i], b[:, i])`` performs the same
      IEEE-754 double multiply per pair (numpy never fuses into FMA —
      multiply and add are separate ufunc calls).
    - the fold ``(acc, x) -> acc + x`` adds element products LEFT TO
      RIGHT; the ``acc += term_i`` loop below adds dimension i's
      product to the running sum in the same order, one rounded IEEE
      add per step. Elementwise SIMD lanes are independent pairs —
      no reassociation within a pair's sum.
    - ``dot / (na * nb)``: one rounded multiply then one rounded
      divide, mirrored exactly.
    So every output double is the bit pattern the JVM fold produces
    (pinned by tests/test_vectors_kernel.py on real fixture data).
    Vectorizing the PAIR axis while looping the 64-dim axis in Python
    is what makes this ~100-300x cheaper per pair than the
    interpreted HOF (HOFs are CodegenFallback: ~1-2 us/element-op).

    DOT-OVERFLOW IS OUT OF CONTRACT (ADVICE r13 low): if a 64-term
    dot OVERFLOWS to +-Inf/NaN while both norms still pass the
    0 < nrm < Inf guard (needs |components| ~ 1.3e154), the kernel
    callers' selection semantics diverge from the JVM fold's — Spark
    orders NaN above +Inf and NaN >= threshold is true, while numpy
    NaN comparisons are false and the isfinite self-pair masks drop
    +Inf too. The guard bounds every REAL embedding corpus far below
    that range (finite norm => components < ~1.3e154 individually,
    and fixture/production vectors are O(1)); adversarial vectors
    engineered to overflow the dot but not the norm are documented
    out of contract rather than masked around.
    """
    import numpy as np

    acc = np.zeros((a_mat.shape[0], b_mat.shape[0]))
    for i in range(a_mat.shape[1]):
        acc += np.multiply.outer(a_mat[:, i], b_mat[:, i])
    return acc / np.multiply.outer(a_nrm, b_nrm)
