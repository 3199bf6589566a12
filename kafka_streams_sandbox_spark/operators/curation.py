"""Corpus-curation operators: canonical selection by quality, stopword
pruning, context-length distribution, embedding-space outliers.

These extend the training-data pipeline layer (SURVEY.md §2,
LLM-data-pipeline block) past dedup/sampling into the policy steps a
curation run applies after clustering: which duplicate to KEEP (not
just which cluster a doc is in — that's b60), what vocabulary to
prune, how context lengths distribute against a packing budget, and
which documents sit far from their language's embedding centroid
(mislabeled-language / off-distribution candidates).

Reference parity note: the reference sandbox (KStreamsToKTable.java)
has no curation layer; these operators are part of the mandated
"operations a large-scale training-data pipeline would need".

Determinism contract (cross-engine value hashes): counts and ranks are
integer-exact; every floating result is either a single division of
exactly-computed integers or the shared sequential-fold vector math in
``functions/vectors.py``. Centroids accumulate as scaled longs
(functions/numeric.py rationale), so partitioning never changes a
result bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kafka_streams_sandbox_spark.catalog import table
from kafka_streams_sandbox_spark.functions.tokens import TOKENS_EXPR
from kafka_streams_sandbox_spark.functions.vectors import (
    dot,
    norm2,
    to_double_array,
)
from kafka_streams_sandbox_spark.registry import query
from kafka_streams_sandbox_spark.session import lazy_checkpoint

_DIM = 64  # embeddings table dimension (TESTDATA.md)

# Shared recursive-CTE cluster labeling (the b55/b60 oracle shape):
# duplicate components over exact token-set fingerprints.
_CLUSTERS_CTE = """
    fp AS (
        SELECT doc_id,
               md5(array_to_string(list_sort(list_distinct(
                   list_filter(regexp_split_to_array(trim(text), '\\s+'),
                               t -> t != ''))), ' ')) AS fingerprint
        FROM documents
    ),
    pairs AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM fp a JOIN fp b
          ON a.fingerprint = b.fingerprint AND a.doc_id < b.doc_id
    ),
    edges AS (
        SELECT doc_a AS src, doc_b AS dst FROM pairs
        UNION SELECT doc_b, doc_a FROM pairs
    ),
    reach(node, label) AS (
        SELECT DISTINCT src, src FROM edges
        UNION
        SELECT e.src, r.label
        FROM edges e JOIN reach r ON e.dst = r.node
    ),
    clusters AS (
        SELECT node AS doc_id, MIN(label) AS cluster_id
        FROM reach GROUP BY node
    )
"""


# ---------------------------------------------------------------------------
# B78: keep-best-in-cluster — canonical selection by QUALITY, not id
# ---------------------------------------------------------------------------
B78_ORACLE = f"""
    WITH RECURSIVE {_CLUSTERS_CTE},
    best AS (
        SELECT cluster_id, doc_id AS keep_id
        FROM (
            SELECT c.cluster_id, c.doc_id,
                   ROW_NUMBER() OVER (
                       PARTITION BY c.cluster_id
                       ORDER BY d.n_chars DESC, c.doc_id) AS rn
            FROM clusters c JOIN documents d USING (doc_id)
        ) WHERE rn = 1
    )
    SELECT d.doc_id,
           CAST(COALESCE(b.keep_id, d.doc_id) AS BIGINT) AS keep_id,
           (COALESCE(b.keep_id, d.doc_id) = d.doc_id) AS is_kept
    FROM documents d
    LEFT JOIN clusters c USING (doc_id)
    LEFT JOIN best b USING (cluster_id)
"""


@query("b78_keep_best_in_cluster", oracle=B78_ORACLE)
def b78_keep_best_in_cluster(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical selection by QUALITY: inside each duplicate cluster
    keep the longest document (n_chars desc, doc_id tiebreak) — the
    standard curation policy — where b60 keeps the min-id one.

    Plan: b55's cluster labeling (pairs-sized, not corpus-sized) joins
    doc lengths, one WindowGroupLimit rank per cluster picks the
    keeper, and the corpus left-joins the (cluster -> keeper) map.
    No forced broadcast anywhere: the labeling is 30-50% of a real
    crawl corpus (b60's r2 lesson) — AQE picks the join strategy.
    """
    from kafka_streams_sandbox_spark.operators.extended import (
        b55_dedup_clusters,
    )

    docs = table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    clusters = b55_dedup_clusters(spark, sf_dir)
    w = Window.partitionBy("cluster_id").orderBy(
        F.col("n_chars").desc(), F.col("doc_id")
    )
    best = (
        clusters.join(docs, "doc_id")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("cluster_id", F.col("doc_id").alias("keep_id"))
    )
    return (
        docs.join(clusters, "doc_id", "left")
        .join(best, "cluster_id", "left")
        .select(
            "doc_id",
            F.coalesce("keep_id", "doc_id").alias("keep_id"),
            (F.coalesce("keep_id", "doc_id") == F.col("doc_id")).alias(
                "is_kept"
            ),
        )
    )


# ---------------------------------------------------------------------------
# B79: corpus stopword discovery + per-doc pruning stats
# ---------------------------------------------------------------------------
_SW_FRAC_NUM, _SW_FRAC_DEN = 1, 2  # stopword: df > 1/2 of the corpus

B79_ORACLE = f"""
    WITH tf AS (
        SELECT doc_id, t AS term, CAST(COUNT(*) AS BIGINT) AS n
        FROM (
            SELECT doc_id,
                   unnest(list_filter(regexp_split_to_array(trim(text),
                                                            '\\s+'),
                                      t -> t != '')) AS t
            FROM documents
        )
        GROUP BY 1, 2
    ),
    n AS (SELECT COUNT(*) AS n_docs FROM documents),
    sw AS (
        SELECT term FROM tf GROUP BY term
        HAVING COUNT(*) * {_SW_FRAC_DEN} > {_SW_FRAC_NUM} * (
            SELECT n_docs FROM n)
    )
    SELECT tf.doc_id,
           CAST(SUM(tf.n) AS BIGINT) AS n_tokens,
           CAST(SUM(CASE WHEN sw.term IS NULL THEN tf.n ELSE 0 END)
                AS BIGINT) AS n_kept,
           (CAST(SUM(CASE WHEN sw.term IS NULL THEN tf.n ELSE 0 END)
                 AS DOUBLE) / SUM(tf.n)) AS kept_ratio
    FROM tf LEFT JOIN sw USING (term)
    GROUP BY tf.doc_id
"""


@query("b79_stopword_prune", oracle=B79_ORACLE)
def b79_stopword_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level stopword discovery (document frequency above a
    fraction threshold) plus the per-document pruning stats a token
    budget planner reads: total tokens, tokens surviving the prune,
    survival ratio.

    Same single-shuffle skeleton as b58's TF-IDF: one (doc, term)
    aggregation, lineage-cut so the corpus tokenizes once, feeding
    BOTH the df side and the per-doc side. The stopword set is
    broadcast-safe *by construction* at any corpus size: each member
    has df > N/2, so |stopwords| < 2 x avg_doc_tokens — bounded by
    document length, independent of corpus row count (unlike b58's
    full vocabulary, which needs min-df pruning).
    """
    docs = table(spark, sf_dir, "documents")
    n_docs = docs.count()  # parquet footer metadata, no data scan
    tf = (
        docs.select("doc_id", F.explode(F.expr(TOKENS_EXPR)).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("n"))
        .transform(lambda d: lazy_checkpoint(d, disk=False))
    )
    stop = (
        tf.groupBy("term")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") * _SW_FRAC_DEN > _SW_FRAC_NUM * n_docs)
        .select("term", F.lit(True).alias("_sw"))
    )
    kept_n = F.sum(F.when(F.col("_sw").isNull(), F.col("n")).otherwise(0))
    return (
        tf.join(F.broadcast(stop), "term", "left")
        .groupBy("doc_id")
        .agg(
            F.sum("n").alias("n_tokens"),
            kept_n.alias("n_kept"),
            (kept_n.cast("double") / F.sum("n")).alias("kept_ratio"),
        )
    )


# ---------------------------------------------------------------------------
# B80: context-length histogram + CDF against a packing budget
# ---------------------------------------------------------------------------
_BIN_W = 8  # tokens per histogram bin

B80_ORACLE = f"""
    WITH lens AS (
        SELECT (CAST(FLOOR(CAST(len(list_filter(
                   regexp_split_to_array(trim(text), '\\s+'),
                   t -> t != '')) AS DOUBLE) / {_BIN_W}) AS BIGINT)
                * {_BIN_W}) AS bin_lo
        FROM documents
    ),
    hist AS (
        SELECT bin_lo, CAST(COUNT(*) AS BIGINT) AS n_docs
        FROM lens GROUP BY bin_lo
    )
    SELECT bin_lo, n_docs,
           CAST(SUM(n_docs) OVER (ORDER BY bin_lo) AS BIGINT) AS cum_docs,
           (CAST(SUM(n_docs) OVER (ORDER BY bin_lo) AS DOUBLE)
            / SUM(n_docs) OVER ()) AS cdf
    FROM hist
"""


@query("b80_context_length_cdf", oracle=B80_ORACLE)
def b80_context_length_cdf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-count histogram with fixed-width bins plus the running
    CDF — the distribution a sequence-packing/truncation budget is set
    against ("what fraction of docs fit in K tokens?").

    Plan: map-only token count -> one shuffle to |bins| rows (partial
    agg compresses per partition) -> windows over the bin table. The
    unpartitioned window is over BIN rows, whose count is bounded by
    max document length / bin width — independent of corpus size, so
    the single-partition window stage is constant work at 100 TB.
    """
    docs = table(spark, sf_dir, "documents")
    n_tok = F.size(F.expr(TOKENS_EXPR))
    hist = (
        docs.select(
            (
                F.floor(n_tok.cast("double") / _BIN_W).cast("bigint")
                * _BIN_W
            ).alias("bin_lo")
        )
        .groupBy("bin_lo")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )
    w_cum = Window.orderBy("bin_lo").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    w_all = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return hist.select(
        "bin_lo",
        "n_docs",
        F.sum("n_docs").over(w_cum).alias("cum_docs"),
        (
            F.sum("n_docs").over(w_cum).cast("double")
            / F.sum("n_docs").over(w_all)
        ).alias("cdf"),
    )


# ---------------------------------------------------------------------------
# B81: per-language centroid outliers in embedding space
# ---------------------------------------------------------------------------
_CSCALE = 10**7  # centroid component scaling (exact long accumulation)
_OUTLIER_K = 10

B81_ORACLE = f"""
    WITH v AS (
        SELECT * FROM (
            SELECT d.doc_id, d.lang, CAST(e.embedding AS DOUBLE[]) AS e,
                   sqrt(list_aggregate(list_transform(
                        CAST(e.embedding AS DOUBLE[]), x -> x * x), 'sum'))
                       AS enrm
            FROM documents d JOIN embeddings e ON e.vec_id = d.doc_id
            WHERE e.embedding IS NOT NULL AND len(e.embedding) = {_DIM}
        ) WHERE enrm > 0 AND enrm < 'infinity'::DOUBLE
    ),
    comp AS (
        SELECT lang, pos,
               SUM(CAST(ROUND(val * {_CSCALE}.0) AS BIGINT)) AS sq,
               COUNT(*) AS n
        FROM (
            SELECT lang, unnest(e) AS val,
                   unnest(range(1, len(e) + 1)) AS pos
            FROM v
        )
        GROUP BY lang, pos
    ),
    cent AS (
        SELECT lang,
               list(CAST(sq AS DOUBLE) / ({_CSCALE}.0 * n)
                    ORDER BY pos) AS c
        FROM comp GROUP BY lang
    ),
    scored AS (
        SELECT v.doc_id, v.lang,
               (list_aggregate(list_transform(range(1, {_DIM} + 1),
                                              i -> v.e[i] * c.c[i]), 'sum')
                / (v.enrm
                   * sqrt(list_aggregate(list_transform(c.c, x -> x * x),
                                         'sum')))) AS cos_sim
        FROM v JOIN cent c USING (lang)
    )
    SELECT lang, doc_id, cos_sim, CAST(rnk AS BIGINT) AS rnk
    FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY lang
                                       ORDER BY cos_sim, doc_id) AS rnk
          FROM scored)
    WHERE rnk <= {_OUTLIER_K}
"""


@query("b81_lang_centroid_outliers", oracle=B81_ORACLE)
def b81_lang_centroid_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space outlier detection: cosine similarity of every
    document to its language's mean vector; the K least-similar per
    language are the mislabeled-language / off-distribution review
    queue.

    Centroids are EXACT: components accumulate as scaled longs per
    (lang, dim) — integer addition is associative, so any partitioning
    yields bit-identical centroids (the lsum rationale,
    functions/numeric.py) — then one deterministic double division.
    Doc-to-centroid cosine reuses the sequential-fold vector contract
    (functions/vectors.py). Scale shape: the posexplode widens rows
    x DIM but map-side partial agg compresses to |langs x DIM x
    partitions| before the shuffle; the centroid table is |langs| rows
    — bounded by the language set, safely broadcast; one corpus pass
    scores, WindowGroupLimit keeps K per language.
    """
    docs = table(spark, sf_dir, "documents").select("doc_id", "lang")
    # the family-wide degenerate-vector guard (similarity._vectors):
    # NULL / wrong-dim / zero-norm / NaN- or Inf-component embeddings
    # would otherwise poison the centroid sums AND claim the rnk=1
    # outlier slots with NULL cos_sim (Spark sorts NULLs first ASC,
    # DuckDB last — an oracle divergence on top of the wrong answer)
    from kafka_streams_sandbox_spark.functions.vectors import (
        guarded_norm_rows,
    )

    # e/enrm computed once per row behind Generate barriers — the
    # plain withColumn+filter form re-derived the interpreted norm
    # fold 3x per row (guide §4.4 class; see guarded_norm_rows)
    emb = guarded_norm_rows(
        table(spark, sf_dir, "embeddings").select(
            F.col("vec_id").alias("doc_id"), "embedding"
        ),
        ["doc_id"],
        dim=_DIM,
    ).withColumnsRenamed({"nrm": "enrm"})
    v = docs.join(emb, "doc_id")
    comp = (
        v.select("lang", F.posexplode("e").alias("pos", "val"))
        .groupBy("lang", "pos")
        .agg(
            F.sum(
                F.round(F.col("val") * F.lit(float(_CSCALE))).cast("bigint")
            ).alias("sq"),
            F.count(F.lit(1)).alias("n"),
        )
    )
    cent = (
        comp.select(
            "lang",
            F.struct(
                "pos",
                (
                    F.col("sq").cast("double")
                    / (F.lit(float(_CSCALE)) * F.col("n"))
                ).alias("c"),
            ).alias("pc"),
        )
        .groupBy("lang")
        .agg(
            F.expr("transform(array_sort(collect_list(pc)), s -> s.c)").alias(
                "c"
            )
        )
        .withColumn("cnrm", norm2("c"))
    )
    scored = v.join(F.broadcast(cent), "lang").select(
        "lang",
        "doc_id",
        (dot("e", "c") / (F.col("enrm") * F.col("cnrm"))).alias("cos_sim"),
    )
    w = Window.partitionBy("lang").orderBy("cos_sim", "doc_id")
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= _OUTLIER_K)
        .select("lang", "doc_id", "cos_sim", F.col("rnk").cast("bigint"))
    )


# ---------------------------------------------------------------------------
# B85: corpus-novelty scoring — hapax-bigram ratio per document
# ---------------------------------------------------------------------------
B85_ORACLE = """
    WITH toks AS (
        SELECT doc_id,
               list_filter(regexp_split_to_array(trim(text), '\\s+'),
                           t -> t != '') AS toks
        FROM documents
    ),
    bg AS (
        SELECT doc_id,
               unnest(list_transform(range(1, len(toks)),
                                     i -> toks[i] || ' ' || toks[i+1]))
                   AS bigram
        FROM toks WHERE len(toks) >= 2
    ),
    freq AS (
        SELECT bigram, CAST(COUNT(*) AS BIGINT) AS n
        FROM bg GROUP BY 1
    )
    SELECT b.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_bigrams,
           CAST(COUNT(*) FILTER (WHERE f.n = 1) AS BIGINT) AS n_hapax,
           CAST(COUNT(*) FILTER (WHERE f.n = 1) AS DOUBLE) / COUNT(*)
               AS novelty
    FROM bg b JOIN freq f USING (bigram)
    GROUP BY b.doc_id
"""


@query("b85_novel_bigram_ratio", oracle=B85_ORACLE)
def b85_novel_bigram_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-novelty score: the fraction of a document's bigrams that
    are corpus-hapax (appear exactly once corpus-wide). High ratio =
    novel phrasing worth keeping; near-zero = boilerplate / template
    text — the integer-exact stand-in for LM-perplexity novelty
    filters (no float logs, so cross-engine hash-exact).

    Scale shape: ONE tokenize pass emits (doc_id, bigram) map-only;
    corpus frequency arrives as an unordered COUNT window partitioned
    by bigram — the same bigram-keyed shuffle a count+self-join would
    pay, but the emission is neither recomputed nor joined (a
    self-join of generated data re-runs its whole subtree); the
    per-doc rollup is the only other shuffle. No driver-side state,
    no broadcast of unbounded vocabulary.
    """
    from kafka_streams_sandbox_spark.catalog import documents_wide

    docs = documents_wide(spark, sf_dir)
    bg = (
        docs.select("doc_id", F.expr(TOKENS_EXPR).alias("toks"))
        .filter(F.size("toks") >= 2)
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    "transform(sequence(1, size(toks) - 1), "
                    "i -> concat(element_at(toks, i), ' ', "
                    "element_at(toks, i + 1)))"
                )
            ).alias("bigram"),
        )
    )
    n = F.count(F.lit(1)).over(Window.partitionBy("bigram"))
    hapax = F.when(n == 1, F.lit(1)).otherwise(F.lit(0))
    return (
        bg.select("doc_id", hapax.alias("_hx"))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.sum("_hx").cast("long").alias("n_hapax"),
        )
        .withColumn(
            "novelty",
            F.col("n_hapax").cast("double") / F.col("n_bigrams"),
        )
    )
