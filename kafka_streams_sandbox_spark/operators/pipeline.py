"""Training-data pipeline operators beyond the dedup/similarity core:
deterministic splits and samples (b57 train/holdout, b64 stratified,
b67 domain mixture), TF-IDF term scoring (b58), funnel analysis
(b59), canonical-document assignment (b60), contamination checking
(b62), repetition scoring (b63), int8 embedding quantization (b65),
SCD2 dimension history (b66), incremental ingest dedup (b68), quality
gates (b69, shared with the a25 stream twin), bigram LM counts (b70),
and the composed curation funnel (b71).

These are the pieces a 100 TB LLM data pipeline runs between
ingestion and training. Recurring design rules: every sampling/split
decision is a pure function of the record id (reproducible, append-
stable, no sampling state); per-doc scoring is map-only JVM
expressions (zero Python UDFs on any hot path); corpus-vs-batch
operations broadcast the small side and never reshuffle the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kafka_streams_sandbox_spark.catalog import documents_wide, table
from kafka_streams_sandbox_spark.functions.tokens import (
    DUCK_TRIGRAMS_EXPR,
    TOKENS_EXPR,
    TRIGRAMS_EXPR,
    token_set_fingerprint,
)
from kafka_streams_sandbox_spark.registry import query
from kafka_streams_sandbox_spark.session import lazy_checkpoint, scratch_dir

# ---------------------------------------------------------------------------
# B57: deterministic train/holdout split (hash-bucketed sampling)
# ---------------------------------------------------------------------------
# 256 buckets from the first two hex chars of md5(doc_id); < 230 ≈ 89.8%
# train. Content-independent id hashing keeps the split stable under
# re-partitioning, re-ordering, and incremental appends — the property
# rand()/sample() lacks (their results depend on partitioning, so a
# re-run on a different cluster layout silently reshuffles the split).
_SPLIT_BUCKETS_TRAIN = 230

B57_ORACLE = f"""
    WITH bucketed AS (
        SELECT doc_id, lang,
               16 * (strpos('0123456789abcdef',
                            substring(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1)
               + (strpos('0123456789abcdef',
                         substring(md5(CAST(doc_id AS VARCHAR)), 2, 1)) - 1)
                   AS bucket
        FROM documents
    )
    SELECT CASE WHEN bucket < {_SPLIT_BUCKETS_TRAIN}
                THEN 'train' ELSE 'holdout' END AS split,
           lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(MIN(doc_id) AS BIGINT) AS min_doc_id
    FROM bucketed
    GROUP BY 1, 2
"""


@query("b57_train_holdout_split", oracle=B57_ORACLE)
def b57_train_holdout_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ~90/10 train/holdout split: bucket = first two hex
    chars of md5(doc_id). Map-only assignment (the aggregate here just
    summarizes it per split × lang for verification); at 100 TB the
    split column is written once and partitions the training read —
    no sampling state, no seed coordination, stable under appends.
    """
    docs = table(spark, sf_dir, "documents")
    bucket = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2), 16, 10
    ).cast("int")
    split = F.when(bucket < _SPLIT_BUCKETS_TRAIN, "train").otherwise("holdout")
    return (
        docs.select(split.alias("split"), "lang", "doc_id")
        .groupBy("split", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("doc_id").alias("min_doc_id"),
        )
    )


# ---------------------------------------------------------------------------
# B58: TF-IDF top terms per document
# ---------------------------------------------------------------------------
# idf is the smoothed RATIO (N+1)/(df+1) rather than its logarithm:
# integer-derived IEEE division is bit-identical across engines where
# ln() (libm vs JVM StrictMath) need not be — and log is monotone, so
# per-document term ranking by tf·(N+1)/(df+1) equals ranking by
# tf-weighted log-idf whenever tf ties break the same way (they break
# on the term string here, in both engines).
_B58_TOPK = 3

B58_ORACLE = f"""
    WITH tokens AS (
        SELECT doc_id, unnest(list_filter(
                   regexp_split_to_array(trim(text), '\\s+'),
                   t -> t != '')) AS term
        FROM documents
    ),
    tf AS (
        SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
        FROM tokens GROUP BY doc_id, term
    ),
    df AS (
        SELECT term, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df FROM tf GROUP BY term
    ),
    n AS (SELECT COUNT(*) AS n_docs FROM documents),
    scored AS (
        SELECT tf.doc_id, tf.term, tf.tf, df.df,
               tf.tf * (CAST(n.n_docs + 1 AS DOUBLE) / (df.df + 1)) AS score
        FROM tf JOIN df USING (term) CROSS JOIN n
    )
    SELECT doc_id, term, tf, df, score, CAST(rnk AS BIGINT) AS rnk
    FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
                                       ORDER BY score DESC, term) AS rnk
          FROM scored)
    WHERE rnk <= {_B58_TOPK}
"""


@query("b58_tfidf_top_terms", oracle=B58_ORACLE)
def b58_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{k} characteristic terms per document by tf·idf.

    Plan: N = docs.count() (parquet footer metadata, no data scan) ->
    explode tokens -> (doc, term) counts (ONE shuffle, map-side
    combined) -> lineage-cut tf reused for BOTH per-term df (plain
    COUNT over the already-distinct (doc, term) rows) and the scoring
    join -> broadcast df back onto tf -> WindowGroupLimit top-k per
    doc. The corpus-sized data shuffles once; the vocabulary (bounded,
    Zipf-small relative to the corpus) is what broadcasts. N counts
    ALL documents, like the oracle. At 100 TB cap the vocabulary by
    min-df pruning before the broadcast.
    """
    from kafka_streams_sandbox_spark.catalog import table_rowcount

    docs = table(spark, sf_dir, "documents")
    # N = corpus size — the session-cached footer-metadata count
    # (identical to docs.count(); r14 saves the repeated one-job
    # count per invocation, the b35 table_rowcount idiom).
    n_docs = table_rowcount(spark, sf_dir, "documents")
    tokens = docs.select(
        "doc_id", F.explode(F.expr(TOKENS_EXPR)).alias("term")
    )
    tf = tokens.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    # tf feeds BOTH the df aggregate and the scoring join; without a
    # lineage cut the corpus would be tokenized + shuffled twice (the
    # oracle's CTE materializes once too). localCheckpoint persists the
    # post-shuffle tf partitions node-local — checkpoint() on a real
    # cluster; the corpus-sized data still crosses the wire exactly
    # once. tf is already one row per (doc, term), so per-term df is a
    # plain COUNT — no countDistinct expand.
    tf = lazy_checkpoint(tf, disk=False)
    df = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    scored = tf.join(F.broadcast(df), "term").select(
        "doc_id",
        "term",
        "tf",
        "df",
        (
            F.col("tf")
            * (F.lit(float(n_docs + 1)) / (F.col("df") + F.lit(1)))
        ).alias("score"),
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("score").desc(), "term")
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= _B58_TOPK)
        .select(
            "doc_id", "term", "tf", "df", "score", F.col("rnk").cast("bigint")
        )
    )


# ---------------------------------------------------------------------------
# B59: funnel conversion (view -> click -> purchase, in order)
# ---------------------------------------------------------------------------
B59_ORACLE = """
    WITH per_user AS (
        SELECT user_id,
               MIN(CASE WHEN event_type = 'view' THEN ts END) AS first_view,
               MIN(CASE WHEN event_type = 'click' THEN ts END) AS first_click,
               MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS first_purchase
        FROM events GROUP BY user_id
    ),
    flags AS (
        SELECT user_id,
               (first_view IS NOT NULL) AS s1,
               (first_view IS NOT NULL AND first_click > first_view) AS s2,
               (first_view IS NOT NULL AND first_click > first_view
                AND first_purchase > first_click) AS s3
        FROM per_user
    )
    SELECT step, n_users FROM (
        SELECT 1 AS ord, 'view' AS step,
               CAST(COUNT(*) FILTER (WHERE s1) AS BIGINT) AS n_users FROM flags
        UNION ALL
        SELECT 2, 'view>click',
               CAST(COUNT(*) FILTER (WHERE s2) AS BIGINT) FROM flags
        UNION ALL
        SELECT 3, 'view>click>purchase',
               CAST(COUNT(*) FILTER (WHERE s3) AS BIGINT) FROM flags
    ) ORDER BY ord
"""


@query("b59_funnel_conversion", oracle=B59_ORACLE)
def b59_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel: users who viewed, then clicked after viewing,
    then purchased after clicking (first-touch timestamps).

    One shuffle: conditional MIN aggregation per user computes all
    three first-touch times in a single pass (no self-joins, no
    per-step scans); the step counts fold to three rows. NULL
    comparisons propagate NULL -> false in both engines.
    """
    ev = table(spark, sf_dir, "events")
    first = lambda t: F.min(  # noqa: E731
        F.when(F.col("event_type") == t, F.col("ts"))
    )
    per_user = ev.groupBy("user_id").agg(
        first("view").alias("first_view"),
        first("click").alias("first_click"),
        first("purchase").alias("first_purchase"),
    )
    s1 = F.col("first_view").isNotNull()
    s2 = s1 & (F.col("first_click") > F.col("first_view"))
    s3 = s2 & (F.col("first_purchase") > F.col("first_click"))
    flags = per_user.select(
        s1.alias("s1"), s2.alias("s2"), s3.alias("s3")
    )
    counts = flags.agg(
        F.count(F.when(F.col("s1"), 1)).alias("n1"),
        F.count(F.when(F.col("s2"), 1)).alias("n2"),
        F.count(F.when(F.col("s3"), 1)).alias("n3"),
    )
    return counts.selectExpr(
        """stack(3, 'view', n1,
                    'view>click', n2,
                    'view>click>purchase', n3) AS (step, n_users)"""
    )


# ---------------------------------------------------------------------------
# B60: canonical-document assignment (dedup cluster -> survivor id)
# ---------------------------------------------------------------------------
B60_ORACLE = """
    WITH RECURSIVE fp AS (
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
    SELECT d.doc_id,
           CAST(COALESCE(c.cluster_id, d.doc_id) AS BIGINT) AS canonical_id,
           (c.cluster_id IS NOT NULL AND c.cluster_id != d.doc_id) AS is_duplicate
    FROM documents d LEFT JOIN clusters c USING (doc_id)
"""


@query("b60_canonical_assignment", oracle=B60_ORACLE)
def b60_canonical_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The step that makes dedup actionable: EVERY document mapped to
    its canonical id — its b55 cluster's min doc_id when it belongs to
    a duplicate cluster, itself otherwise — plus the keep/drop flag a
    training-data writer filters on.

    No forced broadcast: the labeling is only docs-in-duplicate-pairs
    sized, which on a real web crawl is 30-50% of the corpus — far past
    broadcast range. AQE picks broadcast when the labeling measures
    small at runtime and falls back to a shuffle join when it doesn't;
    a mandatory ``F.broadcast`` here was round 2's one scale flaw.
    """
    from kafka_streams_sandbox_spark.operators.extended import (
        b55_dedup_clusters,
    )

    docs = table(spark, sf_dir, "documents")
    clusters = b55_dedup_clusters(spark, sf_dir)
    return docs.join(clusters, "doc_id", "left").select(
        "doc_id",
        F.coalesce("cluster_id", "doc_id").alias("canonical_id"),
        (
            F.col("cluster_id").isNotNull()
            & (F.col("cluster_id") != F.col("doc_id"))
        ).alias("is_duplicate"),
    )


# ---------------------------------------------------------------------------
# B62: benchmark-contamination overlap (train set vs held-out benchmark)
# ---------------------------------------------------------------------------
# benchmark = every 50th doc (stands in for an eval suite); report
# training docs covering >= 10% of a benchmark doc's distinct 5-grams.
# 5-gram shingles, NOT 3-grams: real contamination checks use long
# n-grams (8-13 typical) precisely because short n-grams collide by
# chance — on this small-vocabulary corpus, 3-gram postings were so
# hot the pair join blew up (the hot-posting trap), while 5-grams
# collide only on genuine shared passages.
_B62_MIN_OVERLAP = 0.1
_B62_N = 5

B62_ORACLE = f"""
    WITH sh AS (
        SELECT doc_id,
               list_distinct(CASE WHEN len(toks) < {_B62_N}
                    THEN [array_to_string(toks, ' ')]
                    ELSE list_transform(range(1, len(toks) - {_B62_N - 2}),
                         i -> array_to_string(toks[i:i+{_B62_N - 1}], ' '))
                    END) AS shingles
        FROM (SELECT doc_id,
                     list_filter(regexp_split_to_array(trim(text), '\\s+'),
                                 t -> t != '') AS toks
              FROM documents)
    ),
    bench AS (SELECT doc_id AS bench_id, shingles AS bsh
              FROM sh WHERE doc_id % 50 = 0)
    SELECT a.doc_id, b.bench_id,
           CAST(len(list_intersect(a.shingles, b.bsh)) AS BIGINT) AS n_common,
           (CAST(len(list_intersect(a.shingles, b.bsh)) AS DOUBLE)
            / len(b.bsh)) AS overlap
    FROM sh a JOIN bench b ON a.doc_id != b.bench_id
    WHERE (CAST(len(list_intersect(a.shingles, b.bsh)) AS DOUBLE)
           / len(b.bsh)) >= {_B62_MIN_OVERLAP}
"""


@query("b62_contamination_overlap", oracle=B62_ORACLE)
def b62_contamination_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark contamination: which corpus documents cover >= 10% of
    a benchmark document's distinct word-5-grams — the pre-training
    hygiene check that keeps eval suites out of the training set.

    Same inverted-index discipline as b26 (never all-pairs): corpus
    shingles explode into postings, the benchmark postings are tiny
    (1/50th of docs) and broadcast, so the only shuffle is the
    (doc, bench) pair count whose size is the number of actual
    collisions. Shingles are xxhash64-hashed: intersection counts over
    64-bit hashes equal counts over the strings (collisions
    negligible), so the string-intersecting oracle matches exactly.
    At 100 TB the benchmark side (an eval suite) is KB-scale — this
    plan is one map pass over the corpus plus a skinny aggregate.
    """
    from kafka_streams_sandbox_spark.operators.dedup import word_ngrams_expr

    docs = documents_wide(spark, sf_dir)
    sh = docs.select(
        "doc_id", F.expr(TOKENS_EXPR).alias("toks")
    ).select(
        "doc_id",
        F.expr(
            f"transform({word_ngrams_expr(_B62_N, 'toks')}, s -> xxhash64(s))"
        ).alias("shingles"),
    )
    # explode_OUTER, not explode: plain explode lets constraint
    # inference push `size(shingles) > 0 AND isnotnull(shingles)` down
    # to the scan with the whole shingle pipeline INLINED — every row
    # re-tokenizes twice in an interpreted Filter (measured 28 s vs
    # ~2 s at sf0.1; recompute trap #3). Shingle arrays are never
    # empty anyway (short docs yield one whole-text shingle).
    corpus_posting = sh.select(
        "doc_id", F.explode_outer("shingles").alias("sh")
    )
    bench_posting = (
        sh.filter(F.col("doc_id") % 50 == 0)
        .select(
            F.col("doc_id").alias("bench_id"),
            F.size("shingles").alias("n_b"),
            F.explode_outer("shingles").alias("sh"),
        )
    )
    matched = corpus_posting.join(F.broadcast(bench_posting), "sh").filter(
        F.col("doc_id") != F.col("bench_id")
    )
    counts = matched.groupBy("doc_id", "bench_id", "n_b").agg(
        F.count(F.lit(1)).alias("n_common")
    )
    return (
        counts.withColumn(
            "overlap",
            F.col("n_common").cast("double") / F.col("n_b").cast("double"),
        )
        .filter(F.col("overlap") >= _B62_MIN_OVERLAP)
        .select("doc_id", "bench_id", "n_common", "overlap")
    )


# ---------------------------------------------------------------------------
# B119: benchmark decontamination as a corpus REWRITE
# ---------------------------------------------------------------------------
# b62 reports which corpus docs overlap the benchmark; production
# pipelines REMOVE the overlap. Convention follows GPT-3's appendix-C
# decontamination: any _B119_N-gram (13) of a training doc that
# appears anywhere in the eval suite marks its token span for
# removal; overlapping marks union exactly; the doc is rewritten
# without the contaminated tokens (doc-level drop is the blunter
# published variant — span removal keeps the doc's clean remainder).
# Span machinery is b97's, shared via `rewrite_without_marked_spans`.

_B119_N = 13

B119_ORACLE = f"""
    WITH t AS (
        SELECT doc_id,
               list_filter(regexp_split_to_array(trim(text), '\\s+'),
                           x -> x != '') AS toks
        FROM documents
    ),
    posting AS (
        SELECT doc_id, s.pos AS pos, s.sh AS sh
        FROM (
            SELECT doc_id,
                   unnest(list_transform(range(1, len(toks) - {_B119_N - 2}),
                          i -> {{'pos': i,
                                 'sh': array_to_string(toks[i:i + {_B119_N - 1}], ' ')}})) AS s
            FROM t
            WHERE len(toks) >= {_B119_N}
        )
    ),
    bench AS (
        SELECT DISTINCT sh FROM posting WHERE doc_id % 50 = 0
    ),
    rm AS (
        SELECT p.doc_id,
               list_distinct(flatten(list(range(p.pos, p.pos + {_B119_N}))))
                   AS rm
        FROM posting p JOIN bench b USING (sh)
        WHERE p.doc_id % 50 != 0
        GROUP BY p.doc_id
    )
    SELECT t.doc_id,
           CAST(COALESCE(len(t.toks), 0) AS BIGINT) AS n_tokens,
           CAST(COALESCE(len(r.rm), 0) AS BIGINT) AS removed_tokens,
           CAST(COALESCE(len(t.toks), 0) - COALESCE(len(r.rm), 0) AS BIGINT)
               AS kept_tokens,
           COALESCE(array_to_string(
               list_filter(
                   list_transform(range(1, COALESCE(len(t.toks), 0) + 1),
                                  i -> CASE WHEN NOT list_contains(
                                                COALESCE(r.rm, []), i)
                                            THEN t.toks[i] END),
                   x -> x IS NOT NULL), ' '), '') AS clean_text
    FROM t LEFT JOIN rm r ON t.doc_id = r.doc_id
    WHERE t.doc_id % 50 != 0
"""


def span_posting(toks: DataFrame, span: int) -> DataFrame:
    """Per-position span-hash posting (doc_id, pos, sh) over a
    (doc_id, toks, n_tokens) relation — map-only. Shared by b119 and
    its ingest twin a40 so the marking key cannot drift."""
    return (
        toks.filter(F.col("n_tokens") >= span)
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    f"""transform(sequence(1, size(toks) - {span - 1}),
                        i -> struct(i AS pos,
                                    xxhash64(concat_ws(' ', slice(toks, i, {span}))) AS sh))"""
                )
            ).alias("s"),
        )
        .select("doc_id", "s.pos", "s.sh")
    )


def decontaminate_against(
    toks: DataFrame, bench_sh: DataFrame, span: int
) -> DataFrame:
    """Rewrite `toks` (doc_id, toks, n_tokens) without any span whose
    hash appears in `bench_sh` (a (sh) relation, broadcast — an eval
    suite is KB-scale): b119's marking + the shared interval-union
    rebuild."""
    from kafka_streams_sandbox_spark.operators.dedup import (
        rewrite_without_marked_spans,
    )

    marked = span_posting(toks, span).join(
        F.broadcast(bench_sh), "sh", "left_semi"
    )
    return rewrite_without_marked_spans(toks, marked, span=span)


@query("b119_decontaminate_rewrite", oracle=B119_ORACLE)
def b119_decontaminate_rewrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination as a corpus rewrite (see section
    header): remove every {_B119_N}-token span of a training doc whose
    n-gram appears anywhere in the benchmark slice (doc_id % 50 == 0,
    b62's rule), exact interval union, linear per-doc rebuild.

    Plan (never all-pairs, one wide shuffle total): per-position
    postings are map-only (xxhash64 span keys — hash-equality counts,
    b62's argument); the benchmark's DISTINCT shingle set is
    BROADCAST (an eval suite is KB-scale at 100 TB) so marking is a
    map-side semi-join of the corpus posting; interval union groups
    by doc_id holding only span STARTS (b97's spill argument); the
    rebuild is the shared linear array_except kernel
    (`rewrite_without_marked_spans`, dedup.py). Reference parity: the
    sandbox has no corpus layer; mandated Layer-B surface.
    """
    docs = documents_wide(spark, sf_dir)
    toks = docs.select(
        "doc_id", F.expr(TOKENS_EXPR).alias("toks")
    ).withColumn("n_tokens", F.coalesce(F.size("toks"), F.lit(0)))
    is_bench = F.col("doc_id") % 50 == 0
    bench_sh = (
        span_posting(toks.filter(is_bench), _B119_N).select("sh").distinct()
    )
    return decontaminate_against(
        toks.filter(~is_bench), bench_sh, span=_B119_N
    )


# ---------------------------------------------------------------------------
# B63: intra-document repetition (boilerplate / degenerate-text signal)
# ---------------------------------------------------------------------------
B63_ORACLE = f"""
    SELECT doc_id,
           CAST(len(tg) AS BIGINT) AS n_trigrams,
           CAST(len(list_distinct(tg)) AS BIGINT) AS n_distinct,
           (1.0 - CAST(len(list_distinct(tg)) AS DOUBLE) / len(tg))
               AS repetition_ratio
    FROM (
        SELECT doc_id,
               {DUCK_TRIGRAMS_EXPR} AS tg
        FROM (SELECT doc_id,
                     list_filter(regexp_split_to_array(trim(text), '\\s+'),
                                 t -> t != '') AS toks
              FROM documents)
    )
"""


@query("b63_intradoc_repetition", oracle=B63_ORACLE)
def b63_intradoc_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repeated-trigram ratio per document (1 - distinct/total) — the
    standard degenerate-text / boilerplate quality signal an LLM
    pipeline filters on. Pure map-only HOF expression: zero shuffles,
    zero Python; the trigram array is materialized once in its own
    projection (the CollapseProject re-evaluation trap —
    memory: inlined exprs re-run per element access)."""
    docs = table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", F.expr(TOKENS_EXPR).alias("toks"))
    trig = toks.select(
        "doc_id",
        F.expr(
            TRIGRAMS_EXPR
        ).alias("tg"),
    )
    n_t = F.size("tg")
    n_d = F.size(F.array_distinct("tg"))
    return trig.select(
        "doc_id",
        n_t.cast("bigint").alias("n_trigrams"),
        n_d.cast("bigint").alias("n_distinct"),
        (
            F.lit(1.0) - n_d.cast("double") / n_t.cast("double")
        ).alias("repetition_ratio"),
    )


# ---------------------------------------------------------------------------
# B64: deterministic stratified sample (top-k per stratum by id hash)
# ---------------------------------------------------------------------------
# MinStd multiplicative hash (Lehmer '88): (doc_id * 48271) mod 2^31-1.
# Chosen over xxhash64 because BOTH engines evaluate it with plain
# BIGINT arithmetic (the oracle is the point). doc_id is reduced
# mod 2^31-1 BEFORE the multiply — algebraically identical, but the
# product then stays < 2^47 for ANY int64 id, where the naive form
# overflows at doc_id ~1.9e14 (Spark would wrap with ANSI off while
# DuckDB raises Out-of-Range — a latent cross-engine divergence).
_B64_K = 20

B64_ORACLE = f"""
    SELECT lang, CAST(doc_id AS BIGINT) AS doc_id,
           CAST(rnk AS BIGINT) AS sample_rank
    FROM (SELECT lang, doc_id,
                 row_number() OVER (
                     PARTITION BY lang
                     ORDER BY ((doc_id % 2147483647) * 48271) % 2147483647, doc_id
                 ) AS rnk
          FROM documents)
    WHERE rnk <= {_B64_K}
"""


@query("b64_stratified_sample", oracle=B64_ORACLE)
def b64_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sample: the {k} lowest-hashed docs per
    language. Unlike sample()/rand(), the pick is a pure function of
    doc_id — stable under repartitioning, re-ordering, appends (an
    existing doc keeps its rank unless a lower-hashed doc arrives),
    and cluster size — so an eval set drawn this way is reproducible
    across runs without seed coordination or sampling state.

    Scale: rank <= k over a partitioned window is WindowGroupLimit —
    each task keeps a k-row heap per stratum before the shuffle, so
    shuffle volume is O(strata x k), not O(rows).
    """
    docs = table(spark, sf_dir, "documents")
    h = ((F.col("doc_id") % F.lit(2147483647)) * F.lit(48271)) % F.lit(2147483647)
    w = Window.partitionBy("lang").orderBy(h.asc(), F.col("doc_id").asc())
    return (
        docs.select("lang", "doc_id")
        .withColumn("sample_rank", F.row_number().over(w))
        .filter(F.col("sample_rank") <= _B64_K)
        .select(
            "lang",
            F.col("doc_id").cast("bigint").alias("doc_id"),
            F.col("sample_rank").cast("bigint").alias("sample_rank"),
        )
    )


# ---------------------------------------------------------------------------
# B65: int8 embedding quantization + reconstruction error
# ---------------------------------------------------------------------------
# Symmetric absmax int8 quantization — the storage/serving compression
# every embedding pipeline applies before the vectors ship to an index
# (4x smaller, SIMD int8 dot products). scale = max|x|/127; rounding
# is an explicit floor(x/scale + 0.5) so both engines compute the SAME
# integer (library round() half-even vs half-away differences can't
# leak in). Every float op here (cast, abs, max, /, *, floor) is
# order-independent IEEE double arithmetic, so the oracle hash is
# bit-exact without the decimal fixed-point path.

B65_ORACLE = """
    WITH e AS (
        SELECT vec_id,
               list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
        FROM embeddings
    ), s AS (
        SELECT vec_id, e,
               list_max(list_transform(e, x -> abs(x))) / 127 AS scale
        FROM e
    ), q AS (
        SELECT vec_id, e, scale,
               list_transform(e,
                   x -> CAST(floor(x / scale + 0.5) AS BIGINT)) AS q
        FROM s WHERE scale > 0
    )
    SELECT CAST(vec_id AS BIGINT) AS vec_id,
           CAST(len(q) AS BIGINT) AS n_dims,
           scale,
           CAST(list_sum(q) AS BIGINT) AS q_checksum,
           list_max(list_transform(list_zip(q, e),
               p -> abs(CAST(p[1] AS DOUBLE) * scale - p[2])))
               AS max_abs_err
    FROM q
"""


@query("b65_embedding_quantize", oracle=B65_ORACLE)
def b65_embedding_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Absmax int8 quantization per embedding with a max reconstruction
    error audit column. Map-only (zero shuffles, zero Python): one
    projection materializes the widened array, the next the absmax
    scale, the next the int8 codes — each referenced >= twice
    downstream so CollapseProject can't inline the array exprs into
    per-element re-evaluation (the recompute trap).

    Scale: at 100 TB this is the classic embarrassingly-parallel
    columnar rewrite; the only cost is the scan and the (4x smaller)
    write. q_checksum (exact int sum) + max_abs_err <= scale/2 give
    cheap distributed invariants to monitor quantization drift.
    """
    from kafka_streams_sandbox_spark.functions.vectors import to_double_array

    emb = table(spark, sf_dir, "embeddings")
    e = emb.select("vec_id", to_double_array("embedding").alias("e"))
    s = e.select(
        "vec_id",
        "e",
        (F.expr("array_max(transform(e, x -> abs(x)))") / F.lit(127.0)).alias(
            "scale"
        ),
    ).filter(F.col("scale") > 0)
    q = s.select(
        "vec_id",
        "e",
        "scale",
        F.expr(
            "transform(e, x -> CAST(floor(x / scale + 0.5d) AS BIGINT))"
        ).alias("q"),
    )
    return q.select(
        F.col("vec_id").cast("bigint").alias("vec_id"),
        F.size("q").cast("bigint").alias("n_dims"),
        "scale",
        F.expr("aggregate(q, CAST(0 AS BIGINT), (a, x) -> a + x)").alias(
            "q_checksum"
        ),
        F.expr(
            "array_max(zip_with(q, e,"
            " (qi, x) -> abs(CAST(qi AS DOUBLE) * scale - x)))"
        ).alias("max_abs_err"),
    )


# ---------------------------------------------------------------------------
# B66: SCD2 dimension history (change detection + effective ranges)
# ---------------------------------------------------------------------------
# The warehouse-side twin of the streaming KTable: instead of keeping
# only the latest value per key (b17 / A2), keep EVERY value with its
# [eff_from, eff_to) validity range — type-2 slowly-changing dimension
# build from an append-only event log.

B66_ORACLE = """
    WITH ordered AS (
        SELECT user_id, ts, event_id, event_type,
               lag(event_type) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id) AS prev
        FROM events
    ), changes AS (
        SELECT user_id, ts, event_id, event_type
        FROM ordered WHERE prev IS NULL OR prev != event_type
    )
    SELECT user_id, event_type AS attr, ts AS eff_from,
           lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS eff_to,
           lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               IS NULL AS is_current
    FROM changes
"""


@query("b66_scd2_history", oracle=B66_ORACLE)
def b66_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type-2 slowly-changing-dimension build: per user, each *change*
    of event_type opens a version row with [eff_from, eff_to) validity
    (consecutive repeats collapse into the open version — the change
    -detection lag() filter). The standard CDC-log -> queryable-history
    rewrite.

    Scale: both windows share one partitioning (user_id) and one sort
    (ts, event_id), so the whole history build is a single shuffle +
    single sort per partition regardless of how many versions a key
    has; no self-joins, no iteration.
    """
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    changes = (
        ev.select("user_id", "ts", "event_id", "event_type")
        .withColumn("prev", F.lag("event_type").over(w))
        .filter(F.col("prev").isNull() | (F.col("prev") != F.col("event_type")))
    )
    eff_to = F.lead("ts").over(w)
    return changes.select(
        "user_id",
        F.col("event_type").alias("attr"),
        F.col("ts").alias("eff_from"),
        eff_to.alias("eff_to"),
        eff_to.isNull().alias("is_current"),
    )


# ---------------------------------------------------------------------------
# B67: domain-mixture sampling (deterministic per-source rates)
# ---------------------------------------------------------------------------
# Pre-training mixtures reweight domains (keep all of wikipedia-ish
# sources, 10% of crawl-ish ones). The keep decision is the same pure
# -function-of-id trick as b64 — hash(doc_id) under the source's rate
# threshold — so the mixture is reproducible and append-stable with no
# sampling state. Weights live in a (broadcast) config dim keyed by
# source tier. doc_id is pre-reduced mod 1000 before the multiply —
# exact, since the product is only read mod 1000 and a*b == (a mod m)*b
# (mod m) — so the expression never overflows int64 at any id (the b64
# Lehmer-overflow fix, ADVICE r8, applied to this rule's modulus; the
# same spelling is used at every 16807 site: b67, b71, b100, a34).
_B67_TIERS = [(0, 1.0), (1, 0.5), (2, 0.25), (3, 0.1)]

B67_ORACLE = f"""
    WITH tiers(tier, w) AS (VALUES
        {", ".join(f"({t}, CAST({w} AS DOUBLE))" for t, w in _B67_TIERS)}),
    d AS (
        SELECT doc_id, source,
               CAST(substring(source, 4) AS INT) % 4 AS tier
        FROM documents
    )
    SELECT source, w AS weight,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN ((doc_id % 1000) * 16807) % 1000 < w * 1000
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
    FROM d JOIN tiers USING (tier)
    GROUP BY 1, 2
"""


@query("b67_mixture_sample", oracle=B67_ORACLE)
def b67_mixture_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic domain-mixture sampling: doc kept iff
    hash(doc_id) mod 1000 falls under its source's mixture rate.
    Reported per source as achieved-vs-configured rates (the mixture
    audit a pipeline run logs). Weights join is a broadcast of the
    tiny config dim; at 100 TB the keep flag is a map-only column and
    this aggregate is the monitoring rollup on top.
    """
    docs = table(spark, sf_dir, "documents")
    tiers = spark.createDataFrame(_B67_TIERS, "tier int, w double")
    d = docs.select(
        "doc_id",
        "source",
        (F.expr("CAST(substring(source, 4) AS INT)") % 4).alias("tier"),
    )
    keep = (((F.col("doc_id") % 1000) * 16807) % 1000) < (F.col("w") * 1000)
    return (
        d.join(F.broadcast(tiers), "tier")
        .groupBy("source", F.col("w").alias("weight"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum(keep.cast("int")).cast("bigint").alias("n_kept"),
        )
    )


# ---------------------------------------------------------------------------
# B68: incremental batch-vs-corpus dedup (ingestion-time, not rebuild)
# ---------------------------------------------------------------------------
# The pattern that actually runs at 100 TB: a new ingest batch (here
# doc_id % 10 >= 8 stands in for "today's crawl", ~20%) is checked
# against the EXISTING corpus fingerprint index without recomputing
# anything over the corpus — corpus fps stream once against a
# broadcast of the (small) batch fingerprint set, never the reverse.

B68_ORACLE = """
    WITH fp AS (
        SELECT doc_id,
               md5(array_to_string(list_sort(list_distinct(
                   list_filter(regexp_split_to_array(trim(text), '\\s+'),
                               t -> t != ''))), ' ')) AS fingerprint
        FROM documents
    ),
    new_batch AS (SELECT * FROM fp WHERE doc_id % 10 >= 8),
    corpus_hit AS (
        SELECT DISTINCT c.fingerprint FROM fp c
        WHERE c.doc_id % 10 < 8
          AND c.fingerprint IN (SELECT fingerprint FROM new_batch)
    )
    SELECT n.doc_id, n.fingerprint,
           CASE WHEN h.fingerprint IS NOT NULL THEN 'dup_corpus'
                WHEN row_number() OVER (PARTITION BY n.fingerprint
                                        ORDER BY n.doc_id) = 1 THEN 'unique'
                ELSE 'dup_batch' END AS status
    FROM new_batch n LEFT JOIN corpus_hit h
      ON n.fingerprint = h.fingerprint
"""


@query("b68_incremental_dedup", oracle=B68_ORACLE)
def b68_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental dedup of an ingest batch against the standing
    corpus: each new doc is labeled dup_corpus (fingerprint already
    indexed), dup_batch (another new doc with the same fingerprint
    arrived first), or unique.

    Scale shape: the batch's distinct fingerprints BROADCAST against
    one streaming pass of the corpus index (at 100 TB: a partition
    -pruned scan of the bucketed fingerprint store); the corpus is
    never shuffled, never re-fingerprinted, and the windowed
    first-in-batch rank shuffles only the batch. Cost per ingest is
    O(batch + corpus-scan), independent of corpus shuffle width.
    """
    docs = table(spark, sf_dir, "documents")
    fingerprint = token_set_fingerprint()
    fp = docs.select("doc_id", fingerprint.alias("fingerprint"))
    is_new = (F.col("doc_id") % 10) >= 8
    new_batch = fp.filter(is_new)
    corpus = fp.filter(~is_new)
    batch_fps = new_batch.select("fingerprint").distinct()
    corpus_hit = (
        corpus.join(F.broadcast(batch_fps), "fingerprint")
        .select("fingerprint")
        .distinct()
        .withColumn("in_corpus", F.lit(True))
    )
    w = Window.partitionBy("fingerprint").orderBy("doc_id")
    return (
        new_batch.join(F.broadcast(corpus_hit), "fingerprint", "left")
        .withColumn("rk", F.row_number().over(w))
        .select(
            "doc_id",
            "fingerprint",
            F.when(F.col("in_corpus"), "dup_corpus")
            .when(F.col("rk") == 1, "unique")
            .otherwise("dup_batch")
            .alias("status"),
        )
    )


# ---------------------------------------------------------------------------
# B69: quality-gate cascade (composed filters with rejection audit)
# ---------------------------------------------------------------------------
# Every pre-training pipeline ends in a filter cascade; what matters
# operationally is the AUDIT — per-doc verdict with the first failing
# reason, so rejection-rate drift is observable per gate. Thresholds
# are calibrated to this corpus (n_tok 10-99 median 56, repetition
# p95 ~ 0.011) so both gates actually fire.
_B69_MIN_TOKENS = 16
_B69_MAX_REPETITION = 0.05

B69_ORACLE = f"""
    WITH tg AS (
        SELECT doc_id, len(toks) AS n_tokens,
               {DUCK_TRIGRAMS_EXPR} AS tg
        FROM (SELECT doc_id,
                     list_filter(regexp_split_to_array(trim(text), '\\s+'),
                                 t -> t != '') AS toks
              FROM documents)
    ),
    scored AS (
        SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
               (1.0 - CAST(len(list_distinct(tg)) AS DOUBLE) / len(tg))
                   AS repetition_ratio
        FROM tg
    )
    SELECT doc_id, n_tokens, repetition_ratio,
           CASE WHEN n_tokens < {_B69_MIN_TOKENS} THEN 'too_short'
                WHEN repetition_ratio > {_B69_MAX_REPETITION}
                    THEN 'too_repetitive'
                ELSE 'pass' END AS verdict
    FROM scored
"""


def quality_verdict(docs: DataFrame) -> DataFrame:
    """b69's scoring + verdict over ANY (doc_id, text, ...) relation.

    Pure column expressions, no aggregation — so the same gate runs
    unchanged on the batch corpus (b69) and on the ingest stream
    (a25), the batch/stream duality the engine promises.
    """
    toks = docs.select("doc_id", F.expr(TOKENS_EXPR).alias("toks"))
    trig = toks.select(
        "doc_id",
        F.size("toks").alias("n_tokens"),
        F.expr(
            TRIGRAMS_EXPR
        ).alias("tg"),
    )
    scored = trig.select(
        "doc_id",
        F.col("n_tokens").cast("bigint").alias("n_tokens"),
        (
            F.lit(1.0)
            - F.size(F.array_distinct("tg")).cast("double") / F.size("tg")
        ).alias("repetition_ratio"),
    )
    return scored.select(
        "doc_id",
        "n_tokens",
        "repetition_ratio",
        F.when(F.col("n_tokens") < _B69_MIN_TOKENS, "too_short")
        .when(F.col("repetition_ratio") > _B69_MAX_REPETITION, "too_repetitive")
        .otherwise("pass")
        .alias("verdict"),
    )


@query("b69_quality_gate", oracle=B69_ORACLE)
def b69_quality_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-gate cascade: per-doc verdict = first failing gate
    (length, then repetition), 'pass' otherwise. Composes the b31/b63
    signals into the keep/drop decision a pipeline applies before
    training; map-only, zero shuffles, zero Python — the audit columns
    ride along so gate drift is monitorable for free.
    """
    return quality_verdict(table(spark, sf_dir, "documents"))


# ---------------------------------------------------------------------------
# B70: bigram language-model counts (top next-token table)
# ---------------------------------------------------------------------------
# The n-gram count table is the classic corpus statistic (KenLM-style
# LM builds, contamination fingerprints, autocomplete): for each
# token, the 3 most frequent successors with conditional probability.
_B70_TOP = 3

B70_ORACLE = f"""
    WITH toks AS (
        SELECT doc_id,
               list_filter(regexp_split_to_array(trim(text), '\\s+'),
                           t -> t != '') AS toks
        FROM documents
    ),
    bigrams AS (
        SELECT unnest(list_transform(range(1, len(toks)),
                                     i -> {{'prev': toks[i],
                                            'next': toks[i+1]}})) AS bg
        FROM toks WHERE len(toks) >= 2
    ),
    counts AS (
        SELECT bg.prev AS prev_tok, bg.next AS next_tok,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM bigrams GROUP BY 1, 2
    ),
    ranked AS (
        SELECT prev_tok, next_tok, n,
               CAST(SUM(n) OVER (PARTITION BY prev_tok) AS BIGINT)
                   AS prev_total,
               row_number() OVER (PARTITION BY prev_tok
                                  ORDER BY n DESC, next_tok) AS rk
        FROM counts
    )
    SELECT prev_tok, next_tok, n,
           CAST(n AS DOUBLE) / prev_total AS cond_p,
           CAST(rk AS BIGINT) AS rk
    FROM ranked WHERE rk <= {_B70_TOP}
"""


@query("b70_bigram_lm", oracle=B70_ORACLE)
def b70_bigram_lm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram LM count table: top-3 successors per token with
    conditional probability n(prev,next)/n(prev).

    Scale shape: bigram emission is map-only (posexplode over the
    token array, pairing each token with its successor); ONE shuffle
    builds the (prev,next) counts with map-side partial agg; the
    per-prev total and top-k rank share a second, prev-keyed shuffle
    (both window specs partition by prev_tok, and the rank filter
    fuses to WindowGroupLimit... rank-only; the SUM window rides the
    same sort). cond_p is a double ratio of exact int counts —
    engine-exact, no decimal path needed.
    """
    docs = documents_wide(spark, sf_dir)
    toks = docs.select(F.expr(TOKENS_EXPR).alias("toks")).filter(
        F.size("toks") >= 2
    )
    bigrams = toks.select(
        F.expr(
            """inline(transform(sequence(1, size(toks) - 1),
                 i -> named_struct('prev_tok', element_at(toks, i),
                                   'next_tok', element_at(toks, i + 1))))"""
        )
    )
    counts = bigrams.groupBy("prev_tok", "next_tok").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    # Both windows share partitioning AND ordering (the total uses an
    # explicit full frame), so they ride one Exchange + one Sort — an
    # unordered sum window would force a second Window pass.
    w_rank = Window.partitionBy("prev_tok").orderBy(
        F.col("n").desc(), F.col("next_tok")
    )
    w_tot = w_rank.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return (
        counts.withColumn("prev_total", F.sum("n").over(w_tot))
        .withColumn("rk", F.row_number().over(w_rank))
        .filter(F.col("rk") <= _B70_TOP)
        .select(
            "prev_tok",
            "next_tok",
            "n",
            (F.col("n").cast("double") / F.col("prev_total")).alias("cond_p"),
            F.col("rk").cast("bigint").alias("rk"),
        )
    )


# ---------------------------------------------------------------------------
# B108: bigram-LM corpus-typicality gate (the CCNet-shaped filter)
# ---------------------------------------------------------------------------
# The standard public pipeline filter this family still lacked (r8,
# VERDICT r7 #4): CCNet (Wenzek et al. 2019) scores every document
# with a small LM and gates on the score distribution. b70 builds the
# bigram count table; b108 scores each doc's own bigram occurrences
# against it and gates against the corpus-level score.
#
# Score design — every step engine-exact (the b102/b103 discipline):
#   lm_score(doc) = hit_mass / (n_bigrams + base_mass)
# summed over the doc's bigram OCCURRENCES, where hit = n(prev,next)
# if that corpus count >= 2 else 0, base = n(prev). All three terms
# are exact integer sums (decimal(38,0) partials — Sigma n_p over a
# 100 TB corpus overflows int64); the score is ONE double division of
# two correctly-rounded int casts, so no cross-engine float-summation
# drift exists. No log/perplexity: libm ln() is not bit-identical
# across engines, and the ratio form preserves the ordering the gate
# needs. The n_pn >= 2 hapax exclusion is what makes SELF-trained
# scoring sound: under a raw MLE every globally-unique bigram scores
# p(next|prev) = 1, so gibberish ranks as maximally fluent (the
# pathology CCNet avoids by training on Wikipedia); dropping hapax
# mass sends unique-bigram docs to 0 instead.
#   gate: passes_lm = 2 * lm_score >= corpus_score, where
# corpus_score is the same ratio over global sums (*2 is exact; the
# corpus ratio is ONE more division). Docs less than half as
# corpus-typical as the corpus itself are the tail CCNet buckets off.
_B108_MIN_BIGRAM_N = 2  # hapax-bigram exclusion (see above)

# WITH-clause body shared by B108's and B111's oracles (one
# definition, so the gate and the bucketed mixture cannot drift)
_B108_SQL_BODY = f"""toks AS (
        SELECT doc_id,
               list_filter(regexp_split_to_array(trim(text), '\\s+'),
                           t -> t != '') AS toks
        FROM documents
    ),
    occ AS (
        SELECT doc_id,
               unnest(list_transform(range(1, len(toks)),
                                     i -> {{'prev': toks[i],
                                            'next': toks[i+1]}})) AS bg
        FROM toks WHERE len(toks) >= 2
    ),
    pn AS (
        SELECT bg.prev AS prev_tok, bg.next AS next_tok,
               COUNT(*) AS n_pn
        FROM occ GROUP BY 1, 2
    ),
    pn2 AS (
        SELECT prev_tok, next_tok, n_pn,
               SUM(n_pn) OVER (PARTITION BY prev_tok) AS n_p
        FROM pn
    ),
    scored AS (
        SELECT o.doc_id,
               COUNT(*) AS n_bigrams,
               SUM(CASE WHEN c.n_pn >= {_B108_MIN_BIGRAM_N}
                        THEN c.n_pn ELSE 0 END) AS hit_mass,
               SUM(c.n_p) AS base_mass
        FROM occ o
        JOIN pn2 c ON o.bg.prev = c.prev_tok AND o.bg.next = c.next_tok
        GROUP BY 1
    ),
    tot AS (
        SELECT CAST(SUM(hit_mass) AS DOUBLE)
                   / CAST(SUM(n_bigrams) + SUM(base_mass) AS DOUBLE)
                   AS corpus_score
        FROM scored
    )"""

B108_ORACLE = f"""
    WITH {_B108_SQL_BODY}
    SELECT doc_id,
           CAST(n_bigrams AS BIGINT) AS n_bigrams,
           CAST(hit_mass AS DOUBLE)
               / CAST(n_bigrams + base_mass AS DOUBLE) AS lm_score,
           (2.0 * (CAST(hit_mass AS DOUBLE)
                   / CAST(n_bigrams + base_mass AS DOUBLE)))
               >= corpus_score AS passes_lm
    FROM scored, tot
"""


def bigram_lm_occurrences(toks_df: DataFrame) -> DataFrame:
    """(doc_id, toks) -> one (doc_id, ph, nh) row per bigram
    OCCURRENCE — map-only, int64 xxhash64 keys (the b102 shuffle-key
    lesson). Shared by the self-trained scorer (b108/b111/b100) and
    the frozen-model scorer (a33).

    The >= 2-token guard is ENFORCED here, not assumed (r8 review):
    ``sequence(1, size - 1)`` on a 1-token doc descends to [1, 0] and
    ``element_at(th, 0)`` throws at runtime — a shared helper must not
    be one forgotten caller-side filter away from killing a query."""
    return toks_df.filter(F.size("toks") >= 2).select(
        "doc_id", F.expr("transform(toks, t -> xxhash64(t))").alias("th")
    ).select(
        "doc_id",
        F.expr(
            """inline(transform(sequence(1, size(th) - 1),
                 i -> named_struct('ph', element_at(th, i),
                                   'nh', element_at(th, i + 1))))"""
        ),
    )


def _lm_doc_masses(occ_with_counts: DataFrame) -> DataFrame:
    """ONE definition of the per-doc mass aggregate (r8 review —
    the self-trained and frozen scorers previously spelled it out
    twice, the exact single-definition rule this module preaches):
    (doc_id, n_bigrams, hit_mass, base_mass) from an occurrences
    frame carrying (possibly NULL, for model-unseen bigrams) n_pn /
    n_p count columns. Hapax mass (n_pn < {_B108_MIN_BIGRAM_N}) and
    unseen bigrams both contribute 0 hit; decimal(38,0) partials keep
    the sums exact at any corpus size."""
    dec = "decimal(38,0)"
    return occ_with_counts.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_bigrams"),
        F.sum(
            F.coalesce(
                F.when(
                    F.col("n_pn") >= _B108_MIN_BIGRAM_N, F.col("n_pn")
                ),
                F.lit(0),
            ).cast(dec)
        ).alias("hit_mass"),
        F.sum(F.coalesce(F.col("n_p"), F.lit(0)).cast(dec)).alias(
            "base_mass"
        ),
    )


def _lm_score_col() -> "F.Column":
    """The score expression over a _lm_doc_masses row — shared so the
    gate arithmetic cannot drift between scorers."""
    return F.col("hit_mass").cast("double") / (
        F.col("n_bigrams").cast("decimal(38,0)") + F.col("base_mass")
    ).cast("double")


def bigram_lm_counts(toks_df: DataFrame) -> DataFrame:
    """Train the bigram model over a corpus: (ph, nh, n_pn, n_p) —
    one shuffle for the (prev, next) counts (map-side partial agg),
    the per-prev total as a window over the counts table
    (distinct-bigram-sized, never corpus-sized)."""
    pn = (
        bigram_lm_occurrences(toks_df)
        .groupBy("ph", "nh")
        .agg(F.count(F.lit(1)).alias("n_pn"))
    )
    return pn.withColumn("n_p", F.sum("n_pn").over(Window.partitionBy("ph")))


def bigram_lm_frozen_score(
    toks_df: DataFrame, model: DataFrame, threshold: float
) -> DataFrame:
    """Score docs against a FROZEN counts model — the CCNet
    train/apply split (the reference corpus trains, arriving data is
    scored; b108's self-trained form is the at-rest twin). Unseen
    bigrams contribute 0 hit and 0 base via the LEFT join (the
    n_bigrams term still counts them in the denominator), so a doc of
    fully out-of-model bigrams scores 0.0 and fails any positive
    threshold. ``threshold`` is the frozen training-corpus score — a
    plain float captured once, so every per-doc verdict is a pure
    function of (own text, frozen model, frozen scalar): exactly what
    makes the ingest stream's micro-batching invisible (a33's duality
    assert relies on it)."""
    scored = _lm_doc_masses(
        bigram_lm_occurrences(toks_df).join(model, ["ph", "nh"], "left")
    )
    score = _lm_score_col()
    return scored.select(
        "doc_id",
        "n_bigrams",
        score.alias("lm_score"),
        (F.lit(2.0) * score >= F.lit(threshold)).alias("passes_lm"),
    )


def frozen_lm_threshold(model: DataFrame) -> float:
    """The frozen gate threshold = the training corpus's own aggregate
    score, derived from ONE scan of the (distinct-bigram-sized) counts
    model — shared by a33 and a34 so the scalar's derivation cannot
    drift between the standalone gate and the funnel (r9).

    Self-scoring means bigram (p, n) occurs exactly n_pn times, each
    occurrence contributing n_pn (if >= the hapax floor) to hit, n_p
    to base, and 1 to n_bigrams — so the corpus sums reduce to
    SUM(n_pn^2 | n_pn >= min) / (SUM(n_pn) + SUM(n_pn * n_p)): the
    same decimal(38,0) integers the per-doc scorer would re-derive via
    a corpus-scale occurrences x model join + doc shuffle, for the
    price of a scan of the already-persisted counts.

    Fail-closed (r8 review): an empty corpus (NULL) or an all-hapax
    corpus (0.0) has no model signal, and a 0.0 threshold would FAIL
    OPEN (2 * 0.0 >= 0.0 passes the exact OOD docs the gate exists to
    reject) — those degenerate corpora freeze to +inf instead."""
    dec = "decimal(38,0)"
    n_pn_d = F.col("n_pn").cast(dec)
    threshold = model.agg(
        (
            F.sum(
                F.when(
                    F.col("n_pn") >= _B108_MIN_BIGRAM_N,
                    n_pn_d * n_pn_d,
                ).otherwise(F.lit(0).cast(dec))
            ).cast("double")
            / (
                F.sum(n_pn_d) + F.sum(n_pn_d * F.col("n_p").cast(dec))
            ).cast("double")
        ).alias("corpus_score")
    ).collect()[0]["corpus_score"]
    if threshold is None or threshold <= 0.0:
        return float("inf")
    return float(threshold)


def bigram_lm_verdict(
    toks_df: DataFrame, with_threshold: bool = False
) -> DataFrame:
    """(doc_id, toks) -> (doc_id, n_bigrams, lm_score, passes_lm) for
    every doc with >= 2 tokens — b108's scoring core, shared with
    b100's funnel stage so the gate rule cannot drift.

    Plan shape: bigram occurrences are map-only (inline over the
    token-hash array — int64 xxhash64 keys, never ~60-char string
    pairs, the b102 shuffle-key lesson; counts over hashes == counts
    over strings, the b26 collision argument); ONE shuffle builds the
    (prev, next) counts with map-side partial agg; the per-prev total
    rides a window over the counts table (distinct-bigram-sized, not
    corpus-sized); one corpus-scale SMJ fetches each occurrence's
    counts; one doc_id shuffle aggregates the three per-doc masses.
    The corpus threshold is a single-row aggregate broadcast back
    (the b72 one-row crossJoin idiom) — no driver collect on any
    corpus-sized frame."""
    from pyspark import StorageLevel

    occ = bigram_lm_occurrences(toks_df)
    pn2 = bigram_lm_counts(toks_df)
    dec = "decimal(38,0)"
    # lazy DISK_ONLY checkpoint: scored has TWO consumers (the corpus
    # threshold aggregate + the returned per-doc frame) and without
    # truncation each re-runs the corpus-scale occ x counts join (the
    # b27/b105 multi-consumer lesson). Narrow rows: doc_id + 3 numbers.
    # Inner join here (self-scoring: every bigram is in its own
    # model), so _lm_doc_masses' coalesces are vacuous identities.
    scored = lazy_checkpoint(_lm_doc_masses(occ.join(pn2, ["ph", "nh"])))
    tot = scored.agg(
        (
            F.sum("hit_mass").cast("double")
            / (
                F.sum(F.col("n_bigrams").cast(dec)) + F.sum("base_mass")
            ).cast("double")
        ).alias("corpus_score")
    )
    score = _lm_score_col()
    out = scored.crossJoin(F.broadcast(tot)).select(
        "doc_id",
        "n_bigrams",
        score.alias("lm_score"),
        (F.lit(2.0) * score >= F.col("corpus_score")).alias("passes_lm"),
        "corpus_score",
    )
    # corpus_score exposed only on request (b111's bucket thresholds);
    # b108's driver contract keeps the original 4-column shape
    return out if with_threshold else out.drop("corpus_score")


@query("b108_bigram_lm_gate", oracle=B108_ORACLE)
def b108_bigram_lm_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style LM gate: score every document's bigram occurrences
    against the corpus's own bigram model and keep docs at least half
    as corpus-typical as the corpus average (see the module comment
    above for the engine-exact score design and the hapax exclusion
    that makes self-trained scoring sound). Docs with < 2 tokens have
    no bigram evidence and are not scored — the length floor of the
    b69 quality gate owns that band. Slots into b100's funnel as the
    lm_gate stage via the shared ``bigram_lm_verdict`` core."""
    docs = documents_wide(spark, sf_dir)
    toks = docs.select("doc_id", F.expr(TOKENS_EXPR).alias("toks")).filter(
        F.size("toks") >= 2
    )
    return bigram_lm_verdict(toks)


# ---------------------------------------------------------------------------
# B111: LM-bucketed mixture — the full CCNet shape (score -> bucket ->
# per-bucket downsample)
# ---------------------------------------------------------------------------
# CCNet's actual pipeline step: documents are BUCKETED by LM score
# (head / middle / tail of the perplexity distribution) and each
# bucket is sampled at its own rate (head kept, tail mostly dropped).
# b108 is the binary gate; b111 is the graded form. Bucket thresholds
# are the corpus-level score and its exact half (a *0.5 of a double
# is exact), so bucketing is engine-exact without any order-statistic
# computation — a percentile threshold would need a global sort (or a
# non-reproducible approx quantile) at 100 TB, while the ratio
# threshold is one broadcast scalar from the same integer sums the
# score uses. Per-bucket sampling is b67's configured-rate discipline
# as a pure function of doc_id (Lehmer hash), so the subsample is
# reproducible and append-stable.
_B111_RATE_PERMILLE = {"head": 1000, "middle": 500, "tail": 100}

B111_ORACLE = f"""
    WITH {_B108_SQL_BODY},
    bucketed AS (
        SELECT doc_id,
               CAST(hit_mass AS DOUBLE)
                   / CAST(n_bigrams + base_mass AS DOUBLE) AS lm_score,
               corpus_score
        FROM scored, tot
    )
    SELECT doc_id, lm_score,
           CASE WHEN lm_score >= corpus_score THEN 'head'
                WHEN 2.0 * lm_score >= corpus_score THEN 'middle'
                ELSE 'tail' END AS bucket,
           (((doc_id % 2147483647) * 48271) % 2147483647) % 1000 <
               CASE WHEN lm_score >= corpus_score
                    THEN {_B111_RATE_PERMILLE["head"]}
                    WHEN 2.0 * lm_score >= corpus_score
                    THEN {_B111_RATE_PERMILLE["middle"]}
                    ELSE {_B111_RATE_PERMILLE["tail"]} END AS keep
    FROM bucketed
"""


@query("b111_lm_bucket_mixture", oracle=B111_ORACLE)
def b111_lm_bucket_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style LM-bucketed mixture: head (at least corpus-typical)
    / middle (within half) / tail buckets from b108's engine-exact
    score, each downsampled at a configured per-bucket rate by the
    deterministic Lehmer pick (keep = hash(doc_id) under the bucket's
    permille). The shared ``bigram_lm_verdict`` core supplies score
    AND threshold, so b108's gate and b111's buckets cannot drift;
    the oracle composes the same SQL body."""
    docs = documents_wide(spark, sf_dir)
    toks = docs.select("doc_id", F.expr(TOKENS_EXPR).alias("toks")).filter(
        F.size("toks") >= 2
    )
    v = bigram_lm_verdict(toks, with_threshold=True)
    bucket = (
        F.when(F.col("lm_score") >= F.col("corpus_score"), "head")
        .when(F.lit(2.0) * F.col("lm_score") >= F.col("corpus_score"), "middle")
        .otherwise("tail")
    )
    rate = (
        F.when(F.col("bucket") == "head", _B111_RATE_PERMILLE["head"])
        .when(F.col("bucket") == "middle", _B111_RATE_PERMILLE["middle"])
        .otherwise(_B111_RATE_PERMILLE["tail"])
    )
    return (
        v.select("doc_id", "lm_score", bucket.alias("bucket"))
        .withColumn(
            "keep",
            (((F.col("doc_id") % 2147483647) * 48271) % 2147483647) % 1000 < rate,
        )
    )


# ---------------------------------------------------------------------------
# B71: corpus-curation funnel (the composed end-to-end pipeline)
# ---------------------------------------------------------------------------
# The capstone: quality gate (b69 rules) -> dedup canonical keep (b24
# token-set fingerprint, min-id survivor among quality survivors) ->
# domain-mixture keep (b67 rule) -> train/holdout split (b57 rule),
# reported as the per-stage attrition funnel a curation run logs.
# Every stage reuses the exact rule its standalone operator verifies.

B71_ORACLE = f"""
    WITH toks AS (
        SELECT doc_id, source,
               list_filter(regexp_split_to_array(trim(text), '\\s+'),
                           t -> t != '') AS toks
        FROM documents
    ),
    scored AS (
        SELECT doc_id, source, len(toks) AS n_tokens,
               md5(array_to_string(list_sort(list_distinct(toks)), ' '))
                   AS fingerprint,
               (1.0 - CAST(len(list_distinct(tg)) AS DOUBLE) / len(tg))
                   AS repetition_ratio
        FROM (SELECT *,
                     {DUCK_TRIGRAMS_EXPR} AS tg
              FROM toks)
    ),
    quality AS (
        SELECT * FROM scored
        WHERE n_tokens >= {_B69_MIN_TOKENS}
          AND repetition_ratio <= {_B69_MAX_REPETITION}
    ),
    dedup AS (
        SELECT * FROM (
            SELECT *, min(doc_id) OVER (PARTITION BY fingerprint) AS keep_id
            FROM quality)
        WHERE doc_id = keep_id
    ),
    mixture AS (
        SELECT d.* FROM dedup d
        JOIN (VALUES {", ".join(f"({t}, CAST({w} AS DOUBLE))" for t, w in _B67_TIERS)})
             tiers(tier, w)
          ON TRY_CAST(substring(d.source, 4) AS INT) % 4 = tiers.tier
        WHERE ((d.doc_id % 1000) * 16807) % 1000 < tiers.w * 1000
    ),
    split AS (
        SELECT doc_id,
               CASE WHEN 16 * (strpos('0123456789abcdef',
                         substring(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1)
                       + (strpos('0123456789abcdef',
                         substring(md5(CAST(doc_id AS VARCHAR)), 2, 1)) - 1)
                       < {_SPLIT_BUCKETS_TRAIN}
                    THEN 'train' ELSE 'holdout' END AS split
        FROM mixture
    )
    SELECT stage, n_docs FROM (
        SELECT 'raw' AS stage, CAST(COUNT(*) AS BIGINT) AS n_docs, 0 AS ord
        FROM documents
        UNION ALL SELECT 'quality', CAST(COUNT(*) AS BIGINT), 1 FROM quality
        UNION ALL SELECT 'dedup', CAST(COUNT(*) AS BIGINT), 2 FROM dedup
        UNION ALL SELECT 'mixture', CAST(COUNT(*) AS BIGINT), 3 FROM mixture
        UNION ALL SELECT 'train', CAST(COUNT(*) AS BIGINT), 4
                  FROM split WHERE split = 'train'
        UNION ALL SELECT 'holdout', CAST(COUNT(*) AS BIGINT), 5
                  FROM split WHERE split = 'holdout')
"""


@query("b71_corpus_curation", oracle=B71_ORACLE)
def b71_corpus_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end curation funnel: every stage applies the SAME rule
    its standalone operator (b69/b24/b67/b57) verifies, composed in
    order, and the output is the per-stage survivor count — the
    attrition report a production curation run publishes.

    Single-pass shape: each doc is labeled with the furthest stage it
    survives in ONE labeled DataFrame (the dedup keeper is a
    quality-conditional min over the fingerprint window — min() skips
    the NULLs of quality-failed docs, so no pre-filter is needed), and
    the funnel is one conditional aggregate unpivoted to stage rows.
    A naive union of per-stage count(*) branches re-tokenizes the
    corpus once PER STAGE (six scans — measured 12 s vs ~1 s at
    sf0.1); Catalyst does not share subplans across union branches.
    """
    docs = documents_wide(spark, sf_dir)
    toks = docs.select(
        "doc_id", "source", F.expr(TOKENS_EXPR).alias("toks")
    )
    trig = toks.withColumn(
        "tg",
        F.expr(
            TRIGRAMS_EXPR
        ),
    )
    scored = trig.select(
        "doc_id",
        "source",
        F.size("toks").alias("n_tokens"),
        token_set_fingerprint("toks").alias("fingerprint"),
        (
            F.lit(1.0)
            - F.size(F.array_distinct("tg")).cast("double") / F.size("tg")
        ).alias("repetition_ratio"),
    )
    q_pass = (F.col("n_tokens") >= _B69_MIN_TOKENS) & (
        F.col("repetition_ratio") <= _B69_MAX_REPETITION
    )
    w_fp = Window.partitionBy("fingerprint")
    tiers = spark.createDataFrame(_B67_TIERS, "tier int, w double")
    bucket = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2), 16, 10
    ).cast("int")
    labeled = (
        scored.withColumn("q_pass", q_pass)
        .withColumn(
            "keep_id",
            F.min(F.when(F.col("q_pass"), F.col("doc_id"))).over(w_fp),
        )
        # TRY_CAST + LEFT join: a doc whose source doesn't parse as a
        # tier must still count in raw/quality/dedup (the attrition
        # baseline is BY DEFINITION the full corpus) and then fail the
        # mixture stage — an inner join here silently vanished such
        # docs from every stage, and a plain CAST would abort both
        # engines under ANSI on the first junk source
        .withColumn("tier", F.expr("TRY_CAST(substring(source, 4) AS INT)") % 4)
        .join(F.broadcast(tiers), "tier", "left")
        .withColumn(
            "mix_keep",
            F.coalesce(
                (((F.col("doc_id") % 1000) * 16807) % 1000) < (F.col("w") * 1000),
                F.lit(False),
            ),
        )
        .withColumn(
            "label",
            F.when(~F.col("q_pass"), "dropped_quality")
            .when(F.col("doc_id") != F.col("keep_id"), "dropped_dedup")
            .when(~F.col("mix_keep"), "dropped_mixture")
            .when(bucket < _SPLIT_BUCKETS_TRAIN, "train")
            .otherwise("holdout"),
        )
    )
    surv = {
        "quality": F.col("q_pass"),
        "dedup": F.col("q_pass") & (F.col("doc_id") == F.col("keep_id")),
        "mixture": F.col("label").isin("train", "holdout"),
        "train": F.col("label") == "train",
        "holdout": F.col("label") == "holdout",
    }
    one = labeled.agg(
        F.count(F.lit(1)).cast("bigint").alias("raw"),
        *[
            F.sum(c.cast("int")).cast("bigint").alias(stage)
            for stage, c in surv.items()
        ],
    )
    stack = ", ".join(
        f"'{stage}', {stage}"
        for stage in ("raw", "quality", "dedup", "mixture", "train", "holdout")
    )
    return one.select(F.expr(f"stack(6, {stack}) AS (stage, n_docs)"))


# ---------------------------------------------------------------------------
# B72: key-skew diagnostics (the report that justifies salting)
# ---------------------------------------------------------------------------
# Before shuffling 100 TB on a key, measure the key: heaviest key and
# its share, quantiles of the per-key weight, and the skew factor
# (max / mean). This report over events.user_id is what decides
# whether the b50 two-phase salt is worth its extra shuffle.

B72_ORACLE = """
    WITH counts AS (
        SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n
        FROM events GROUP BY user_id
    ),
    heavy AS (
        SELECT user_id AS heavy_key, n AS heavy_n
        FROM counts ORDER BY n DESC, user_id DESC LIMIT 1
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_keys,
           CAST(SUM(n) AS BIGINT) AS total_rows,
           MIN(heavy.heavy_key) AS heavy_key,
           CAST(MIN(heavy.heavy_n) AS BIGINT) AS heavy_n,
           CAST(MIN(heavy.heavy_n) AS DOUBLE) / SUM(n) AS heavy_share,
           quantile_cont(n, 0.5) AS p50_n,
           quantile_cont(n, 0.99) AS p99_n,
           MIN(heavy.heavy_n) * CAST(COUNT(*) AS DOUBLE) / SUM(n)
               AS skew_factor
    FROM counts CROSS JOIN heavy
"""


@query("b72_key_skew_report", oracle=B72_ORACLE)
def b72_key_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Key-skew report over events.user_id: heaviest key + share,
    per-key weight quantiles, and skew factor (heaviest / mean).
    skew_factor ~ 1 means a plain hash shuffle balances; >> 1 means
    the b50 salt (or AQE skew-join splitting) pays for itself.

    Scale shape: ONE shuffle builds the per-key counts (map-side
    combined); the diagnostics aggregate runs over the counts table,
    which is |keys|-sized, not |rows|-sized — cheap enough to run
    before every large keyed job.
    """
    ev = table(spark, sf_dir, "events")
    counts = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    heavy = (
        counts.orderBy(F.col("n").desc(), F.col("user_id").desc())
        .limit(1)
        .select(
            F.col("user_id").alias("heavy_key"), F.col("n").alias("heavy_n")
        )
    )
    return counts.crossJoin(F.broadcast(heavy)).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_keys"),
        F.sum("n").cast("bigint").alias("total_rows"),
        F.min("heavy_key").alias("heavy_key"),
        F.min("heavy_n").cast("bigint").alias("heavy_n"),
        (
            F.min("heavy_n").cast("double") / F.sum("n")
        ).alias("heavy_share"),
        F.expr("percentile(n, 0.5)").alias("p50_n"),
        F.expr("percentile(n, 0.99)").alias("p99_n"),
        (
            F.min("heavy_n") * F.count(F.lit(1)).cast("double") / F.sum("n")
        ).alias("skew_factor"),
    )


# ---------------------------------------------------------------------------
# B73: retention cohorts (first-week cohort x activity-week offset)
# ---------------------------------------------------------------------------
# The classic product-analytics matrix. Weeks are pure integer math on
# the epoch (floor(epoch_us / 7 days)) — engine-identical by
# construction, where date_trunc('week') would hinge on both engines
# agreeing on week-start calendar semantics.
_WEEK_US = 7 * 86400 * 1_000_000

B73_ORACLE = f"""
    WITH ue AS (
        SELECT user_id,
               CAST(floor(epoch_us(ts) / {_WEEK_US}) AS BIGINT) AS wk
        FROM events
    ),
    cohort AS (
        SELECT user_id, MIN(wk) AS cohort_wk FROM ue GROUP BY user_id
    ),
    activity AS (
        SELECT DISTINCT u.user_id, c.cohort_wk, u.wk - c.cohort_wk AS offs
        FROM ue u JOIN cohort c USING (user_id)
    ),
    size_ AS (
        SELECT cohort_wk, CAST(COUNT(*) AS BIGINT) AS cohort_size
        FROM cohort GROUP BY cohort_wk
    )
    SELECT a.cohort_wk, a.offs AS week_offset,
           CAST(COUNT(*) AS BIGINT) AS n_active,
           s.cohort_size,
           CAST(COUNT(*) AS DOUBLE) / s.cohort_size AS retention
    FROM activity a JOIN size_ s USING (cohort_wk)
    GROUP BY a.cohort_wk, a.offs, s.cohort_size
"""


@query("b73_retention_cohorts", oracle=B73_ORACLE)
def b73_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly retention matrix: users cohorted by first-activity week,
    counted once per (cohort, week-offset) they were active in, with
    the retention rate against cohort size.

    Scale shape: one shuffle builds per-user first weeks (|users|
    rows). That table is |users|-sized — unbounded, so it is NOT
    force-broadcast (100x the users would OOM executors); AQE
    broadcasts it when it measures small and shuffle-joins otherwise.
    The |weeks|-sized cohort-size dim IS broadcast (weeks are bounded
    by the time range). The distinct + final rollup shuffle
    |users x weeks| rows, never raw events. Retention is an exact-int
    ratio — engine-exact as a double.
    """
    ev = table(spark, sf_dir, "events")
    ue = ev.select(
        "user_id",
        F.floor(
            F.unix_micros(F.col("ts").cast("timestamp")) / _WEEK_US
        ).cast("bigint").alias("wk"),
    )
    cohort = ue.groupBy("user_id").agg(F.min("wk").alias("cohort_wk"))
    size = cohort.groupBy("cohort_wk").agg(
        F.count(F.lit(1)).cast("bigint").alias("cohort_size")
    )
    activity = (
        ue.join(cohort, "user_id")
        .select("user_id", "cohort_wk", (F.col("wk") - F.col("cohort_wk")).alias("offs"))
        .distinct()
    )
    return (
        activity.join(F.broadcast(size), "cohort_wk")
        .groupBy("cohort_wk", F.col("offs").alias("week_offset"), "cohort_size")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_active"))
        .select(
            "cohort_wk",
            "week_offset",
            "n_active",
            "cohort_size",
            (F.col("n_active").cast("double") / F.col("cohort_size")).alias(
                "retention"
            ),
        )
    )


# ---------------------------------------------------------------------------
# B74: robust anomaly detection (median/MAD z-score per event type)
# ---------------------------------------------------------------------------
# Outlier events by ROBUST z-score: (x - median) / MAD. Median/MAD
# shrug off the very outliers being hunted (mean/stddev don't — one
# whale event inflates stddev and hides the rest). Exact interpolated
# medians match across engines (same definition as b56).
_B74_Z = 6.0

B74_ORACLE = f"""
    WITH med AS (
        SELECT event_type, quantile_cont(value, 0.5) AS med
        FROM events GROUP BY event_type
    ),
    mad AS (
        SELECT e.event_type,
               quantile_cont(abs(e.value - m.med), 0.5) AS mad
        FROM events e JOIN med m USING (event_type)
        GROUP BY e.event_type
    )
    SELECT e.event_id, e.event_type, e.value,
           (e.value - m.med) / d.mad AS robust_z
    FROM events e
    JOIN med m USING (event_type)
    JOIN mad d USING (event_type)
    WHERE d.mad > 0 AND abs((e.value - m.med) / d.mad) > {_B74_Z}
"""


@query("b74_robust_anomalies", oracle=B74_ORACLE)
def b74_robust_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Events whose value deviates from their type's median by more
    than {z} MADs — the robust outlier sweep a pipeline runs over
    metrics before trusting aggregates.

    Scale shape: two grouped exact-median passes (per-type medians are
    |types|-sized and BROADCAST back onto the stream both times); the
    event stream itself is scanned, never shuffled. At 100 TB swap
    exact percentile for the b45 approx sketch and the plan shape is
    unchanged.
    """
    ev = table(spark, sf_dir, "events").select(
        "event_id", "event_type", "value"
    )
    med = ev.groupBy("event_type").agg(
        F.expr("percentile(value, 0.5)").alias("med")
    )
    with_med = ev.join(F.broadcast(med), "event_type")
    mad = with_med.groupBy("event_type").agg(
        F.expr("percentile(abs(value - med), 0.5)").alias("mad")
    )
    z = (F.col("value") - F.col("med")) / F.col("mad")
    return (
        with_med.join(F.broadcast(mad), "event_type")
        .filter((F.col("mad") > 0) & (F.abs(z) > _B74_Z))
        .select("event_id", "event_type", "value", z.alias("robust_z"))
    )


# ---------------------------------------------------------------------------
# B75: table profiler (per-column null/distinct/range stats)
# ---------------------------------------------------------------------------
# The ANALYZE-TABLE shape: one scan computes every column's stats, the
# output is one row per column (long format, uniform schema). Numeric
# ranges report as doubles; string ranges as strings — never
# double->string formatting, which the two engines render differently.
_B75_NUM_COLS = ("l_quantity", "l_extendedprice", "l_discount")
_B75_STR_COLS = ("l_returnflag", "l_linestatus")

B75_ORACLE = " UNION ALL ".join(
    [
        f"""SELECT '{c}' AS column_name,
                   CAST(COUNT(*) AS BIGINT) AS n_rows,
                   CAST(COUNT(*) - COUNT({c}) AS BIGINT) AS n_nulls,
                   CAST(COUNT(DISTINCT {c}) AS BIGINT) AS n_distinct,
                   CAST(MIN({c}) AS DOUBLE) AS min_num,
                   CAST(MAX({c}) AS DOUBLE) AS max_num,
                   CAST(NULL AS VARCHAR) AS min_str,
                   CAST(NULL AS VARCHAR) AS max_str
            FROM lineitem"""
        for c in _B75_NUM_COLS
    ]
    + [
        f"""SELECT '{c}', CAST(COUNT(*) AS BIGINT),
                   CAST(COUNT(*) - COUNT({c}) AS BIGINT),
                   CAST(COUNT(DISTINCT {c}) AS BIGINT),
                   CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE),
                   MIN({c}), MAX({c})
            FROM lineitem"""
        for c in _B75_STR_COLS
    ]
)


@query("b75_table_profile", oracle=B75_ORACLE)
def b75_table_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column profile of lineitem: rows, nulls, exact distincts, and
    min/max per column — the stats pass that feeds partition/broadcast
    planning and data-quality monitors.

    ONE scan, by construction: the naive multi-countDistinct agg looks
    single-pass but Catalyst's RewriteDistinctAggregates planned it as
    FIVE separate FileScans (one per distinct column, each with its own
    shuffle) — 5x the read at 100 TB. Instead the profiler unpivots
    map-side — explode of one (col, num_val, str_val) struct per
    profiled column per row — then aggregates twice on narrow keys:

        per (col, value): count            shuffle 1 (map-side partial
                                           collapses dup values first)
        per col: rows/nulls/distinct/min/max over the DISTINCT-value
                                           table — shuffle 2, tiny

    n_rows = sum of value-counts, n_nulls = the NULL value's count,
    n_distinct = non-null distinct-value rows — all exact, same
    definition countDistinct/COUNT(DISTINCT) uses (NULLs excluded).
    At 100 TB swap the per-value exact layer for approx_count_distinct
    (b45) if distincts explode; plan stays one-scan.
    """
    li = table(spark, sf_dir, "lineitem")
    cells = [
        F.struct(
            F.lit(c).alias("col"),
            F.col(c).cast("double").alias("nv"),
            F.lit(None).cast("string").alias("sv"),
        )
        for c in _B75_NUM_COLS
    ] + [
        F.struct(
            F.lit(c).alias("col"),
            F.lit(None).cast("double").alias("nv"),
            F.col(c).cast("string").alias("sv"),
        )
        for c in _B75_STR_COLS
    ]
    long = li.select(F.explode(F.array(*cells)).alias("kv")).select("kv.*")
    per_val = long.groupBy("col", "nv", "sv").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    return per_val.groupBy("col").agg(
        F.sum("cnt").cast("bigint").alias("n_rows"),
        F.coalesce(
            F.sum(
                F.when(F.col("nv").isNull() & F.col("sv").isNull(), F.col("cnt"))
            ),
            F.lit(0),
        )
        .cast("bigint")
        .alias("n_nulls"),
        F.count(
            F.when(F.col("nv").isNotNull() | F.col("sv").isNotNull(), F.lit(1))
        )
        .cast("bigint")
        .alias("n_distinct"),
        F.min("nv").alias("min_num"),
        F.max("nv").alias("max_num"),
        F.min("sv").alias("min_str"),
        F.max("sv").alias("max_str"),
    ).select(
        F.col("col").alias("column_name"),
        "n_rows",
        "n_nulls",
        "n_distinct",
        "min_num",
        "max_num",
        "min_str",
        "max_str",
    )


# ---------------------------------------------------------------------------
# B76: fuzzy matching (blocked + levenshtein-verified pairs)
# ---------------------------------------------------------------------------
# Entity-resolution shape: block on cheap keys (first token x length
# band), THEN pay edit distance only inside blocks — the discipline
# that keeps O(n^2) string comparison off the table. Both engines
# implement unit-cost Levenshtein identically, so the verify is
# oracle-checkable. Neighbor bands are EXPLODED into extra equi-join
# keys (|band diff| <= 1 as a hash join, not a range join), and pairs
# dedup BEFORE the expensive distance call.
_B76_HEAD = 60
_B76_MAX_DIST = 20
# Block purging (r5): a doc whose home (tok1, band) block exceeds this
# cap does not participate in fuzzy matching — the standard entity-
# resolution treatment of non-discriminative blocking keys (oversized
# blocks mean the key carries no signal, and their pair space is
# quadratic: the 100x probe corpus has a ~24k-doc first-token block
# whose Levenshtein clique did not finish in 10 minutes). Applied
# IDENTICALLY in the oracle, so the hash gate verifies the purged
# semantics; driver-scale blocks sit far under the cap (max ~50 at
# sf0.1, ~240 at 10x), so fixture output is unchanged.
_B76_BLOCK_CAP = 1000

B76_ORACLE = f"""
    WITH d0 AS (
        SELECT doc_id, substring(trim(text), 1, {_B76_HEAD}) AS head,
               split_part(trim(text), ' ', 1) AS tok1,
               CAST(floor(length(trim(text)) / 20) AS BIGINT) AS band
        FROM documents
    ),
    ok_blocks AS (
        SELECT tok1, band FROM d0 GROUP BY tok1, band
        HAVING COUNT(*) <= {_B76_BLOCK_CAP}
    ),
    d AS (
        SELECT d0.* FROM d0 JOIN ok_blocks USING (tok1, band)
    ),
    probe AS (
        SELECT doc_id, head, tok1,
               unnest([band - 1, band, band + 1]) AS band_key
        FROM d
    ),
    pairs AS (
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
               a.head AS head_a, b.head AS head_b
        FROM d a JOIN probe b
          ON a.tok1 = b.tok1 AND a.band = b.band_key
             AND a.doc_id < b.doc_id
    )
    SELECT doc_a, doc_b,
           CAST(levenshtein(head_a, head_b) AS BIGINT) AS edit_dist
    FROM pairs
    WHERE levenshtein(head_a, head_b) <= {_B76_MAX_DIST}
"""


@query("b76_fuzzy_match", oracle=B76_ORACLE)
def b76_fuzzy_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy document matching: block on (first token, length band
    +/-1), verify candidates by Levenshtein distance over the head.

    Scale shape: blocking is a pure equi-join (neighbor bands explode
    into extra probe keys — never a range/theta join); candidate
    pairs DISTINCT before the O(len^2) distance kernel so each pair
    pays it once; oversized blocks are PURGED on both engines
    (_B76_BLOCK_CAP — non-discriminative keys carry no signal and
    their pair space is quadratic; the 100x probe's 24k-doc
    first-token block did not finish in 10 min un-purged). Blocking-
    key choice is data-dependent: this corpus has a tiny vocabulary,
    so first-token blocks are coarse; real deployments block on rarer
    keys (rare tokens, minhash bands) with the identical plan shape.
    """
    docs = documents_wide(spark, sf_dir)
    d0 = docs.select(
        "doc_id",
        F.expr(f"substring(trim(text), 1, {_B76_HEAD})").alias("head"),
        F.expr("split_part(trim(text), ' ', 1)").alias("tok1"),
        F.floor(F.length(F.trim("text")) / 20).cast("bigint").alias("band"),
    )
    # block purging (see _B76_BLOCK_CAP): docs in oversized home
    # blocks are excluded BEFORE any join — LEFT SEMI against the
    # bounded ok-blocks key set (the b27 lesson: never an inner join
    # for a filter)
    ok_blocks = (
        d0.groupBy("tok1", "band")
        .agg(F.count(F.lit(1)).alias("bsz"))
        .filter(F.col("bsz") <= _B76_BLOCK_CAP)
        .select("tok1", "band")
    )
    d = d0.join(ok_blocks, ["tok1", "band"], "left_semi")
    probe = d.select(
        F.col("doc_id").alias("doc_b"),
        F.col("head").alias("head_b"),
        "tok1",
        F.explode(
            F.array(F.col("band") - 1, F.col("band"), F.col("band") + 1)
        ).alias("band_key"),
    )
    pairs = (
        d.join(
            probe,
            (d.tok1 == probe.tok1)
            & (d.band == probe.band_key)
            & (d.doc_id < probe.doc_b),
        )
        .select(
            F.col("doc_id").alias("doc_a"),
            "doc_b",
            F.col("head").alias("head_a"),
            "head_b",
        )
        .distinct()
    )
    dist = F.levenshtein("head_a", "head_b")
    return pairs.select(
        "doc_a", "doc_b", dist.cast("bigint").alias("edit_dist")
    ).filter(F.col("edit_dist") <= _B76_MAX_DIST)


# ---------------------------------------------------------------------------
# B77: quartile binning (ntile) + per-bin ranges
# ---------------------------------------------------------------------------
# Equal-frequency binning — the discretization step for feature
# bucketing and tiered SLAs. ntile() has one standard definition
# (floor-balanced bin sizes) in both engines; the (value, event_id)
# ordering makes bin assignment deterministic under ties.

B77_ORACLE = """
    WITH binned AS (
        SELECT event_type, value,
               ntile(4) OVER (PARTITION BY event_type
                              ORDER BY value, event_id) AS quartile
        FROM events
    )
    SELECT event_type, CAST(quartile AS BIGINT) AS quartile,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           MIN(value) AS lo, MAX(value) AS hi
    FROM binned GROUP BY event_type, quartile
"""


@query("b77_value_quartiles", oracle=B77_ORACLE)
def b77_value_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equal-frequency quartiles of event value per type with each
    bin's observed [lo, hi] range — the empirical bucketing a feature
    pipeline persists to discretize at serving time.

    Scale shape: one shuffle on event_type; ntile needs the partition
    sorted, which rides that exchange's sort; the rollup is map-side
    combined on (type, quartile). Per-type partitions must fit a task
    at this plan shape — for heavy-tailed types, bin via b56
    percentile cutpoints instead (no global sort per key).
    """
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("value", "event_id")
    return (
        ev.withColumn("quartile", F.ntile(4).over(w))
        .groupBy("event_type", F.col("quartile").cast("bigint").alias("quartile"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.min("value").alias("lo"),
            F.max("value").alias("hi"),
        )
    )


# ---------------------------------------------------------------------------
# B100: curation capstone v2 — the funnel with the two hardest-won
# stages composed in (near-dup canonicalization + span rewrite)
# ---------------------------------------------------------------------------


def attribute_decision_frame(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """b100's flat gate + exact-dedup decision frame, read PURELY
    from the staged b124 attributes table (r13, VERDICT r12 #1): the
    quality gate is the persisted ``q_verdict`` scalar, the LM gate
    the persisted ``passes_lm`` boolean, and the exact-dedup keeper
    window groups on the persisted ``fingerprint`` — zero
    ``documents`` FileScans (plan-pinned, tests/test_plans.py). At
    100 TB this is the Dolma payoff: re-running the gate cascade
    after a rule change costs one ~70-byte/row scalars scan instead
    of the corpus-wide tokenize+trigram+bigram text passes.

    Stage-rule identity with the text-scanning twin is by
    construction — every persisted column was computed by the SAME
    shared core the twin calls (build_attributes composes
    quality_verdict / bigram_lm_verdict / token_set_fingerprint), so
    b126 == b100 row-for-row (contract test + the sf0.01/sf0.001
    twin-equality receipt in BASELINE.md)."""
    from kafka_streams_sandbox_spark.operators.attributes import (
        attributes_path,
    )

    attrs = spark.read.parquet(attributes_path(spark, sf_dir))
    w_fp = Window.partitionBy("fingerprint")
    return (
        attrs.select(
            "doc_id",
            "source",
            "n_tokens",
            "fingerprint",
            "repetition_ratio",
            (F.col("q_verdict") == "pass").alias("q_pass"),
            "passes_lm",
        )
        .withColumn(
            "lm_pass",
            F.col("q_pass") & F.coalesce("passes_lm", F.lit(False)),
        )
        .drop("passes_lm")
        .withColumn(
            "keep_id",
            F.min(F.when(F.col("lm_pass"), F.col("doc_id"))).over(w_fp),
        )
        .withColumn(
            "ex_keep",
            F.col("lm_pass") & (F.col("doc_id") == F.col("keep_id")),
        )
    )


def _curation_capstone(
    spark: SparkSession,
    sf_dir: str,
    graded: bool,
    from_attributes: bool = False,
) -> DataFrame:
    """The full LLM-curation funnel (r7, VERDICT r6 Next #6): b71
    chains quality -> exact dedup -> mixture -> split but never
    exercises the near-dup family or the span rewrite — the two
    capabilities a real pretraining pipeline runs between gate and
    mixture. b100 composes them, each stage applying the SAME rule its
    standalone operator certifies:

      raw -> quality (b69 gates) -> lm_gate (b108's CCNet-shaped
      corpus-typicality gate, r8 — the shared ``bigram_lm_verdict``
      core scored against the RAW corpus model, the standalone rule
      verbatim) -> dedup_exact (b24 fingerprint, min-id keeper among
      lm survivors) -> dedup_near (b27 banded+verified pairs over the
      survivors -> b55 min-label components -> b60 canonical min-id
      keeper) -> rewrite (b97 span removal over the deduped corpus,
      then RE-GATE kept_tokens >= the b69 floor — the Lee et al. 2022
      order: dedup, rewrite, re-filter) -> mixture (b67 tiers) ->
      train/holdout (b57 buckets).

    Output is the attrition report with BOTH currencies: n_docs and
    n_tokens per stage (token counts switch to post-rewrite
    kept_tokens from the rewrite stage on — the rewrite drops ~no docs
    but real token mass, and a doc-count-only funnel hides it).

    Scale shape: every stage is the standalone operator's plan —
    banding (never all-pairs), star-guarded buckets, spilling
    window-min keepers, posting-list rewrite — composed through
    NARROW id/decision tables. The per-doc decision frame and the two
    id sets that gate later stages are lazily DISK_ONLY-checkpointed:
    each is referenced by 2-3 downstream consumers, and without
    truncation every consumer re-runs the corpus-wide tokenize+score
    lineage (the b27-four-consumer lesson). Wide columns (token
    arrays) never cross these joins — the rewrite re-derives them
    scan-side exactly as b97 does.

    Correctness: rows-only at the driver (banding has no SQL twin);
    the planted contract test re-derives the full funnel in pure
    Python (every stage rule, including the rewrite's keep-first
    interval union) on a corpus that exercises each drop reason.
    """
    from pyspark import StorageLevel

    from kafka_streams_sandbox_spark.operators.dedup import (
        minhash_verified_pairs,
        span_removal_rewrite,
    )
    from kafka_streams_sandbox_spark.operators.extended import (
        min_label_components,
    )

    docs = documents_wide(spark, sf_dir)
    trig = docs.select(
        "doc_id", "source", F.expr(TOKENS_EXPR).alias("toks")
    ).withColumn("tg", F.expr(TRIGRAMS_EXPR))
    q_pass = (F.col("n_tokens") >= _B69_MIN_TOKENS) & (
        F.col("repetition_ratio") <= _B69_MAX_REPETITION
    )
    w_fp = Window.partitionBy("fingerprint")
    if graded:
        from kafka_streams_sandbox_spark.operators.dedup import (
            paragraph_dedup_rewrite,
        )

        # CCNet order (Wenzek et al. 2019; r9 funnel integration,
        # VERDICT r8 #3): paragraph dedup FIRST — b112's shared core
        # over the quality survivors (funnel discipline: later stages
        # contend among survivors) — then the LM gate and EVERY later
        # stage read the paragraph-deduped text. The stage RE-GATES
        # the rewritten token count against the b69 floor, the same
        # rule the span-rewrite stage applies.
        # lazy checkpoint is ESSENTIAL here, not just multi-consumer
        # hygiene (measured at 100x, r9): `raw_q.filter(q_pass)` below
        # lets CollapseProject inline the whole tokenize+trigram chain
        # into one interpreted per-row Filter in which `split(trim(
        # text))` appears ~8x and each trigram element_at re-evaluates
        # it — the b62/b105 trap in filter form; the para stage alone
        # ran > 10 min vs ~15 s with the barrier. raw_q is narrow
        # (5 scalar cols) and has two consumers (the para input's
        # semi join + the decision-frame join).
        if from_attributes:
            # b127 (r13, VERDICT r12 #1): the raw-text quality frame
            # is the persisted attributes scalars — the corpus-wide
            # tokenize+trigram pass this checkpoint used to absorb
            # never runs, and no barrier is needed (the staged
            # parquet IS the materialization; re-scanning ~70-byte
            # rows per consumer is cheaper than a checkpoint write)
            from kafka_streams_sandbox_spark.operators.attributes import (
                attributes_path,
            )

            raw_q = spark.read.parquet(
                attributes_path(spark, sf_dir)
            ).select(
                "doc_id",
                "source",
                "n_tokens",
                "repetition_ratio",
                (F.col("q_verdict") == "pass").alias("q_pass"),
            )
        else:
            raw_q = lazy_checkpoint(
                trig.select(
                    "doc_id",
                    "source",
                    F.size("toks").alias("n_tokens"),
                    (
                        F.lit(1.0)
                        - F.size(F.array_distinct("tg")).cast("double")
                        / F.size("tg")
                    ).alias("repetition_ratio"),
                ).withColumn("q_pass", q_pass)
            )
        para = paragraph_dedup_rewrite(
            docs.join(
                raw_q.filter(F.col("q_pass")).select("doc_id"),
                "doc_id",
                "left_semi",
            ).select("doc_id", "text"),
            with_tokens=True,
        )
        # The paragraph-deduped corpus feeds ~7 downstream scans (lm
        # occurrences + counts, token stats/fingerprint, banding +
        # verify, span-rewrite postings + rebuild), so it materializes
        # once as the rewritten TOKEN ARRAY — in a scratch PARQUET
        # table, not a localCheckpoint (r10, VERDICT r9 #2a, measured
        # at 100x): DISK_ONLY checkpoint blocks hold serialized
        # InternalRows whose 60-element string arrays deserialize on
        # EVERY scan — the lm stage read 43 s and the banding stage
        # 89 s against them, vs 21 s / 32 s for b100's equivalent
        # stages over columnar parquet. The staged parquet gets
        # dictionary/RLE compression and `toks` arrives as a scan
        # ATTRIBUTE (no split expression for CollapseProject to inline
        # into per-element lambdas — the b26 trap). This is also the
        # literal production shape: a CCNet run WRITES its dedup
        # output as a table before LM scoring. (Plan-audit note: the
        # staging write executes at construction, so b113's audited
        # row covers the post-staging plan — the header's
        # multi-consumer caveat applies.)
        stage_dir = scratch_dir("kss-b113-para-")
        para.select("doc_id", F.col("new_toks").alias("toks")).write.mode(
            "overwrite"
        ).parquet(stage_dir)
        srcdocs = spark.read.parquet(stage_dir)
        # the documents_wide gate, applied to the staged table: the
        # file scan PACKS the staged files into maxPartitionBytes-
        # sized partitions (58 MB at the 100x probe -> 2 tasks), and
        # the banding/lm explodes downstream then run ~serial —
        # measured 4x on the banding stage (56 s vs 13.6 s on the
        # identical 264k-doc input). No-op at real scale, where the
        # staged table's splits already exceed the core count.
        target = int(spark.conf.get("spark.sql.shuffle.partitions"))
        if srcdocs.rdd.getNumPartitions() < target:
            srcdocs = srcdocs.repartition(target)
        # the lm model self-trains on the paragraph-deduped corpus —
        # the CCNet sequencing the graded form exists to express
        lm = bigram_lm_verdict(
            srcdocs.filter(F.size("toks") >= 2), with_threshold=True
        ).select("doc_id", "passes_lm", "lm_score", "corpus_score")
        base = (
            raw_q.join(
                srcdocs.select(
                    "doc_id",
                    F.size("toks").alias("p_tokens"),
                    token_set_fingerprint("toks").alias("fingerprint"),
                ),
                "doc_id",
                "left",
            )
            .join(lm, "doc_id", "left")
            .withColumn("p_tokens", F.coalesce("p_tokens", F.lit(0)))
            # quality-failing docs never reach the paragraph stage, so
            # their fingerprint arrives NULL from the left join — and
            # Window.partitionBy(NULL) puts EVERY q-fail doc into one
            # partition: a single-task WindowExec serializing a large
            # corpus fraction at scale (ADVICE r9 #2). A per-doc
            # sentinel keeps those rows in singleton partitions; the
            # keep_id window is a no-op there (lm_pass is already
            # False for every q-fail doc), so results are unchanged.
            .withColumn(
                "fingerprint",
                F.coalesce(
                    F.col("fingerprint"),
                    F.concat(F.lit("miss:"), F.col("doc_id").cast("string")),
                ),
            )
            .withColumn(
                "para_pass",
                F.col("q_pass") & (F.col("p_tokens") >= _B69_MIN_TOKENS),
            )
            .withColumn(
                "lm_pass",
                F.col("para_pass") & F.coalesce("passes_lm", F.lit(False)),
            )
            .drop("passes_lm")
            .withColumn(
                "keep_id",
                F.min(F.when(F.col("lm_pass"), F.col("doc_id"))).over(w_fp),
            )
            .withColumn(
                "ex_keep",
                F.col("lm_pass") & (F.col("doc_id") == F.col("keep_id")),
            )
            .transform(lazy_checkpoint)
        )
    elif from_attributes:
        # b126 (r13, VERDICT r12 #1): the whole gate + exact-dedup
        # decision frame reads the staged attributes scalars —
        # quality verdict, LM verdict, and the b24 fingerprint are
        # persisted columns, so zero documents FileScans until the
        # near-dup stage's survivor text semi-join (plan-pinned via
        # attribute_decision_frame). No checkpoint: the staged
        # parquet is the materialization.
        srcdocs = docs
        base = attribute_decision_frame(spark, sf_dir)
    else:
        srcdocs = docs
        # b108's gate verdict over the RAW corpus model (shared core);
        # only the boolean crosses the join back into the frame
        lm = bigram_lm_verdict(
            trig.select("doc_id", "toks").filter(F.size("toks") >= 2)
        ).select("doc_id", "passes_lm")
        # narrow per-doc decision frame: ~70 bytes/row, three consumers
        base = (
            trig.select(
                "doc_id",
                "source",
                F.size("toks").alias("n_tokens"),
                token_set_fingerprint("toks").alias("fingerprint"),
                (
                    F.lit(1.0)
                    - F.size(F.array_distinct("tg")).cast("double")
                    / F.size("tg")
                ).alias("repetition_ratio"),
            )
            .join(lm, "doc_id", "left")
            .withColumn("q_pass", q_pass)
            .withColumn(
                "lm_pass",
                F.col("q_pass") & F.coalesce("passes_lm", F.lit(False)),
            )
            .drop("passes_lm")
            .withColumn(
                "keep_id",
                F.min(F.when(F.col("lm_pass"), F.col("doc_id"))).over(w_fp),
            )
            .withColumn(
                "ex_keep",
                F.col("lm_pass") & (F.col("doc_id") == F.col("keep_id")),
            )
            .transform(lazy_checkpoint)
        )
    ex_ids = base.filter(F.col("ex_keep")).select("doc_id")
    # near-dup canonicalization over the exact-dedup survivors only
    # (graded: over the paragraph-deduped text — srcdocs)
    if graded:
        # srcdocs carries the checkpointed token ARRAY; banding wants
        # a string. The concat_ws sits in the join INPUT's projection
        # so `text` reaches the char-5-gram transform as a JOIN-OUTPUT
        # ATTRIBUTE — an inlined concat alias would be re-evaluated
        # per n-gram inside the transform lambda (the b26 attribute
        # discipline; O(doc_len^2) if violated).
        nd_in = (
            srcdocs.filter(F.size("toks") > 0)
            .select("doc_id", F.concat_ws(" ", "toks").alias("text"))
            .join(ex_ids, "doc_id", "left_semi")
        )
    else:
        nd_in = srcdocs.join(ex_ids, "doc_id", "left_semi").filter(
            F.expr(f"size({TOKENS_EXPR}) > 0")
        )
    pairs = minhash_verified_pairs(nd_in).select("doc_a", "doc_b")
    labels, _rounds = min_label_components(pairs)
    # No checkpoint (r14): `labels` is already the component loop's
    # materialized DISK_ONLY checkpoint, so both consumers (the rewrite
    # id anti-join + the final frame join) re-run only a trivial
    # filter/project over its blocks — a second checkpoint here bought
    # lineage truncation that lineage already has, for one extra block
    # write per funnel run.
    near_drop = (
        labels.filter(F.col("label") != F.col("node"))
        .select(F.col("node").alias("doc_id"))
        .withColumn("near_dropped", F.lit(True))
    )
    rw_ids = ex_ids.join(near_drop.select("doc_id"), "doc_id", "left_anti")
    # b97's rewrite over the DEDUPED corpus: duplicated spans are
    # re-elected among survivors (a span whose only other occurrence
    # was in a dropped duplicate is no longer "duplicated" — the
    # pipeline-order semantics Lee et al. prescribe)
    rewritten = span_removal_rewrite(
        srcdocs.join(rw_ids, "doc_id", "left_semi").select(
            "doc_id", "toks" if graded else "text"
        ),
        tokens=graded,  # graded: reuse the checkpointed arrays
    ).select("doc_id", "kept_tokens")
    split_bucket = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2), 16, 10
    ).cast("int")
    final = (
        base.join(near_drop, "doc_id", "left")
        .join(rewritten, "doc_id", "left")
        .withColumn(
            "near_keep",
            F.col("ex_keep") & ~F.coalesce("near_dropped", F.lit(False)),
        )
        .withColumn(
            "rw_pass",
            F.col("near_keep")
            & (F.coalesce("kept_tokens", F.lit(0)) >= _B69_MIN_TOKENS),
        )
    )
    if graded:
        # b113: b111's LM-bucketed rates in place of b67's flat tiers
        # — ONE CASE projection over the (lm_score, corpus_score) the
        # frame already carries (the shared bigram_lm_verdict core, so
        # b108's gate, b111's buckets, and this stage cannot drift)
        final = final.withColumn(
            "bucket",
            F.when(F.col("lm_score") >= F.col("corpus_score"), "head")
            .when(
                F.lit(2.0) * F.col("lm_score") >= F.col("corpus_score"),
                "middle",
            )
            .otherwise("tail"),
        ).withColumn(
            "mix_keep",
            F.col("rw_pass")
            & (
                (((F.col("doc_id") % 2147483647) * 48271) % 2147483647)
                % 1000
                < F.when(
                    F.col("bucket") == "head",
                    _B111_RATE_PERMILLE["head"],
                )
                .when(
                    F.col("bucket") == "middle",
                    _B111_RATE_PERMILLE["middle"],
                )
                .otherwise(_B111_RATE_PERMILLE["tail"])
            ),
        )
    else:
        tiers = spark.createDataFrame(_B67_TIERS, "tier int, w double")
        final = (
            final.withColumn(
                "tier", F.expr("TRY_CAST(substring(source, 4) AS INT)") % 4
            )
            .join(F.broadcast(tiers), "tier", "left")
            .withColumn(
                "mix_keep",
                F.col("rw_pass")
                & F.coalesce(
                    (((F.col("doc_id") % 1000) * 16807) % 1000)
                    < (F.col("w") * 1000),
                    F.lit(False),
                ),
            )
        )
    final = final.withColumn(
        "is_train", F.col("mix_keep") & (split_bucket < _SPLIT_BUCKETS_TRAIN)
    )
    kept = F.coalesce("kept_tokens", F.lit(0)).cast("long")
    pre = F.col("n_tokens").cast("long")
    # mid-funnel token currency: raw counts in the flat form; the
    # paragraph-deduped counts from the para stage on in the graded
    # form (the same switch the rewrite stage makes to kept_tokens)
    mid = F.col("p_tokens").cast("long") if graded else pre
    stages = [
        ("raw", F.lit(True), pre),
        ("quality", F.col("q_pass"), pre),
        *([("dedup_para", F.col("para_pass"), mid)] if graded else []),
        ("lm_gate", F.col("lm_pass"), mid),
        ("dedup_exact", F.col("ex_keep"), mid),
        ("dedup_near", F.col("near_keep"), mid),
        ("rewrite", F.col("rw_pass"), kept),
    ]
    if graded:
        # bucket-level attrition: candidates (rewrite survivors) and
        # kept docs per LM bucket, so the report shows the graded
        # rates actually applied — the CCNet head/middle/tail shape
        stages += [
            (f"{b}_in", F.col("rw_pass") & (F.col("bucket") == b), kept)
            for b in ("head", "middle", "tail")
        ] + [
            (f"{b}_kept", F.col("mix_keep") & (F.col("bucket") == b), kept)
            for b in ("head", "middle", "tail")
        ]
    stages += [
        ("mixture", F.col("mix_keep"), kept),
        ("train", F.col("is_train"), kept),
        ("holdout", F.col("mix_keep") & ~F.col("is_train"), kept),
    ]
    one = final.agg(
        *[
            a
            for stage, cond, tok in stages
            for a in (
                F.sum(cond.cast("int")).cast("bigint").alias(f"{stage}_d"),
                F.sum(F.when(cond, tok)).cast("bigint").alias(f"{stage}_t"),
            )
        ]
    )
    # both currencies coalesced: an EMPTY corpus makes every sum NULL
    # (r7 review fix — n_docs previously reported NULL while n_tokens
    # coalesced to 0, an inconsistent report on the routine
    # empty-slice input)
    stack = ", ".join(
        f"'{stage}', coalesce({stage}_d, 0), coalesce({stage}_t, 0)"
        for stage, _, _ in stages
    )
    return one.select(
        F.expr(f"stack({len(stages)}, {stack}) AS (stage, n_docs, n_tokens)")
    )


@query("b100_curation_capstone")  # rows-only: the near-dup stage is
def b100_curation_capstone(  # banding-based (b27's engine-specific label)
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The full curation funnel with b67's flat per-source mixture
    rates — see ``_curation_capstone`` for the stage rules and scale
    shape; b113 is the graded-mixture (b111 LM buckets) form."""
    return _curation_capstone(spark, sf_dir, graded=False)


@query("b113_curation_graded_mixture")  # rows-only: near-dup stage is
def b113_curation_graded_mixture(  # banding-based (b27's label)
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The CCNet-SHAPED funnel (r9, VERDICT r8 #3/#7): b100's chain
    with the two CCNet-specific stages swapped in.

    1. ``dedup_para`` (Wenzek et al. 2019 §3.1, b112's shared
       ``paragraph_dedup_rewrite`` core) runs between quality and the
       LM gate — corpus-wide keep-first at paragraph granularity —
       and EVERY later stage (lm model + scoring, exact fingerprints,
       near-dup banding, span rewrite) reads the paragraph-deduped
       text, the literal CCNet sequencing.
    2. The mixture stage is GRADED by b111's LM buckets instead of
       b67's flat per-source rates: rewrite survivors split into
       head / middle / tail by the (lm_score, corpus_score) pair the
       funnel's lm stage already computed (shared
       ``bigram_lm_verdict`` core — one CASE projection, no new scan
       or shuffle), each bucket downsampling at its configured
       permille via the overflow-safe Lehmer pick.

    The attrition report adds the dedup_para row plus per-bucket
    candidate and kept rows ({head,middle,tail}_{in,kept}) around the
    mixture total — 16 scalar rows, with the token currency switching
    to paragraph-kept counts from the para stage on. The planted
    funnel contract re-derives every stage — paragraph ownership,
    LM buckets, the lot — in pure Python
    (tests/test_ann_contracts.py)."""
    return _curation_capstone(spark, sf_dir, graded=True)


@query("b126_attribute_curation_funnel")  # rows-only: near-dup stage
def b126_attribute_curation_funnel(  # is banding-based (b27's label)
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """b100's funnel with its gate + exact-dedup stages READING THE
    b124 ATTRIBUTES TABLE instead of re-scanning text (r13, VERDICT
    r12 #1 — the Dolma integration): quality = the persisted
    ``q_verdict``, LM gate = the persisted ``passes_lm``, exact dedup
    = a window over the persisted ``fingerprint``
    (``attribute_decision_frame``; plan-pinned to zero documents
    FileScans). Text is touched only where the funnel genuinely needs
    content — the near-dup banding and the span rewrite run over the
    survivors' text exactly as in b100.

    Twin equality: output == b100 row-for-row at both SFs (contract
    test tests/test_funnel_attrs.py + the BASELINE.md receipt) — by
    construction, since every persisted column came from the same
    shared core the twin calls. At 100 TB, re-running the funnel
    after a gate-threshold change costs one scalars scan + the
    survivor-only text stages instead of five corpus text passes."""
    return _curation_capstone(
        spark, sf_dir, graded=False, from_attributes=True
    )


@query("b127_attribute_graded_funnel")  # rows-only: near-dup stage
def b127_attribute_graded_funnel(  # is banding-based (b27's label)
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """b113's CCNet funnel with its RAW-TEXT quality frame reading
    the b124 attributes table (r13, VERDICT r12 #1). Only the first
    gate can come from attributes in the graded form — every later
    signal (LM model, fingerprints, banding) is computed over the
    PARAGRAPH-DEDUPED text by CCNet sequencing, and raw-corpus
    attributes cannot stand in for paragraph-rewritten signals (the
    docstring rule that bounds this integration). Still real: the
    replaced stage was the corpus-wide tokenize+trigram pass.

    Twin equality: output == b113 row-for-row at both SFs (contract
    test + BASELINE.md receipt)."""
    return _curation_capstone(
        spark, sf_dir, graded=True, from_attributes=True
    )


# ---------------------------------------------------------------------------
# B103: temperature-scaled source mixture (alpha = 0.5 rebalancing)
# ---------------------------------------------------------------------------
# The multilingual/domain rebalancing op (exponent-smoothed sampling,
# XLM-R style): per-source quota proportional to n_source^alpha with
# alpha = 0.5, so head sources are downsampled hard and tail sources
# barely at all — b67 reweights by a CONFIGURED per-tier rate; this
# derives the rate from the DATA. quota = min(n, ceil(sqrt(n) * C)):
# no cross-source normalization sum, so every float step (sqrt is
# correctly-rounded IEEE, *3 is exact, ceil is exact) is engine-
# deterministic and the oracle hash holds — a sum-normalized weight
# would differ in the last ulp between engines' summation orders.
# quota = ceil(sqrt(n_source) * 3): binds on the driver fixtures
# (25-doc sources keep 15) and still flattens hard at scale
_B103_SCALE = 3

B103_ORACLE = f"""
    WITH q AS (
        SELECT source, COUNT(*) AS n_source,
               LEAST(COUNT(*), CAST(ceil(sqrt(CAST(COUNT(*) AS DOUBLE))
                                         * {_B103_SCALE}) AS BIGINT)) AS quota
        FROM documents GROUP BY source
    ), r AS (
        SELECT source, doc_id,
               row_number() OVER (
                   PARTITION BY source
                   ORDER BY ((doc_id % 2147483647) * 48271) % 2147483647, doc_id
               ) AS rnk
        FROM documents
    )
    SELECT r.source, CAST(r.doc_id AS BIGINT) AS doc_id,
           CAST(q.n_source AS BIGINT) AS n_source, q.quota,
           CAST(r.rnk AS BIGINT) AS sample_rank
    FROM r JOIN q USING (source)
    WHERE r.rnk <= q.quota
"""


@query("b103_temperature_mixture", oracle=B103_ORACLE)
def b103_temperature_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled mixture: keep the ceil(sqrt(n_source) * 3)
    lowest-Lehmer-hashed docs per source (b64's pure-function-of-id
    pick, so the subsample is reproducible and append-stable).

    Scale shape: the quota is data-dependent, and a naive
    rank <= quota_column filter cannot fuse into WindowGroupLimit —
    the window would buffer and sort EVERY row of the largest source
    in one task. So the plan is staged: (1) the per-source quota table
    (one row per source — a bounded driver collect, the k-row idiom
    b92's seeds use) yields the LITERAL max quota; (2) the rank filter
    against that literal fuses into WindowGroupLimit, bounding every
    task's window state to max_quota rows per source (~8*sqrt(n), not
    n); (3) the exact per-source quota then applies via a broadcast
    join. At 100 TB the head source never materializes as one sorted
    partition — the heap cap is the whole point.
    """
    docs = table(spark, sf_dir, "documents").select("source", "doc_id")
    quotas = docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_source")
    ).select(
        "source",
        "n_source",
        F.least(
            F.col("n_source"),
            F.ceil(F.sqrt(F.col("n_source").cast("double")) * _B103_SCALE).cast(
                "bigint"
            ),
        ).alias("quota"),
    )
    # bounded collect: one row per source (the corpus has a handful;
    # even a real crawl has ~1e5 domains — driver-safe either way).
    # The collected rows THEMSELVES become the broadcast side below
    # (r7 review fix): broadcasting the `quotas` DataFrame would
    # re-execute the full scan+groupBy a second time.
    qrows = quotas.collect()
    max_quota = max((r["quota"] for r in qrows), default=1)
    quota_dim = spark.createDataFrame(
        qrows, "source string, n_source bigint, quota bigint"
    )
    h = ((F.col("doc_id") % F.lit(2147483647)) * F.lit(48271)) % F.lit(2147483647)
    w = Window.partitionBy("source").orderBy(h.asc(), F.col("doc_id").asc())
    ranked = (
        docs.withColumn("sample_rank", F.row_number().over(w))
        # literal cap -> WindowGroupLimit (plan-pinned); the exact
        # data-dependent quota applies right after via broadcast
        .filter(F.col("sample_rank") <= F.lit(int(max_quota)))
    )
    return (
        ranked.join(F.broadcast(quota_dim), "source")
        .filter(F.col("sample_rank") <= F.col("quota"))
        .select(
            "source",
            F.col("doc_id").cast("bigint").alias("doc_id"),
            F.col("n_source").cast("bigint").alias("n_source"),
            "quota",
            F.col("sample_rank").cast("bigint").alias("sample_rank"),
        )
    )
