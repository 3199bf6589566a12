"""Single-scan per-document quality-signals table (b124) and the
attribute-gated funnel that consumes it (b125) — the Dolma
"attributes" pattern (VERDICT r11 #3).

Layer-B extension (BASELINE.json "north_star"); no reference analog —
`KStreamsToKTable.java` has no curation surface. The production
pattern this registers (Dolma's tagger/attribute architecture, also
RedPajama-v2's quality-signal files): compute every per-document
quality signal ONCE, persist the wide (doc_id, signal...) frame, and
let every downstream gate read ATTRIBUTES instead of re-scanning
text. Before b124, each of this repo's gates re-derived its signal
from the corpus per query; b124 composes the existing shared cores —
`quality_verdict` (b69), `repetition_metrics` (b102),
`bigram_lm_verdict` (b108), `dsir_score` (b116) and `_b120_logit`
(b120) — into one table, so the gate rules CANNOT drift from the
standalone operators they came from (one definition each).

Scale design:

- **One corpus text scan.** The narrow (doc_id, lang, source, text)
  base is lazily checkpointed ONCE; every signal core and every
  frozen-artifact build (DSIR histograms, the b120 GD rounds, the
  bigram-LM counts) reads the checkpoint blocks, never the parquet.
  The a36 sizing rule picks the checkpoint over scratch-parquet
  staging here: the base IS the corpus (text-wide), so writing it
  back out would cost more than its consumers' result-stage re-reads.
  A plan-pin test asserts the composed frame contains ZERO
  documents-parquet FileScans (they are absorbed into the one
  checkpoint materialization).
- **Frozen artifacts stay driver-bounded** exactly as their home
  operators keep them: two 256-int DSIR arrays, 257 classifier
  floats; the bigram-LM model is the one corpus-sized artifact and
  stays distributed (checkpointed counts table, SMJ per occurrence —
  b108's measured plan).
- **Assembly is doc_id-keyed joins** of per-doc frames (quality +
  map-only dsir votes + map-only logit in ONE projection; gopher and
  lm join in from their own shuffles). At 100 TB these are plain SMJ
  joins on the natural key — no text crosses any of them.
- **The attributes table is staged once per (app, sf_dir)** as
  scratch parquet (small: ~16 scalars per doc) and memoized; b124
  and b125 read the staged table, and b125's plan provably contains
  NO text scan — the funnel gates on scalars (the whole point of the
  pattern: at 100 TB, re-gating after a threshold change costs one
  attributes scan, not five corpus scans).

Correctness: every b124 column is integer or single-division double
from exact integers — the hash-exact class (b69/b102/b108/b116 all
hash-pass with the same arithmetic) — so b124/b125 are ORACLE-BACKED;
the one float-iterative signal (the b120 logit) rides in the staged
table for consumers but is excluded from the oracle-compared output
(the b55/b92 rows-only precedent applies to it via b120 itself).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_streams_sandbox_spark.catalog import documents_wide
from kafka_streams_sandbox_spark.functions.tokens import (
    DUCK_TRIGRAMS_EXPR,
    TOKENS_EXPR,
    token_set_fingerprint,
)
from kafka_streams_sandbox_spark.operators.pipeline import (
    _B69_MAX_REPETITION,
    _B69_MIN_TOKENS,
    _B108_MIN_BIGRAM_N,
    bigram_lm_verdict,
    quality_verdict,
)
from kafka_streams_sandbox_spark.operators.selection import (
    _DSIR_D,
    _DSIR_TARGET,
    _duck_bucket,
    dsir_histograms,
    dsir_score,
    quality_score_frame,
    train_quality_classifier,
)
from kafka_streams_sandbox_spark.operators.text import (
    _B102_DUP,
    _B102_TOP,
    _duck_dup_cov,
    _duck_grams,
    _duck_top_frac,
    repetition_metrics,
)
from kafka_streams_sandbox_spark.registry import query
from kafka_streams_sandbox_spark.session import (
    lazy_checkpoint,
    release_local_checkpoint,
    scratch_dir,
)

# the oracle-compared attribute columns (the staged table additionally
# carries clf_logit / clf_predicted — float-iterative, b120's
# rows-only class, consumed but never hash-compared)
_ATTR_COLS = [
    "doc_id",
    "lang",
    "source",
    "fingerprint",
    "n_tokens",
    "repetition_ratio",
    "q_verdict",
    "top2_frac",
    "top3_frac",
    "dup5_cov",
    "dup10_cov",
    "passes_repetition",
    "n_bigrams",
    "lm_score",
    "passes_lm",
    "dsir_pos",
    "dsir_tok",
    "dsir_selected",
]

_TARGET_SQL = ", ".join(f"'{s}'" for s in _DSIR_TARGET)

# one combined WITH body: the b69 / b102 / b108 / b116 oracle bodies
# verbatim modulo CTE prefixes (q_/g_/l_/d_) so they compose without
# name collisions; the dsir votes drop b116's `WHERE NOT is_target`
# (attributes score EVERY doc against the same histograms)
_B124_SQL_BODY = f"""base AS MATERIALIZED (
        SELECT doc_id, lang, source, text FROM documents
    ),
    q_tg AS (
        SELECT doc_id, len(toks) AS n_tokens,
               {DUCK_TRIGRAMS_EXPR} AS tg
        FROM (SELECT doc_id,
                     list_filter(regexp_split_to_array(trim(text), '\\s+'),
                                 t -> t != '') AS toks
              FROM base)
    ),
    q AS (
        SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
               (1.0 - CAST(len(list_distinct(tg)) AS DOUBLE) / len(tg))
                   AS repetition_ratio
        FROM q_tg
    ),
    g_t AS (
        SELECT doc_id,
               COALESCE(list_filter(regexp_split_to_array(trim(text), '\\s+'),
                                    x -> x != ''), []) AS toks
        FROM base
    ),
    g_g AS (
        SELECT doc_id, len(toks) AS n_tokens,
               {_duck_grams(2)} AS g2, {_duck_grams(3)} AS g3,
               {_duck_grams(5)} AS g5, {_duck_grams(10)} AS g10
        FROM g_t
    ),
    g AS (
        SELECT doc_id,
               {_duck_top_frac(2)} AS top2_frac,
               {_duck_top_frac(3)} AS top3_frac,
               {_duck_dup_cov(5)} AS dup5_cov,
               {_duck_dup_cov(10)} AS dup10_cov
        FROM g_g
    ),
    l_toks AS (
        SELECT doc_id,
               list_filter(regexp_split_to_array(trim(text), '\\s+'),
                           t -> t != '') AS toks
        FROM base
    ),
    l_occ AS (
        SELECT doc_id,
               unnest(list_transform(range(1, len(toks)),
                                     i -> {{'prev': toks[i],
                                            'next': toks[i+1]}})) AS bg
        FROM l_toks WHERE len(toks) >= 2
    ),
    l_pn AS (
        SELECT bg.prev AS prev_tok, bg.next AS next_tok,
               COUNT(*) AS n_pn
        FROM l_occ GROUP BY 1, 2
    ),
    l_pn2 AS (
        SELECT prev_tok, next_tok, n_pn,
               SUM(n_pn) OVER (PARTITION BY prev_tok) AS n_p
        FROM l_pn
    ),
    l_scored AS (
        SELECT o.doc_id,
               COUNT(*) AS n_bigrams,
               SUM(CASE WHEN c.n_pn >= {_B108_MIN_BIGRAM_N}
                        THEN c.n_pn ELSE 0 END) AS hit_mass,
               SUM(c.n_p) AS base_mass
        FROM l_occ o
        JOIN l_pn2 c ON o.bg.prev = c.prev_tok AND o.bg.next = c.next_tok
        GROUP BY 1
    ),
    l_tot AS (
        SELECT CAST(SUM(hit_mass) AS DOUBLE)
                   / CAST(SUM(n_bigrams) + SUM(base_mass) AS DOUBLE)
                   AS corpus_score
        FROM l_scored
    ),
    l AS (
        SELECT doc_id,
               CAST(n_bigrams AS BIGINT) AS n_bigrams,
               CAST(hit_mass AS DOUBLE)
                   / CAST(n_bigrams + base_mass AS DOUBLE) AS lm_score,
               (2.0 * (CAST(hit_mass AS DOUBLE)
                       / CAST(n_bigrams + base_mass AS DOUBLE)))
                   >= corpus_score AS passes_lm
        FROM l_scored, l_tot
    ),
    d_tok AS (
        SELECT doc_id,
               source IN ({_TARGET_SQL}) AS is_target,
               unnest(list_filter(
                   regexp_split_to_array(trim(text), '\\s+'),
                   t -> t != '')) AS w
        FROM base
    ),
    d_bucketed AS (
        SELECT doc_id, is_target, {_duck_bucket('w')} AS bucket
        FROM d_tok
    ),
    d_hist AS (
        SELECT bucket,
               CAST(SUM(CASE WHEN is_target THEN 1 ELSE 0 END) AS BIGINT)
                   AS c_t,
               CAST(SUM(CASE WHEN is_target THEN 0 ELSE 1 END) AS BIGINT)
                   AS c_r
        FROM d_bucketed GROUP BY bucket
    ),
    d_totals AS (
        SELECT CAST(SUM(c_t) AS BIGINT) AS t_tot,
               CAST(SUM(c_r) AS BIGINT) AS r_tot
        FROM d_hist
    ),
    d_votes AS (
        SELECT b.doc_id,
               CASE WHEN CAST(COALESCE(h.c_t, 0) + 1 AS HUGEINT)
                         * CAST(t.r_tot + {_DSIR_D} AS HUGEINT)
                       > CAST(COALESCE(h.c_r, 0) + 1 AS HUGEINT)
                         * CAST(t.t_tot + {_DSIR_D} AS HUGEINT)
                    THEN 1 ELSE 0 END AS vote
        FROM d_bucketed b
        LEFT JOIN d_hist h USING (bucket)
        CROSS JOIN d_totals t
    ),
    d AS (
        SELECT doc_id,
               CAST(SUM(vote) AS BIGINT) AS dsir_pos,
               CAST(COUNT(*) AS BIGINT) AS dsir_tok
        FROM d_votes GROUP BY doc_id
    ),
    f_fp AS (
        SELECT doc_id,
               md5(array_to_string(list_sort(list_distinct(
                   list_filter(regexp_split_to_array(trim(text), '\\s+'),
                               t -> t != ''))), ' ')) AS fingerprint
        FROM base
    ),
    attrs AS (
        SELECT b.doc_id, b.lang, b.source, f_fp.fingerprint,
               q.n_tokens, q.repetition_ratio,
               CASE WHEN q.n_tokens < {_B69_MIN_TOKENS} THEN 'too_short'
                    WHEN q.repetition_ratio > {_B69_MAX_REPETITION}
                        THEN 'too_repetitive'
                    ELSE 'pass' END AS q_verdict,
               g.top2_frac, g.top3_frac, g.dup5_cov, g.dup10_cov,
               (g.top2_frac <= {_B102_TOP[0][1]}
                AND g.top3_frac <= {_B102_TOP[1][1]}
                AND g.dup5_cov <= {_B102_DUP[0][1]}
                AND g.dup10_cov <= {_B102_DUP[1][1]})
                   AS passes_repetition,
               l.n_bigrams, l.lm_score, l.passes_lm,
               d.dsir_pos, d.dsir_tok,
               2 * d.dsir_pos > d.dsir_tok AS dsir_selected
        FROM base b
        JOIN f_fp USING (doc_id)
        JOIN q USING (doc_id)
        JOIN g USING (doc_id)
        LEFT JOIN l USING (doc_id)
        LEFT JOIN d USING (doc_id)
    )"""

B124_ORACLE = f"""
    WITH {_B124_SQL_BODY}
    SELECT * FROM attrs
"""


def build_attributes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compose the five shared signal cores over ONE checkpointed
    corpus base (module comment). Returns the un-staged wide frame
    (all _ATTR_COLS + clf_logit/clf_predicted)."""
    base = lazy_checkpoint(
        documents_wide(spark, sf_dir).select(
            "doc_id", "lang", "source", "text"
        )
    )
    is_target = F.col("source").isin(*_DSIR_TARGET)

    # frozen driver-bounded artifacts, built off the same base
    c_t, c_r, t_tot, r_tot = dsir_histograms(
        base.withColumn("is_target", is_target)
    )
    weights, bias, clf_base = train_quality_classifier(
        base.withColumn("is_target", is_target)
    )
    release_local_checkpoint(clf_base)

    quality = quality_verdict(base).select(
        "doc_id",
        "n_tokens",
        "repetition_ratio",
        F.col("verdict").alias("q_verdict"),
    )
    gopher = repetition_metrics(base).select(
        "doc_id",
        "top2_frac",
        "top3_frac",
        "dup5_cov",
        "dup10_cov",
        "passes_repetition",
    )
    toks_df = base.select(
        "doc_id", F.expr(TOKENS_EXPR).alias("toks")
    ).filter(F.size("toks") >= 2)
    lm = bigram_lm_verdict(toks_df)
    dsir = dsir_score(base, c_t, c_r, t_tot, r_tot).select(
        "doc_id",
        F.col("n_pos").alias("dsir_pos"),
        F.col("n_tok").alias("dsir_tok"),
        F.col("selected").alias("dsir_selected"),
    )
    clf = quality_score_frame(base, weights, bias).select(
        "doc_id",
        F.col("logit").alias("clf_logit"),
        F.col("predicted").alias("clf_predicted"),
    )
    return (
        base.select(
            "doc_id",
            "lang",
            "source",
            # the b24 exact-dedup join key rides in the table (r13:
            # VERDICT r12 #1 — the attribute-reading funnel's
            # dedup_exact stage groups on this column instead of
            # re-tokenizing the corpus; ONE definition, tokens.py)
            token_set_fingerprint().alias("fingerprint"),
        )
        .join(quality, "doc_id")
        .join(gopher, "doc_id")
        .join(lm, "doc_id", "left")
        .join(dsir, "doc_id", "left")
        .join(clf, "doc_id", "left")
    )


# staged-attributes memo, keyed like catalog._TABLE_CACHE: the table
# is built ONCE per (app, corpus) and every consumer — b124, b125,
# repeated bench reps — reads the scratch parquet (the production
# pattern: attributes are a persisted dataset, not a per-query
# derivation)
_ATTR_CACHE: dict[tuple[str, str], str] = {}


def attributes_path(spark: SparkSession, sf_dir: str) -> str:
    """Build-once path to the staged attributes parquet."""
    key = (spark.sparkContext.applicationId, sf_dir)
    path = _ATTR_CACHE.get(key)
    if path is None:
        path = scratch_dir("kss-attrs-")
        build_attributes(spark, sf_dir).write.mode("overwrite").parquet(
            path
        )
        _ATTR_CACHE[key] = path
    return path


@query("b124_quality_attributes", oracle=B124_ORACLE)
def b124_quality_attributes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Dolma-style per-document attributes table (module comment):
    one row per document, every quality signal the repo's gate family
    computes — b69 quality, b102 Gopher repetition, b108 bigram-LM,
    b116 DSIR votes — persisted once and hash-compared column-for-
    column against the composed oracle. The b120 classifier logit
    rides in the staged table (rows-only class, excluded here)."""
    return spark.read.parquet(attributes_path(spark, sf_dir)).select(
        *_ATTR_COLS
    )


B125_ORACLE = f"""
    WITH {_B124_SQL_BODY},
    gated AS (
        SELECT lang,
               CASE WHEN q_verdict = 'too_short' THEN '1_too_short'
                    WHEN q_verdict = 'too_repetitive'
                        THEN '2_trigram_repetition'
                    WHEN NOT passes_repetition
                        THEN '3_gopher_repetition'
                    WHEN NOT passes_lm THEN '4_lm_atypical'
                    WHEN NOT dsir_selected THEN '5_dsir_offtarget'
                    ELSE '6_keep' END AS gate,
               n_tokens, doc_id
        FROM attrs
    )
    SELECT lang, gate,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS sum_tokens,
           CAST(MIN(doc_id) AS BIGINT) AS min_doc_id
    FROM gated
    GROUP BY lang, gate
"""


@query("b125_attribute_gated_funnel", oracle=B125_ORACLE)
def b125_attribute_gated_funnel(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The funnel that READS ATTRIBUTES, not text (the point of the
    pattern): the b100-style first-failing-gate cascade (length ->
    trigram repetition -> Gopher repetition -> LM typicality -> DSIR
    target affinity) applied as pure column predicates over the
    staged attributes table. The plan provably contains no documents
    scan (plan-pin test) — at 100 TB, re-running the funnel after a
    threshold change costs one scalars-only scan instead of five
    corpus text passes.

    Gate order note: a doc that passes the b69 length gate has
    >= {_B69_MIN_TOKENS} tokens, so its lm/dsir columns are non-NULL
    by construction — the cascade never gates on a NULL (short docs
    exit at '1_too_short' first)."""
    return gate_cascade(spark.read.parquet(attributes_path(spark, sf_dir)))


def gate_cascade(attrs: DataFrame) -> DataFrame:
    """b125's first-failing-gate cascade over ANY attributes relation
    — pure column predicates, factored out (r13) so the a43
    ingest-appended store runs the IDENTICAL funnel report as the
    at-rest b125 (one gate definition, the shared-core discipline)."""
    gate = (
        F.when(F.col("q_verdict") == "too_short", "1_too_short")
        .when(F.col("q_verdict") == "too_repetitive", "2_trigram_repetition")
        .when(~F.col("passes_repetition"), "3_gopher_repetition")
        .when(~F.col("passes_lm"), "4_lm_atypical")
        .when(~F.col("dsir_selected"), "5_dsir_offtarget")
        .otherwise("6_keep")
    )
    return (
        attrs.select("lang", gate.alias("gate"), "n_tokens", "doc_id")
        .groupBy("lang", "gate")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("sum_tokens"),
            F.min("doc_id").alias("min_doc_id"),
        )
    )
