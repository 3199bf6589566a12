"""Text-analysis operators for LLM data pipelines (B23 + extensions).

All per-document (map-only — no shuffle at all): these run at 100 TB
as a single pass over the corpus, embarrassingly parallel, entirely in
JVM built-ins (split/regexp/higher-order functions). That matters: a
Python-UDF language-ID over 100 TB is a 10-100× slower pipeline.

Ratios/scores are per-row arithmetic on exact integers, so doubles are
bit-identical across engines (no aggregation-order issues).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_streams_sandbox_spark.catalog import table
from kafka_streams_sandbox_spark.functions.tokens import TOKENS_EXPR
from kafka_streams_sandbox_spark.registry import query

# BPE-ish pre-tokenizer: letter runs | digit runs | single punctuation.
# Spark SQL string literals process backslash escapes ('\s' -> 's'),
# DuckDB's do not — so regexes are kept in DuckDB form and doubled for
# embedding in Spark SQL expr() strings.
_BPE_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"
_PUNCT_PATTERN = r"[^A-Za-z0-9\s]"
_BPE_SPARK = _BPE_PATTERN.replace("\\", "\\\\")
_PUNCT_SPARK = _PUNCT_PATTERN.replace("\\", "\\\\")

# Tiny per-language stopword lists for the n-gram/stopword language-ID
# heuristic. Order = tie-break priority (en wins ties).
STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "in", "is"),
    "de": ("der", "die", "das", "und", "ist", "nicht"),
    "es": ("el", "la", "que", "de", "y", "los"),
    "fr": ("le", "la", "les", "et", "des", "une"),
    "zh": ("de", "shi", "le", "wo", "ni", "ta"),
}


def _sql_quote_list(words: tuple[str, ...]) -> str:
    return ", ".join(f"'{w}'" for w in words)


def stopword_count_expr(words: tuple[str, ...]) -> str:
    """Spark SQL: count of tokens that are in the stopword list."""
    return (
        f"size(filter({TOKENS_EXPR}, t -> lower(t) IN ({_sql_quote_list(words)})))"
    )


def duck_stopword_count_expr(words: tuple[str, ...]) -> str:
    """DuckDB twin of :func:`stopword_count_expr`."""
    return (
        "len(list_filter(list_filter(regexp_split_to_array(trim(text), '\\s+'),"
        " t -> t != ''),"
        f" t -> list_contains([{_sql_quote_list(words)}], lower(t))))"
    )


# ---------------------------------------------------------------------------
# B23: per-document text statistics
# ---------------------------------------------------------------------------
B23_ORACLE = f"""
    WITH t AS (
        SELECT doc_id, lang, text,
               list_filter(regexp_split_to_array(trim(text), '\\s+'),
                           x -> x != '') AS toks
        FROM documents
    )
    SELECT doc_id, lang,
           CAST(LENGTH(text) AS INTEGER) AS n_chars_m,
           CAST(len(toks) AS INTEGER) AS n_tokens,
           CAST(len(regexp_extract_all(text, '{_PUNCT_PATTERN}')) AS INTEGER) AS n_punct,
           CAST(len(regexp_extract_all(text, '[0-9]')) AS INTEGER) AS n_digits,
           (CAST(LENGTH(text) - LENGTH(REPLACE(text, ' ', '')) AS DOUBLE)
              / nullif(LENGTH(text), 0)) AS space_ratio,
           (CAST(LENGTH(replace(trim(text), ' ', '')) AS DOUBLE)
              / nullif(len(toks), 0)) AS avg_token_len
    FROM t
"""


@query("b23_text_stats", oracle=B23_ORACLE)
def b23_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    toks = F.expr(TOKENS_EXPR)
    n_chars = F.length("text")
    return docs.select(
        "doc_id",
        "lang",
        n_chars.alias("n_chars_m"),
        F.size(toks).alias("n_tokens"),
        F.size(F.expr(f"regexp_extract_all(text, '{_PUNCT_SPARK}', 0)")).alias(
            "n_punct"
        ),
        F.size(F.expr("regexp_extract_all(text, '[0-9]', 0)")).alias("n_digits"),
        # nullif guards: an empty or whitespace-only doc (zero chars /
        # zero tokens) yields NULL ratios instead of an ANSI
        # DIVIDE_BY_ZERO that would kill the whole 100 TB job
        # (tests/test_hostile_inputs.py)
        (
            (n_chars - F.length(F.replace(F.col("text"), F.lit(" "), F.lit(""))))
            .cast("double")
            / F.nullif(n_chars, F.lit(0))
        ).alias("space_ratio"),
        (
            F.length(F.replace(F.trim("text"), F.lit(" "), F.lit("")))
            .cast("double")
            / F.nullif(F.size(toks), F.lit(0))
        ).alias("avg_token_len"),
    )


# ---------------------------------------------------------------------------
# Language identification (stopword-count heuristic, argmax with fixed
# tie-break priority)
# ---------------------------------------------------------------------------
def _langid_case(counts: dict[str, str]) -> str:
    """CASE argmax over per-language scores; dict order = priority."""
    langs = list(counts)
    arms = []
    for i, lang in enumerate(langs):
        others = [counts[o] for o in langs[i + 1 :]]
        cond = " AND ".join(f"{counts[lang]} >= {o}" for o in others) or "TRUE"
        arms.append(f"WHEN {cond} THEN '{lang}'")
    return "CASE " + " ".join(arms) + " ELSE 'und' END"


B29_ORACLE = f"""
    SELECT doc_id, lang AS labeled_lang,
           {_langid_case({lang: duck_stopword_count_expr(ws) for lang, ws in STOPWORDS.items()})}
               AS predicted_lang,
           {" + ".join(duck_stopword_count_expr(ws) for ws in STOPWORDS.values())}
               AS stopword_hits
    FROM documents
"""


@query("b29_language_id", oracle=B29_ORACLE)
def b29_language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-profile language ID. A real pipeline swaps the lists
    for char-n-gram profiles; the dataflow (map-only argmax over k
    scores) is identical.

    Tokenize once into a column, then score per language off it — the
    naive form re-splits the text inside every stopword-count
    expression (~20 splits/row, a 15× slowdown measured at sf0.1).
    """
    docs = table(spark, sf_dir, "documents")
    toked = docs.select(
        "doc_id",
        F.col("lang").alias("labeled_lang"),
        F.expr(f"transform({TOKENS_EXPR}, t -> lower(t))").alias("toks"),
    )
    def count_expr(words: tuple[str, ...]) -> str:
        return f"size(filter(toks, t -> t IN ({_sql_quote_list(words)})))"

    scored = toked.select(
        "doc_id",
        "labeled_lang",
        *[
            F.expr(count_expr(ws)).alias(f"s_{lang}")
            for lang, ws in STOPWORDS.items()
        ],
    )
    return scored.select(
        "doc_id",
        "labeled_lang",
        F.expr(
            _langid_case({lang: f"s_{lang}" for lang in STOPWORDS})
        ).alias("predicted_lang"),
        F.expr(" + ".join(f"s_{lang}" for lang in STOPWORDS)).alias(
            "stopword_hits"
        ),
    )


# ---------------------------------------------------------------------------
# Quality scoring (length / punctuation / stopword-density heuristics)
# ---------------------------------------------------------------------------
_EN_SW = STOPWORDS["en"]

B30_ORACLE = f"""
    WITH t AS (
        SELECT doc_id, text,
               LENGTH(text) AS n_chars_m,
               len(list_filter(regexp_split_to_array(trim(text), '\\s+'),
                               x -> x != '')) AS n_tokens,
               len(regexp_extract_all(text, '{_PUNCT_PATTERN}')) AS n_punct,
               {duck_stopword_count_expr(_EN_SW)} AS sw_hits
        FROM documents
    )
    SELECT doc_id,
           (CAST(sw_hits AS DOUBLE) / nullif(n_tokens, 0)) AS stopword_ratio,
           (CAST(n_punct AS DOUBLE) / nullif(n_chars_m, 0)) AS punct_ratio,
           LEAST(CAST(n_chars_m AS DOUBLE) / 500, CAST(1.0 AS DOUBLE)) AS length_score,
           (0.4 * LEAST(CAST(n_chars_m AS DOUBLE) / 500, CAST(1.0 AS DOUBLE))
            + 0.4 * (CAST(sw_hits AS DOUBLE) / nullif(n_tokens, 0))
            + 0.2 * (1.0 - CAST(n_punct AS DOUBLE) / nullif(n_chars_m, 0)))
               AS quality_score
    FROM t
"""


@query("b30_quality_score", oracle=B30_ORACLE)
def b30_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite quality score ∈ [0,1]-ish: length saturation +
    stopword density + punctuation cleanliness. The standard cheap
    pre-filter before expensive model-based scoring at corpus scale."""
    docs = table(spark, sf_dir, "documents")
    t = docs.select(
        "doc_id",
        F.length("text").alias("n_chars_m"),
        F.size(F.expr(TOKENS_EXPR)).alias("n_tokens"),
        F.size(F.expr(f"regexp_extract_all(text, '{_PUNCT_SPARK}', 0)")).alias(
            "n_punct"
        ),
        F.expr(stopword_count_expr(_EN_SW)).alias("sw_hits"),
    )
    # nullif: empty/whitespace-only docs score NULL, they don't kill
    # the job with an ANSI DIVIDE_BY_ZERO (tests/test_hostile_inputs.py)
    sw_ratio = F.col("sw_hits").cast("double") / F.nullif(
        F.col("n_tokens"), F.lit(0)
    )
    punct_ratio = F.col("n_punct").cast("double") / F.nullif(
        F.col("n_chars_m"), F.lit(0)
    )
    length_score = F.least(
        F.col("n_chars_m").cast("double") / 500, F.lit(1.0)
    )
    return t.select(
        "doc_id",
        sw_ratio.alias("stopword_ratio"),
        punct_ratio.alias("punct_ratio"),
        length_score.alias("length_score"),
        (0.4 * length_score + 0.4 * sw_ratio + 0.2 * (1.0 - punct_ratio)).alias(
            "quality_score"
        ),
    )


# ---------------------------------------------------------------------------
# Token counting (whitespace + BPE-ish regex pre-tokenizer)
# ---------------------------------------------------------------------------
B31_ORACLE = f"""
    SELECT doc_id,
           CAST(len(list_filter(regexp_split_to_array(trim(text), '\\s+'),
                                x -> x != '')) AS INTEGER) AS ws_tokens,
           CAST(len(regexp_extract_all(text, '{_BPE_PATTERN}')) AS INTEGER)
               AS bpe_ish_tokens,
           CAST(CEIL(LENGTH(text) / 4.0) AS BIGINT) AS byte_len_estimate
    FROM documents
"""


@query("b31_token_count", oracle=B31_ORACLE)
def b31_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token budget accounting: whitespace tokens, a BPE-style
    pre-tokenization count, and the chars/4 rule-of-thumb."""
    docs = table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.size(F.expr(TOKENS_EXPR)).alias("ws_tokens"),
        F.size(F.expr(f"regexp_extract_all(text, '{_BPE_SPARK}', 0)")).alias(
            "bpe_ish_tokens"
        ),
        F.ceil(F.length("text") / 4.0).alias("byte_len_estimate"),
    )


# ---------------------------------------------------------------------------
# Document fingerprinting (canonical token-set signature)
# ---------------------------------------------------------------------------
B32_ORACLE = """
    SELECT doc_id,
           md5(array_to_string(list_sort(list_distinct(
               list_filter(regexp_split_to_array(trim(lower(text)), '\\s+'),
                           t -> t != ''))), ' ')) AS fingerprint,
           CAST(len(list_distinct(
               list_filter(regexp_split_to_array(trim(lower(text)), '\\s+'),
                           t -> t != ''))) AS INTEGER) AS vocab_size
    FROM documents
"""


@query("b32_fingerprint", oracle=B32_ORACLE)
def b32_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-insensitive document fingerprint: md5 over the sorted
    distinct lowercase token set (the join key for cross-corpus
    provenance; see b24 for the dedup use)."""
    docs = table(spark, sf_dir, "documents")
    toks = F.expr(
        r"filter(split(trim(lower(text)), '\\s+'), t -> t != '')"
    )
    distinct_sorted = F.array_sort(F.array_distinct(toks))
    return docs.select(
        "doc_id",
        F.md5(F.array_join(distinct_sorted, " ")).alias("fingerprint"),
        F.size(F.array_distinct(toks)).alias("vocab_size"),
    )


# ---------------------------------------------------------------------------
# Rolling-hash fingerprint (polynomial / Rabin-Karp style)
# ---------------------------------------------------------------------------
_RH_PRIME = 1_000_000_007
_RH_BASE = 31

B33RH_ORACLE = f"""
    SELECT doc_id,
           list_reduce(
               [CAST(0 AS BIGINT)] || list_transform(
                   regexp_split_to_array(text, ''), c -> CAST(ord(c) AS BIGINT)),
               (h, c) -> (h * {_RH_BASE} + c) % {_RH_PRIME}) AS rolling_hash,
           CAST(LENGTH(text) AS BIGINT) AS n_chars_m
    FROM documents
"""


@query("b53_rolling_hash", oracle=B33RH_ORACLE)
def b53_rolling_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Polynomial rolling hash over the character stream (Rabin-Karp
    form): h = (h*B + code) mod P folded left-to-right — the primitive
    under substring fingerprinting/winnowing. One fold pass per doc,
    map-only; the modulus keeps every step inside int64 under ANSI
    arithmetic, and the left fold is order-deterministic so the value
    is engine-exact."""
    docs = table(spark, sf_dir, "documents")
    fold = (
        f"aggregate(split(text, ''), CAST(0 AS BIGINT), "
        f"(h, c) -> pmod(h * {_RH_BASE} + ascii(c), {_RH_PRIME}))"
    )
    return docs.select(
        "doc_id",
        F.expr(fold).alias("rolling_hash"),
        F.length("text").cast("bigint").alias("n_chars_m"),
    )


# ---------------------------------------------------------------------------
# B102: Gopher-style repetition rules (Rae et al. 2021, Table A1)
# ---------------------------------------------------------------------------
# The two repetition families the Gopher/MassiveText pipeline filters
# on, restated over word n-grams (this corpus has no line structure,
# so the line-level rules are vacuous here):
#   top-n-gram fraction  (n=2,3): tokens covered by the single most
#       frequent n-gram as a fraction of all tokens — catches
#       "buy now buy now buy now" spam;
#   dup-n-gram coverage  (n=5,10): fraction of token POSITIONS covered
#       by any n-gram occurring >= 2x within the doc — catches long
#       boilerplate blocks repeated inside one page. Positions are
#       counted once however many duplicated grams cover them
#       (interval-union semantics, the same discipline as b87/b97).
# Gopher measures characters; token positions are the same signal with
# an engine-exact oracle (single integer division per metric). The
# thresholds are Gopher's published ones.
#
# Scale shape: b63's per-row HOF form would be QUADRATIC per row for a
# degenerate doc (count-of-each-distinct-gram is a nested loop — the
# exact trap b97's r7 rewrite removed), so this is a posting-list
# plan instead: explode (doc, n, gram, pos), one uniform-hash count
# per (doc, n, gram), coverage via the duplicated grams' position
# union. Every shuffle key is (doc_id, n[, gram|pos]) — uniform by
# construction; the collect_list of positions is bounded by a single
# document's own token count (the row is smaller than the doc text).
_B102_TOP = ((2, 0.20), (3, 0.18))  # (n, max top-n-gram fraction)
_B102_DUP = ((5, 0.15), (10, 0.10))  # (n, max dup-n-gram coverage)


def _duck_grams(n: int) -> str:
    if n == 2:
        body = "toks[i] || ' ' || toks[i+1]"
    else:
        body = f"array_to_string(toks[i:i+{n - 1}], ' ')"
    return (
        f"CASE WHEN len(toks) >= {n} THEN "
        f"list_transform(range(1, len(toks) - {n - 2}), i -> {body}) "
        "ELSE [] END"
    )


def _duck_top_frac(n: int) -> str:
    return f"""CASE WHEN len(g{n}) > 0 THEN
        CAST(list_max(list_transform(list_distinct(g{n}),
                 x -> len(list_filter(g{n}, y -> y = x)))) * {n} AS DOUBLE)
            / n_tokens
        ELSE 0.0 END"""


def _duck_dup_cov(n: int) -> str:
    return f"""CASE WHEN len(g{n}) > 0 THEN
        CAST(len(list_distinct(flatten(list_transform(
                 range(1, len(g{n}) + 1),
                 i -> CASE WHEN len(list_filter(g{n}, y -> y = g{n}[i])) >= 2
                      THEN range(i, i + {n}) ELSE [] END)))) AS DOUBLE)
            / n_tokens
        ELSE 0.0 END"""


B102_ORACLE = f"""
    WITH t AS (
        SELECT doc_id,
               COALESCE(list_filter(regexp_split_to_array(trim(text), '\\s+'),
                                    x -> x != ''), []) AS toks
        FROM documents
    ), g AS (
        SELECT doc_id, len(toks) AS n_tokens,
               {_duck_grams(2)} AS g2, {_duck_grams(3)} AS g3,
               {_duck_grams(5)} AS g5, {_duck_grams(10)} AS g10
        FROM t
    ), m AS (
        SELECT doc_id, n_tokens,
               {_duck_top_frac(2)} AS top2_frac,
               {_duck_top_frac(3)} AS top3_frac,
               {_duck_dup_cov(5)} AS dup5_cov,
               {_duck_dup_cov(10)} AS dup10_cov
        FROM g
    )
    SELECT doc_id, CAST(n_tokens AS INTEGER) AS n_tokens,
           top2_frac, top3_frac, dup5_cov, dup10_cov,
           (top2_frac <= {_B102_TOP[0][1]} AND top3_frac <= {_B102_TOP[1][1]}
            AND dup5_cov <= {_B102_DUP[0][1]}
            AND dup10_cov <= {_B102_DUP[1][1]}) AS passes_repetition
    FROM m
"""


def repetition_metrics(docs: DataFrame) -> DataFrame:
    """b102's body over an arbitrary documents frame — shared by the
    batch query and a30's ingest-stream twin (per-doc metrics depend
    only on the doc itself, so the stream core is the SAME code, not
    a rewrite — the a25/a28 discipline)."""
    toks = docs.select(
        "doc_id",
        F.expr(f"coalesce({TOKENS_EXPR}, array())").alias("toks"),
    ).select("doc_id", "toks", F.size("toks").alias("n_tokens"))
    # The explode below is the CPU stage; a small fixture arrives as
    # ONE file split and would run it serially. When (and only when)
    # input splits < cores, spread the narrow token projection — at
    # corpus scale splits >> cores and this is a no-op, so no shuffle
    # is added to the 100 TB plan. (Streaming micro-batch frames reach
    # here through a30's foreachBatch as plain batch frames.)
    para = docs.sparkSession.sparkContext.defaultParallelism
    if not docs.isStreaming and toks.rdd.getNumPartitions() < para:
        toks = toks.repartition(para)

    # ONE scan, ONE explode, int64 gram keys (r7 bench findings): a
    # per-n union re-reads and re-tokenizes the corpus 4x, grouping
    # on raw 10-gram STRINGS shuffles ~60-char keys (the counts stage
    # was 3.4 s of the 4 s sf0.1 wall), and building the gram STRING
    # per posting (concat_ws over a slice) dominated the explode
    # itself. Tokens are xxhash64-hashed ONCE each; a gram key is the
    # multi-arg xxhash64 of its n token hashes — pure int64 ops, no
    # per-gram string allocation. Counts over these keys equal counts
    # over the gram strings (b26's argument — within-doc collisions
    # negligible), so the string-keyed oracle still matches exactly.
    th = toks.select(
        "doc_id",
        "n_tokens",
        F.expr("transform(toks, t -> xxhash64(t))").alias("th"),
    )

    def _pg(n: int) -> str:
        args = ", ".join(f"element_at(th, i + {j})" for j in range(n))
        return f"""CASE WHEN size(th) >= {n}
            THEN transform(sequence(1, size(th) - {n - 1}),
                 i -> named_struct('n', {n}, 'pos', i,
                      'gram_h', xxhash64({args})))
            ELSE CAST(array() AS
                 ARRAY<STRUCT<n: INT, pos: INT, gram_h: BIGINT>>) END"""

    all_pg = ", ".join(_pg(n) for n, _ in (*_B102_TOP, *_B102_DUP))
    # explode_OUTER + an explicit post-generate NULL filter: plain
    # explode lets constraint inference push `size(concat(...)) > 0`
    # into the scan with the whole hash chain INLINED (measured 5-9 s
    # vs 2.5 s at sf0.1 — the b62 recompute trap), while a bare outer
    # explode emits a NULL posting row for zero-token docs whose
    # n_tokens=0 would reach the metric divisions (ANSI
    # DIVIDE_BY_ZERO). The filter is on the GENERATED column, so it
    # cannot push below the Generate; empty docs re-enter via the
    # base left join below.
    posting = th.select(
        "doc_id",
        "n_tokens",
        F.explode_outer(F.expr(f"concat({all_pg})")).alias("pg"),
    ).filter(F.col("pg").isNotNull()).select(
        "doc_id",
        "n_tokens",
        F.col("pg.n").alias("n"),
        F.col("pg.pos").alias("pos"),
        F.col("pg.gram_h").alias("gram"),
    )

    dup_ns = [n for n, _ in _B102_DUP]
    counts = posting.groupBy("doc_id", "n", "gram").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.first("n_tokens").alias("n_tokens"),
        # bounded: positions of ONE gram inside ONE doc — never larger
        # than the doc itself (contrast the unbounded cross-corpus
        # collect_list b28 OOMed on). Gathered only for the dup-rule
        # n values (r7 review fix): the coverage branch never reads
        # n=2/3 positions, and those are the most numerous gram
        # families — a spam doc duplicates nearly ALL its 2-grams.
        F.collect_list(
            F.when(F.col("n").isin(dup_ns), F.col("pos"))
        ).alias("positions"),
    )

    top = counts.groupBy("doc_id", "n").agg(
        F.max("cnt").alias("max_cnt"), F.first("n_tokens").alias("n_tokens")
    )
    n_cov = (
        counts.filter(F.col("cnt") >= 2)
        .filter(F.col("n").isin(dup_ns))
        .select(
            "doc_id",
            "n",
            F.explode(
                F.expr("flatten(transform(positions, p -> sequence(p, p + n - 1)))")
            ).alias("pos"),
        )
        .distinct()
        .groupBy("doc_id", "n")
        .agg(F.count(F.lit(1)).alias("covered"))
    )
    metrics = top.join(n_cov, ["doc_id", "n"], "left").select(
        "doc_id",
        "n",
        (
            (F.col("max_cnt") * F.col("n")).cast("double") / F.col("n_tokens")
        ).alias("top_frac"),
        (
            F.coalesce(F.col("covered"), F.lit(0)).cast("double")
            / F.col("n_tokens")
        ).alias("dup_cov"),
    )
    wide = metrics.groupBy("doc_id").agg(
        *[
            F.max(F.when(F.col("n") == n, F.col("top_frac"))).alias(
                f"top{n}_frac"
            )
            for n, _ in _B102_TOP
        ],
        *[
            F.max(F.when(F.col("n") == n, F.col("dup_cov"))).alias(
                f"dup{n}_cov"
            )
            for n, _ in _B102_DUP
        ],
    )
    base = toks.select("doc_id", "n_tokens")
    out = base.join(wide, "doc_id", "left")
    m = {
        c: F.coalesce(F.col(c), F.lit(0.0))
        for c in ("top2_frac", "top3_frac", "dup5_cov", "dup10_cov")
    }
    passes = (
        (m["top2_frac"] <= _B102_TOP[0][1])
        & (m["top3_frac"] <= _B102_TOP[1][1])
        & (m["dup5_cov"] <= _B102_DUP[0][1])
        & (m["dup10_cov"] <= _B102_DUP[1][1])
    )
    return out.select(
        "doc_id",
        "n_tokens",
        m["top2_frac"].alias("top2_frac"),
        m["top3_frac"].alias("top3_frac"),
        m["dup5_cov"].alias("dup5_cov"),
        m["dup10_cov"].alias("dup10_cov"),
        passes.alias("passes_repetition"),
    )


@query("b102_gopher_repetition", oracle=B102_ORACLE)
def b102_gopher_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher repetition-rule suite: per-doc top-{2,3}-gram token
    fraction and duplicated-{5,10}-gram position coverage, plus the
    combined pass/fail verdict at Gopher's published thresholds.

    Posting-list plan (see module comment): per-row nested-loop gram
    counting is quadratic for a degenerate mega-doc, so grams explode
    to (doc_id, n, gram, pos) rows and everything downstream is
    uniform-hash aggregation — the same 100 TB discipline as
    b87/b97. Empty/NULL/whitespace docs produce all-zero metrics and
    pass (nothing to repeat); they re-enter via the left join from the
    per-doc base, so the output is exactly one row per input doc.
    """
    return repetition_metrics(table(spark, sf_dir, "documents"))
