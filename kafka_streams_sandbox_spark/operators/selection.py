"""Training-data selection & tokenizer-preparation operators
(b116–b118, b120): DSIR-style hashed importance selection, distributed
BPE merge training / application, and the hashed logistic quality
classifier.

Layer-B extensions (BASELINE.json "north_star": LLM-pipeline operators
at 100 TB scale). No reference analog — `KStreamsToKTable.java` has no
selection or tokenizer surface; these follow the repo's Layer-B
conventions (exact-integer outputs, bounded collects, map-only scoring
passes).

Scale design, shared by all three:

- The only corpus-wide passes are token scans (map-only explode +
  partial-agg groupBy on a SMALL key domain: 256 hash buckets for
  b116, the distinct-word vocabulary for b117/b118). Everything
  iterative (BPE merge rounds) runs on the VOCABULARY table weighted
  by word counts — the standard scalable BPE formulation (Sennrich et
  al. 2016 operate on word-frequency dicts, not raw text; so do the
  Hugging Face / SentencePiece trainers). At 100 TB the vocab is
  ~1e7–1e8 rows; each merge round is one vocab scan + a ONE-ROW
  bounded collect (the b72 idiom), never a corpus pass.
- b116's per-document scoring pass is map-only: the two 256-bucket
  hashed-token distributions are collected (bounded, 512 rows) and
  inlined as literal arrays, so selection is a single scan with zero
  per-token shuffle — the shape that survives 1000 executors.
- All outputs are exact integers (counts, votes); the one place real
  DSIR uses log-ratios is replaced by an exact cross-multiplied
  integer comparison per token (see b116's docstring) so the result is
  bit-identical across engines — the b58 ranking-not-logs discipline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_streams_sandbox_spark.catalog import table
from kafka_streams_sandbox_spark.functions.tokens import TOKENS_EXPR
from kafka_streams_sandbox_spark.registry import query
from kafka_streams_sandbox_spark.session import lazy_checkpoint

# ---------------------------------------------------------------------------
# B116: DSIR-style hashed importance selection
# ---------------------------------------------------------------------------
# Xie et al. 2023 ("Data Selection for Language Models via Importance
# Resampling"): estimate target vs raw token distributions over HASHED
# n-gram buckets, weight each raw document by how much its tokens look
# like the target, select the top mass. This implementation keeps the
# structure (hashed unigram buckets, Laplace-smoothed target/raw
# distributions, per-document aggregation, threshold selection) and
# replaces the per-token log(p_t/p_r) with its exact SIGN via integer
# cross-multiplication:
#
#     log((c_t[b]+1)/(T+D)) - log((c_r[b]+1)/(R+D)) > 0
#   ⟺ (c_t[b]+1) * (R+D)  >  (c_r[b]+1) * (T+D)        (all integers)
#
# A document is selected when a strict majority of its token
# occurrences vote target-leaning. Exactness is the point: summed
# float logs are not bit-stable across libm implementations (the b58
# lesson), while the vote is integer arithmetic — so the oracle gate
# is hash-exact. The cross-products reach ~(1e13)^2 at 100 TB token
# counts, past BIGINT: both engines compute them in wide exact types
# (Spark DECIMAL(38,0), DuckDB HUGEINT).
#
# "Target" here is a curated-sources stand-in (src0–src3, ~20% of the
# synthetic corpus); in production it is the Wikipedia/books slice
# DSIR targets. 256 buckets = first two hex chars of md5(token) — the
# b57 engine-portable hash idiom. Real DSIR uses ~1e4 buckets of
# hashed bigrams; the bucket count is a constant, not a scale knob
# (the distribution tables stay driver-bounded either way).

_DSIR_D = 256
_DSIR_TARGET = ("src0", "src1", "src2", "src3")

_BUCKET_HEX = "0123456789abcdef"

# gram-unit array exprs (r11, VERDICT r10 #5): published DSIR hashes
# BIGRAMS, not unigrams — the bucket geometry (256 here vs DSIR's
# ~1e4) stays a fixture constant either way, but the hashed UNIT is
# parameterized so b121 registers the paper-faithful bigram form
# while b116/a38 keep the unigram anchor. Adjacent-pair strings are
# built from the token array scan-side via zip-of-slices — NOT
# element_at over a sequence: an element_at(<split-expr>, i) inside
# the per-element lambda re-evaluates the SPLIT once per access
# (O(tokens²) per doc — the first cut cost b121 17.2 s at sf0.1 vs
# ~1.4 s for this form; the b62/b105 inlined-expression trap in
# lambda clothing). slice() touches the split a constant number of
# times per ROW. Docs with < 2 tokens carry no bigram evidence and
# yield an empty array (excluded by the same n > 0 rule that
# excludes token-free docs in the unigram form).
_GRAMS_EXPR = {
    "uni": TOKENS_EXPR,
    "bi": (
        f"CASE WHEN size({TOKENS_EXPR}) >= 2 THEN "
        f"transform(arrays_zip("
        f"slice({TOKENS_EXPR}, 1, size({TOKENS_EXPR}) - 1), "
        f"slice({TOKENS_EXPR}, 2, size({TOKENS_EXPR}) - 1)), "
        f"p -> concat(p['0'], ' ', p['1'])) "
        f"ELSE cast(array() as array<string>) END"
    ),
}

# gram COUNT without rebuilding the gram array (the scoring pass
# needs n separately from the vote filter, and size(<grams expr>)
# would re-run every per-pair concat just to count them). NULL text
# counts 0 under "bi" (Spark's greatest() SKIPS NULL args, so
# greatest(NULL, 0) = 0 — ADVICE r11 #1) and NULL under "uni"; both
# fall to the same n > 0 exclusion either way.
_GRAMS_COUNT = {
    "uni": f"size({TOKENS_EXPR})",
    "bi": f"greatest(size({TOKENS_EXPR}) - 1, 0)",
}


def _duck_bucket(expr: str) -> str:
    """DuckDB: first-2-hex-chars-of-md5 → 0..255 (b57 idiom)."""
    return (
        f"16 * (strpos('{_BUCKET_HEX}', substring(md5({expr}), 1, 1)) - 1)"
        f" + (strpos('{_BUCKET_HEX}', substring(md5({expr}), 2, 1)) - 1)"
    )


# everything downstream of the gram-unit rows is IDENTICAL between
# the unigram (b116) and bigram (b121) forms — one shared SQL body,
# two `tok` CTE heads
_DSIR_ORACLE_BODY = f"""bucketed AS (
        SELECT doc_id, lang, is_target, {_duck_bucket('w')} AS bucket
        FROM tok
    ),
    hist AS (
        SELECT bucket,
               CAST(SUM(CASE WHEN is_target THEN 1 ELSE 0 END) AS BIGINT)
                   AS c_t,
               CAST(SUM(CASE WHEN is_target THEN 0 ELSE 1 END) AS BIGINT)
                   AS c_r
        FROM bucketed GROUP BY bucket
    ),
    totals AS (
        SELECT CAST(SUM(c_t) AS BIGINT) AS t_tot,
               CAST(SUM(c_r) AS BIGINT) AS r_tot
        FROM hist
    ),
    votes AS (
        SELECT b.doc_id, b.lang,
               CASE WHEN CAST(COALESCE(h.c_t, 0) + 1 AS HUGEINT)
                         * CAST(t.r_tot + {_DSIR_D} AS HUGEINT)
                       > CAST(COALESCE(h.c_r, 0) + 1 AS HUGEINT)
                         * CAST(t.t_tot + {_DSIR_D} AS HUGEINT)
                    THEN 1 ELSE 0 END AS vote
        FROM bucketed b
        LEFT JOIN hist h USING (bucket)
        CROSS JOIN totals t
        WHERE NOT b.is_target
    ),
    per_doc AS (
        SELECT doc_id, lang,
               CAST(SUM(vote) AS BIGINT) AS n_pos,
               CAST(COUNT(*) AS BIGINT) AS n_tok
        FROM votes GROUP BY doc_id, lang
    )
    SELECT lang, 2 * n_pos > n_tok AS selected,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_pos) AS BIGINT) AS sum_pos_votes,
           CAST(SUM(n_tok) AS BIGINT) AS sum_tokens,
           CAST(MIN(doc_id) AS BIGINT) AS min_doc_id
    FROM per_doc
    GROUP BY 1, 2
"""

B116_ORACLE = f"""
    WITH tok AS (
        SELECT doc_id, lang,
               source IN ('src0','src1','src2','src3') AS is_target,
               unnest(list_filter(
                   regexp_split_to_array(trim(text), '\\s+'),
                   t -> t != '')) AS w
        FROM documents
    ),
    {_DSIR_ORACLE_BODY}
"""


def dsir_histograms(
    docs: DataFrame,
    gram: str = "uni",
) -> tuple[list[int], list[int], int, int]:
    """One 256-key partial-agg gram pass over `docs` (which must
    carry an `is_target` boolean) → (c_t, c_r, t_tot, r_tot), the
    driver-bounded frozen artifact (≤512 collected rows). Shared by
    b116 (self-corpus histograms), b121 (bigram units) and a38
    (standing-corpus frozen histograms)."""
    bucket = (
        F.conv(F.substring(F.md5(F.col("w")), 1, 2), 16, 10).cast("int")
    )
    hist_rows = (
        docs.select(
            "is_target", F.explode(F.expr(_GRAMS_EXPR[gram])).alias("w")
        )
        .select("is_target", bucket.alias("bucket"))
        .groupBy("bucket")
        .agg(
            F.sum(F.when(F.col("is_target"), 1).otherwise(0)).alias("c_t"),
            F.sum(F.when(F.col("is_target"), 0).otherwise(1)).alias("c_r"),
        )
        .collect()  # bounded: ≤ _DSIR_D rows
    )
    c_t = [0] * _DSIR_D
    c_r = [0] * _DSIR_D
    for row in hist_rows:
        c_t[row["bucket"]] = row["c_t"]
        c_r[row["bucket"]] = row["c_r"]
    return c_t, c_r, sum(c_t), sum(c_r)


def dsir_score(
    docs: DataFrame,
    c_t: list[int],
    c_r: list[int],
    t_tot: int,
    r_tot: int,
    gram: str = "uni",
) -> DataFrame:
    """Map-only DSIR vote scoring of `docs` against the (c_t, c_r)
    distributions: (doc_id, lang, n_pos, n_tok, selected) — n_tok is
    the number of scored gram units (tokens for "uni", adjacent pairs
    for "bi"). The distributions are inlined as literal arrays so the
    pass has zero per-token shuffle; votes are exact integer
    cross-products in DECIMAL(38,0) (module header)."""
    grams = _GRAMS_EXPR[gram]
    ct_arr = "array(" + ",".join(str(x) for x in c_t) + ")"
    cr_arr = "array(" + ",".join(str(x) for x in c_r) + ")"
    vote = (
        f"size(filter({grams}, t -> "
        f"CAST(element_at({ct_arr},"
        f" CAST(conv(substring(md5(t), 1, 2), 16, 10) AS INT) + 1) + 1"
        f" AS DECIMAL(38,0)) * {r_tot + _DSIR_D} > "
        f"CAST(element_at({cr_arr},"
        f" CAST(conv(substring(md5(t), 1, 2), 16, 10) AS INT) + 1) + 1"
        f" AS DECIMAL(38,0)) * {t_tot + _DSIR_D}))"
    )
    return (
        docs.select(
            "doc_id",
            "lang",
            F.expr(vote).cast("long").alias("n_pos"),
            F.expr(_GRAMS_COUNT[gram]).cast("long").alias("n_tok"),
        )
        # token-free docs (NULL/empty/whitespace text) carry no DSIR
        # evidence and are excluded — the same population the SQL
        # oracle scores (unnest of an empty token list emits no rows),
        # and the guard that keeps NULL text from surfacing NULL
        # counts (size(split(NULL)) is NULL, found by the r10 hostile
        # corpus)
        .filter(F.col("n_tok") > 0)
        .withColumn("selected", 2 * F.col("n_pos") > F.col("n_tok"))
    )


def _dsir_selection(
    spark: SparkSession, sf_dir: str, gram: str
) -> DataFrame:
    """Shared b116/b121 body: histogram pass + map-only vote pass at
    the given gram unit."""
    docs = table(spark, sf_dir, "documents")
    is_target = F.col("source").isin(*_DSIR_TARGET)

    c_t, c_r, t_tot, r_tot = dsir_histograms(
        docs.withColumn("is_target", is_target), gram
    )
    return (
        dsir_score(docs.filter(~is_target), c_t, c_r, t_tot, r_tot, gram)
        .groupBy("lang", "selected")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_pos").alias("sum_pos_votes"),
            F.sum("n_tok").alias("sum_tokens"),
            F.min("doc_id").alias("min_doc_id"),
        )
    )


@query("b116_dsir_selection", oracle=B116_ORACLE)
def b116_dsir_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR-style selection of raw documents toward a curated target
    distribution (see module header for the exact-vote formulation).

    Plan shape (the 100 TB story):
      pass 1: token → bucket explode, groupBy(bucket, is_target) —
              256-key partial-agg-dominated shuffle, then a BOUNDED
              collect of ≤512 rows inlined as two literal arrays.
      pass 2: map-only scoring — per doc, votes counted inside one
              higher-order filter over the token array (md5 + integer
              compare per token, all JVM built-ins), then a
              (lang, selected) groupBy over ~10 keys.
    Zero per-token shuffle in pass 2; no Python anywhere.
    """
    return _dsir_selection(spark, sf_dir, "uni")


B121_ORACLE = f"""
    WITH tokl AS (
        SELECT doc_id, lang,
               source IN ('src0','src1','src2','src3') AS is_target,
               list_filter(regexp_split_to_array(trim(text), '\\s+'),
                           t -> t != '') AS l
        FROM documents
    ),
    tok AS (
        SELECT doc_id, lang, is_target, u.p[1] || ' ' || u.p[2] AS w
        FROM tokl, UNNEST(list_zip(l, l[2:])) AS u(p)
        WHERE u.p[2] IS NOT NULL
    ),
    {_DSIR_ORACLE_BODY}
"""


@query("b121_dsir_bigram_selection", oracle=B121_ORACLE)
def b121_dsir_bigram_selection(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """b116 at the gram unit DSIR actually publishes (r11, VERDICT
    r10 #5): Xie et al. 2023 hash BIGRAMS of adjacent tokens into
    buckets; the vote arithmetic, smoothing, and strict-majority rule
    are b116's verbatim (`_dsir_selection`), so the query stays
    hash-exact — the cross-products are integer regardless of the
    unit. Docs with < 2 tokens carry no bigram evidence and are
    excluded by the same n > 0 rule that excludes token-free docs in
    the unigram form (the oracle's zip-unnest emits no pair rows for
    them). 256-bucket geometry is kept for the fixture (DSIR's ~1e4
    is a constant, not a scale knob — the frozen artifact stays
    driver-bounded either way)."""
    return _dsir_selection(spark, sf_dir, "bi")


# ---------------------------------------------------------------------------
# B117: distributed BPE merge training (vocabulary-weighted)
# ---------------------------------------------------------------------------
# Sennrich et al. 2016 ("Neural Machine Translation of Rare Words with
# Subword Units"): iteratively merge the most frequent adjacent symbol
# pair. The scalable formulation counts pairs over the DISTINCT-word
# vocabulary weighted by word frequency — one corpus pass builds the
# (word, count) table, after which every merge round touches only the
# vocab. Symbols are kept as a space-joined string with sentinel
# spaces (' h e l l o '); a merge round applies the CANONICAL
# left-to-right single-pass scan (merge at i, continue at i+2 — the
# exact semantics of Sennrich's `(?<!\S)lhs rhs(?!\S)` re.sub and of
# tests/test_selection.py's `_py_bpe`), implemented as a fold over
# the split symbol array (`_merge_symbols` below / a `list_reduce`
# string fold in the DuckDB oracle). NOT a sentinel-space
# `replace(' a b ' → ' ab ')`: replace CONSUMES the shared boundary
# space, so consecutive occurrences (' a b a b ' → ' ab a b ') are
# missed, the same pair can be re-elected in a later round, and the
# merge table diverges from canonical BPE on any corpus with words
# like 'abab' (ADVICE r10 #1 — caught by simulation; the planted
# consecutive-pair test pins the fold against the list scan).
#
# Tie-break: (pair_count DESC, lhs ASC, rhs ASC) — total order, so the
# merge sequence is deterministic and the unrolled SQL oracle below
# reproduces it exactly.

_BPE_MERGES = 6

_DUCK_TOKENS = (
    "list_filter(regexp_split_to_array(trim(text), '\\s+'), t -> t != '')"
)


def _merge_symbols(syms_col, lhs: str, rhs: str):
    """One canonical BPE merge round over a sentinel-space symbol
    string column: fold the split symbol array left-to-right, merging
    (lhs, rhs) at non-overlapping sites exactly like the `_py_bpe`
    while-loop (merged = lhs||rhs can never re-match lhs within the
    same round — rhs is non-empty — so the fold's last-element check
    reproduces the scan's i += 2 skip, including the lhs == rhs run
    case ' a a a a a ' → 'aa aa a'). All comparisons go through
    Column lambdas (F.lit on the Python strings), so corpus symbols
    containing quotes or regex metachars need no escaping."""
    merged = lhs + rhs
    syms = F.split(F.trim(syms_col), " ")

    def step(acc, x):
        do = (
            (F.get(acc, F.size(acc) - 1) == F.lit(lhs))
            & (x == F.lit(rhs))
        )
        return F.when(
            do,
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(merged))
            ),
        ).otherwise(F.concat(acc, F.array(x)))

    folded = F.aggregate(syms, F.array().cast("array<string>"), step)
    return F.concat(F.lit(" "), F.array_join(folded, " "), F.lit(" "))


# DuckDB twin of `_merge_symbols`: a list_reduce string fold (the
# accumulator is the space-joined output-so-far; its last symbol is
# checked via a suffix compare — right(), not LIKE, so '%'/'_' in
# corpus symbols can't act as pattern metachars). list_reduce seeds
# with the first element, which equals the scan's out=[sym0] start;
# single-symbol words pass through unchanged.
def _duck_merge_fold(lhs: str, rhs: str) -> str:
    return f"""' ' || list_reduce(string_split(trim(s), ' '),
        (acc, x) -> CASE
            WHEN x = {rhs} AND (acc = {lhs}
                 OR right(acc, length({lhs}) + 1) = ' ' || {lhs})
            THEN CASE WHEN acc = {lhs} THEN {lhs} || {rhs}
                 ELSE left(acc, length(acc) - length({lhs}))
                      || {lhs} || {rhs} END
            ELSE acc || ' ' || x END) || ' '"""


def _b117_chain_sql(k: int, cap: int | None = None) -> str:
    """Unrolled v0→vk CTE chain: vocab with space-joined symbol
    strings, one (pairs → argmax → canonical merge fold) level per
    merge. ``cap`` restricts v0 to the top-cap words by (cnt DESC,
    w ASC) — b122's frequency-capped production posture, applied
    identically in both engines so the chain stays hash-exact."""
    v0_src = "wc"
    if cap is not None:
        v0_src = f"(SELECT * FROM wc ORDER BY cnt DESC, w LIMIT {cap})"
    parts = [
        f"""tok AS MATERIALIZED (
        SELECT doc_id, lang, unnest({_DUCK_TOKENS}) AS w FROM documents
    ),
    wc AS MATERIALIZED (
        SELECT w, CAST(COUNT(*) AS BIGINT) AS cnt FROM tok GROUP BY w
    ),
    v0 AS MATERIALIZED (
        SELECT w, cnt,
               ' ' || array_to_string(regexp_split_to_array(w, ''), ' ')
                   || ' ' AS s
        FROM {v0_src}
    )"""
    ]
    for i in range(k):
        parts.append(f"""p{i} AS MATERIALIZED (
        SELECT u.p[1] AS lhs, u.p[2] AS rhs, SUM(cnt) AS pw
        FROM (SELECT cnt, string_split(trim(s), ' ') AS l FROM v{i}) t,
             UNNEST(list_zip(t.l, t.l[2:])) AS u(p)
        WHERE u.p[2] IS NOT NULL
        GROUP BY 1, 2
    ),
    m{i} AS MATERIALIZED (
        SELECT lhs, rhs, pw FROM p{i}
        ORDER BY pw DESC, lhs ASC, rhs ASC LIMIT 1
    ),
    v{i + 1} AS MATERIALIZED (
        SELECT w, cnt,
               CASE WHEN m.lhs IS NULL THEN s
                    ELSE {_duck_merge_fold("m.lhs", "m.rhs")} END AS s
        FROM v{i} LEFT JOIN m{i} AS m ON TRUE
    )""")
    return ",\n    ".join(parts)


B117_ORACLE = f"""
    WITH {_b117_chain_sql(_BPE_MERGES)}
    SELECT * FROM (
        {" UNION ALL ".join(
            f"SELECT {i + 1} AS step, lhs, rhs, lhs || rhs AS merged,"
            f" CAST(pw AS BIGINT) AS pair_count FROM m{i}"
            for i in range(_BPE_MERGES)
        )}
    )
    ORDER BY step
"""


def _bpe_vocab(
    spark: SparkSession, sf_dir: str, docs_override: DataFrame | None = None
) -> DataFrame:
    """(word, cnt, s) vocabulary with initial char symbols; the one
    corpus-wide pass, checkpointed so every merge round re-reads the
    small vocab instead of re-tokenizing the corpus. `docs_override`
    trains on a different slice (a39 freezes merges on the standing
    corpus only)."""
    docs = (
        docs_override
        if docs_override is not None
        else table(spark, sf_dir, "documents")
    )
    vocab = (
        docs.select(F.explode(F.expr(TOKENS_EXPR)).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(
            "w",
            "cnt",
            F.expr("concat(' ', array_join(split(w, ''), ' '), ' ')")
            .alias("s"),
        )
    )
    return lazy_checkpoint(vocab)


# Trained-merge memo, keyed like catalog._TABLE_CACHE: a production
# pipeline trains the tokenizer ONCE and stores the merge table; b117
# and b118 (and repeated bench invocations) must not re-run the merge
# loop per query. Only the default whole-corpus path memoizes —
# docs_override callers (a39's standing-corpus slice) manage their own
# artifact lifetime. Bounded to ONE live entry (ADVICE r10 #3): the
# value carries the checkpointed vocab HANDLE (not just the derived
# result frame) so eviction can release the checkpoint blocks.
_BPE_CACHE: dict[
    tuple[str, str, int], tuple[list, DataFrame, DataFrame]
] = {}


def _bpe_train(
    spark: SparkSession,
    sf_dir: str,
    k: int = _BPE_MERGES,
    docs_override: DataFrame | None = None,
) -> tuple[list[tuple[int, str, str, str, int]], DataFrame]:
    """Run k merge rounds over the vocab; return (merge rows, vocab DF
    with the final symbol strings). Each round = one vocab scan + a
    ONE-ROW bounded collect (argmax pair).

    Invalidation contract (ADVICE r11 #4): the returned vocab frame
    is backed by a localCheckpoint whose blocks the one-live-entry
    memo RELEASES when a different (sf_dir, k) trains — so a returned
    frame is only valid until the next different-key call. Every
    current caller consumes its frame before training another corpus;
    a caller that needs a longer-lived handle must stage it to parquet
    itself."""
    key = (spark.sparkContext.applicationId, sf_dir, k)
    if docs_override is None and key in _BPE_CACHE:
        merges, final, _ckpt = _BPE_CACHE[key]
        return merges, final
    vocab = _bpe_vocab(spark, sf_dir, docs_override)
    syms = F.col("s")
    merges: list[tuple[int, str, str, str, int]] = []
    for step in range(1, k + 1):
        cur = vocab.select("w", "cnt", syms.alias("s"))
        toks = F.expr("split(trim(s), ' ')")
        pairs = cur.select(
            "cnt",
            F.explode(
                F.arrays_zip(
                    F.slice(toks, 1, F.size(toks) - 1),
                    F.slice(toks, 2, F.size(toks) - 1),
                )
            ).alias("p"),
        ).select(
            F.col("p")["0"].alias("lhs"),
            F.col("p")["1"].alias("rhs"),
            F.col("cnt"),
        )
        top = (
            pairs.groupBy("lhs", "rhs")
            .agg(F.sum("cnt").alias("pw"))
            .orderBy(F.desc("pw"), F.asc("lhs"), F.asc("rhs"))
            .limit(1)
            .collect()  # bounded: exactly one row
        )
        if not top:  # degenerate corpus (all 1-char words): stop early
            break
        lhs, rhs, pw = top[0]["lhs"], top[0]["rhs"], top[0]["pw"]
        merges.append((step, lhs, rhs, lhs + rhs, pw))
        syms = _merge_symbols(syms, lhs, rhs)
    final = vocab.select("w", "cnt", syms.alias("s"))
    if docs_override is None:
        # bound the memo to ONE live entry (ADVICE r10 #3): a
        # long-lived session touching many corpora (the pytest
        # session's per-test tmp dirs) must not pin one checkpointed
        # vocab per (appId, sf_dir, k) for the application lifetime —
        # evicting a stale entry releases its checkpoint blocks via
        # the same helper the streaming callers use
        from kafka_streams_sandbox_spark.session import (
            release_local_checkpoint,
        )

        for old_key in [k_ for k_ in _BPE_CACHE if k_ != key]:
            _, _, old_ckpt = _BPE_CACHE.pop(old_key)
            release_local_checkpoint(old_ckpt)
        _BPE_CACHE[key] = (merges, final, vocab)
    return merges, final


@query("b117_bpe_merge_train", oracle=B117_ORACLE)
def b117_bpe_merge_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First `_BPE_MERGES` BPE merges over the corpus (see the section
    header): the merge table (step, lhs, rhs, merged, pair_count) is
    the distributed-computed, driver-bounded result.

    Production-merge-count posture (VERDICT r11 #1, measured BASELINE
    round 12): this per-round distributed form is the FIXTURE-SCALE
    ANCHOR only — it is retained because its unrolled-CTE oracle is
    the hash-exact correctness pin for the merge semantics, not as a
    training path. At real BPE depth (~30k rounds) it is unfit twice
    over: (1) per-round JOB latency, not data, dominates — measured
    0.97 s/round on the 100x corpus and 10.97 s/round on a 20k-word
    vocab (>= 91 h for 30k rounds; no cluster size fixes 30k DEPENDENT
    jobs); (2) a structural ceiling binds first — each round nests one
    `_merge_symbols` layer into a single expression tree, and
    Catalyst's Resolution batch hits its 100-iteration fixed point
    analyzing ~100+ nested layers (RuntimeException, measured at
    k=300). The production shape is `b122_bpe_production_train`: ONE
    distributed capped (word,count) pass, then the entire loop
    driver-side — 30,000 rounds in 1.7 s after a 7.3 s corpus pass,
    merge tables identical to this form where both run."""
    merges, _ = _bpe_train(spark, sf_dir)
    return spark.createDataFrame(
        [
            (step, lhs, rhs, merged, int(pw))
            for step, lhs, rhs, merged, pw in merges
        ],
        schema="step int, lhs string, rhs string, merged string,"
        " pair_count bigint",
    )


# ---------------------------------------------------------------------------
# B118: BPE application / compression report
# ---------------------------------------------------------------------------
# Apply b117's learned merges corpus-wide and report the symbol-count
# compression per language. The application is VOCAB-level (each
# distinct word is segmented once; documents join their token counts
# to the segmented vocab) — the same reason b117 trains on the vocab:
# at 100 TB you never re-segment each occurrence.

B118_ORACLE = f"""
    WITH {_b117_chain_sql(_BPE_MERGES)},
    seg AS MATERIALIZED (
        SELECT w,
               CAST(length(w) AS BIGINT) AS n_chr,
               CAST(len(string_split(trim(s), ' ')) AS BIGINT) AS n_sym
        FROM v{_BPE_MERGES}
    ),
    tl AS MATERIALIZED (
        SELECT lang, w, CAST(COUNT(*) AS BIGINT) AS cnt
        FROM tok GROUP BY lang, w
    )
    SELECT tl.lang,
           CAST(SUM(tl.cnt) AS BIGINT) AS n_words,
           CAST(SUM(tl.cnt * seg.n_chr) AS BIGINT) AS total_chars,
           CAST(SUM(tl.cnt * seg.n_sym) AS BIGINT) AS total_symbols
    FROM tl JOIN seg USING (w)
    GROUP BY tl.lang
"""


@query("b118_bpe_apply", oracle=B118_ORACLE)
def b118_bpe_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Segment the corpus with b117's merges; per-language exact
    (word, char, symbol) totals. total_chars/total_symbols is the
    tokenizer's compression ratio — left as exact integers (the b58
    no-floats discipline)."""
    docs = table(spark, sf_dir, "documents")
    _, vocab = _bpe_train(spark, sf_dir)
    seg = vocab.select(
        "w",
        F.length("w").cast("long").alias("n_chr"),
        F.expr("size(split(trim(s), ' '))").cast("long").alias("n_sym"),
    )
    tl = (
        docs.select("lang", F.explode(F.expr(TOKENS_EXPR)).alias("w"))
        .groupBy("lang", "w")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    return (
        tl.join(seg, "w")  # vocab-sized at 100 TB (~1e8 rows): a
        # shuffle join on w, NOT a broadcast — AQE may still elect BHJ
        # at fixture scale where the vocab is tiny
        .groupBy("lang")
        .agg(
            F.sum("cnt").alias("n_words"),
            F.sum(F.col("cnt") * F.col("n_chr")).alias("total_chars"),
            F.sum(F.col("cnt") * F.col("n_sym")).alias("total_symbols"),
        )
    )


# ---------------------------------------------------------------------------
# B120: learned discriminative quality classifier (logistic regression)
# ---------------------------------------------------------------------------
# The CCNet/GPT-3/LLaMA pipelines pair the generative LM gate (b108)
# with a DISCRIMINATIVE quality classifier (fasttext in CCNet, a
# logistic model over hashed features in GPT-3's WebText filter):
# train on curated-vs-raw labels, score everything, keep what looks
# curated. b120 is that axis: logistic regression over the same 256
# md5-hashed token buckets b116 uses (normalized frequencies + bias),
# trained with _B120_ITERS full-batch gradient-descent rounds.
#
# Distributed-GD shape: the FEATURES NEVER MATERIALIZE. Because the
# model is linear over hashed buckets, a doc's logit is
# bias + (1/n_d)·Σ_tokens w[bucket(t)] — computable straight off the
# bucketed token array with one higher-order aggregate; and the
# gradient Σ_d err_d·c_db/n_d is the token explode re-grouped on the
# 256-key bucket domain (partial-agg dominated) with err_d computed in
# the SAME row before the explode. So the corpus-wide state is one
# checkpointed narrow frame (lang, y, n_tok, array<int> buckets) and
# each GD round is ONE pass + ONE bounded ≤257-row collect (bias rides
# along as pseudo-bucket -1). The first cut of this operator
# materialized a sparse (doc → [(bucket, cnt)]) feature table through
# two corpus-wide shuffles: 278.8 s of its 295 s at 100x was that
# build — the rewrite deletes it (see BASELINE round-10 table). No
# oracle: iterative float fitting is not SQL-expressible — rows-only
# with a planted-separation contract + numpy re-derivation test
# (tests/test_selection.py), the b55/b92 precedent.

_B120_ITERS = 3
_B120_LR = 5.0


_B120_BUCKET_OF = "t -> CAST(conv(substring(md5(t), 1, 2), 16, 10) AS INT)"


def _b120_base(docs: DataFrame):
    """Narrow per-doc frame (lang, y, n_tok, barr): bucketed token
    ids, MAP-ONLY (no shuffle), checkpointed once for the GD rounds +
    scoring pass."""
    return lazy_checkpoint(
        docs.select(
            "lang",
            F.col("is_target").cast("int").alias("y"),
            F.expr(f"size({TOKENS_EXPR})").alias("n_tok"),
            F.expr(f"transform({TOKENS_EXPR}, {_B120_BUCKET_OF})").alias(
                "barr"
            ),
        ).filter(F.col("n_tok") > 0)
    )


def _b120_logit(weights: list[float], bias: float):
    """Per-doc logit from the inlined literal weight array — one
    higher-order aggregate over the bucket array, map-only."""
    w_arr = "array(" + ",".join(repr(x) for x in weights) + ")"
    return F.expr(
        f"{bias!r} + aggregate(barr, CAST(0.0 AS DOUBLE), (acc, b) -> "
        f"acc + element_at({w_arr}, b + 1)) / n_tok"
    )


def train_quality_classifier(
    docs: DataFrame,
) -> tuple[list[float], float, DataFrame]:
    """Fit the logistic model; return (weights, bias, base DF)."""
    base = _b120_base(docs)
    n = base.count()  # one-row action on the checkpointed base
    weights = [0.0] * _DSIR_D
    bias = 0.0
    for _ in range(_B120_ITERS):
        if n == 0:
            break
        err = (
            F.expr("1.0 / (1.0 + exp(-logit))") - F.col("y").cast("double")
        ).alias("err")
        # ONE action per round: bias rides as pseudo-bucket -1 with
        # x = 1 (its gradient is Σ err), real buckets carry x = 1/n_d
        grad_rows = (
            base.select(
                "n_tok",
                _b120_logit(weights, bias).alias("logit"),
                "y",
                "barr",
            )
            .select("n_tok", "barr", err)
            .select(
                "err",
                "n_tok",
                F.explode(F.expr("concat(barr, array(-1))")).alias("b"),
            )
            .groupBy("b")
            .agg(
                F.sum(
                    F.col("err")
                    * F.when(F.col("b") < 0, F.lit(1.0)).otherwise(
                        1.0 / F.col("n_tok")
                    )
                ).alias("gw")
            )
            .collect()  # bounded: <= _DSIR_D + 1 rows
        )
        for row in grad_rows:
            if row["b"] < 0:
                bias -= _B120_LR * row["gw"] / n
            else:
                weights[row["b"]] -= _B120_LR * row["gw"] / n
    return weights, bias, base


def quality_score_frame(
    docs: DataFrame, weights: list[float], bias: float
) -> DataFrame:
    """Frozen-weights scoring of any (doc_id, lang, text) relation —
    a41's per-batch pass, shared with b120's in-training scorer via
    `_b120_logit` so train-time and deploy-time logits cannot drift.
    MAP-ONLY: the 257-float artifact inlines as a literal array, the
    logit is one higher-order aggregate over the bucketed token
    array, and token-free docs are excluded (no evidence — b116's
    n_tok > 0 rule). Output (doc_id, lang, logit, predicted); the
    logit is a per-row sequential fold, so it is bit-deterministic
    across micro-batch boundaries (what a41's duality assert pins)."""
    return (
        docs.select(
            "doc_id",
            "lang",
            F.expr(f"size({TOKENS_EXPR})").alias("n_tok"),
            F.expr(f"transform({TOKENS_EXPR}, {_B120_BUCKET_OF})").alias(
                "barr"
            ),
        )
        .filter(F.col("n_tok") > 0)
        .select(
            "doc_id",
            "lang",
            _b120_logit(weights, bias).alias("logit"),
        )
        .withColumn("predicted", F.col("logit") > 0)
    )


@query("b120_quality_classifier")  # rows-only: iterative float fitting
def b120_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train the hashed logistic quality classifier on curated-vs-raw
    labels (sources src0-src3 = curated, b116's stand-in), score every
    doc with the trained weights (map-only inlined-array pass), and
    report the per-(lang, label, prediction) confusion counts — the
    artifact a production run inspects before picking its keep
    threshold."""
    docs = table(spark, sf_dir, "documents").withColumn(
        "is_target", F.col("source").isin(*_DSIR_TARGET)
    )
    weights, bias, base = train_quality_classifier(docs)
    return (
        base.select(
            "lang", "y", (_b120_logit(weights, bias) > 0).alias("predicted")
        )
        .groupBy("lang", "y", "predicted")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


# ---------------------------------------------------------------------------
# B122: production-shape BPE training (driver-side merge loop over a
# frequency-capped vocabulary)
# ---------------------------------------------------------------------------
# VERDICT r11 #1: b117's per-round distributed form (one vocab scan +
# one 1-row collect per merge) is the right shape for auditing a
# handful of merges, but real BPE is ~30k SEQUENTIAL rounds — at that
# count per-round JOB LATENCY (scheduling + the argmax collect), not
# data volume, dominates, and no amount of cluster makes 30k
# dependent Spark jobs fast. Every production trainer (Hugging Face
# tokenizers, SentencePiece's BPE mode, the original subword-nmt)
# therefore runs ONE distributed (word, count) pass and then the
# whole merge loop DRIVER-SIDE over a frequency-capped vocabulary
# with incremental pair-count maintenance. b122 registers that shape:
#
#   pass 1 (distributed): token explode -> groupBy(w) -> count, then
#     top-``cap`` words by (cnt DESC, w ASC) — a bounded collect (the
#     cap is the driver-memory contract; SentencePiece's equivalent
#     knob caps its seed vocab the same way). The tail this drops is
#     hapax-dominated: at 100 TB a 1e6-word cap keeps >99% of token
#     MASS (Zipf), which is why production trainers accept it.
#   pass 2 (driver, pure Python): the canonical Sennrich merge loop
#     with an incremental pair index — pair counts updated only for
#     the words containing the merged pair, candidate selection via a
#     lazy max-heap — O(affected words) per round instead of a vocab
#     scan, and zero Spark jobs inside the loop.
#
# Semantics are IDENTICAL to b117 on any corpus where the cap does
# not bind (same canonical left-to-right scan, same (count DESC, lhs
# ASC, rhs ASC) tie-break); the oracle is the same unrolled CTE chain
# with the cap applied in v0, so the merge table stays hash-exact.
# tests pin: b122 == b117's merge rows at an unbinding cap, the
# planted consecutive-pair ('abab') contract through the production
# loop, and the incremental pair index against the per-round recount.

_B122_MERGES = 32
_B122_VOCAB_CAP = 4096

B122_ORACLE = f"""
    WITH {_b117_chain_sql(_B122_MERGES, cap=_B122_VOCAB_CAP)}
    SELECT * FROM (
        {" UNION ALL ".join(
            f"SELECT {i + 1} AS step, lhs, rhs, lhs || rhs AS merged,"
            f" CAST(pw AS BIGINT) AS pair_count FROM m{i}"
            for i in range(_B122_MERGES)
        )}
    )
    ORDER BY step
"""


def bpe_merge_loop(
    word_counts: list[tuple[str, int]], k: int
) -> list[tuple[int, str, str, str, int]]:
    """The driver-side incremental BPE merge loop: canonical Sennrich
    semantics (left-to-right non-overlapping scan, (count DESC, lhs
    ASC, rhs ASC) tie-break) with production bookkeeping — a pair ->
    containing-words index plus a lazily-invalidated max-heap, so each
    round touches only the words that contain the elected pair. Pure
    Python by design: ~30k dependent rounds cannot be Spark jobs
    (module comment); the input is the driver-bounded capped vocab."""
    import heapq

    syms: dict[str, list[str]] = {w: list(w) for w, _ in word_counts}
    wcnt: dict[str, int] = dict(word_counts)

    pair_counts: dict[tuple[str, str], int] = {}
    pair_words: dict[tuple[str, str], set[str]] = {}
    for w, cnt in word_counts:
        s = syms[w]
        for i in range(len(s) - 1):
            p = (s[i], s[i + 1])
            pair_counts[p] = pair_counts.get(p, 0) + cnt
            pair_words.setdefault(p, set()).add(w)

    # lazy max-heap: every count CHANGE pushes a fresh entry; a popped
    # entry is accepted only if it matches the current truth (stale
    # entries from superseded counts are discarded on pop)
    heap = [(-c, p[0], p[1]) for p, c in pair_counts.items()]
    heapq.heapify(heap)

    merges: list[tuple[int, str, str, str, int]] = []
    for step in range(1, k + 1):
        best = None
        while heap:
            negc, lhs, rhs = heapq.heappop(heap)
            if pair_counts.get((lhs, rhs)) == -negc:
                best = (lhs, rhs, -negc)
                break
        if best is None:
            break  # degenerate corpus: no adjacent pairs remain
        lhs, rhs, pw = best
        merges.append((step, lhs, rhs, lhs + rhs, pw))

        touched: set[tuple[str, str]] = set()
        for w in sorted(pair_words.get((lhs, rhs), ())):
            cnt, s = wcnt[w], syms[w]
            old: dict[tuple[str, str], int] = {}
            for i in range(len(s) - 1):
                p = (s[i], s[i + 1])
                old[p] = old.get(p, 0) + 1
            out: list[str] = []
            i = 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == lhs and s[i + 1] == rhs:
                    out.append(lhs + rhs)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            syms[w] = out
            new: dict[tuple[str, str], int] = {}
            for i in range(len(out) - 1):
                p = (out[i], out[i + 1])
                new[p] = new.get(p, 0) + 1
            for p in old.keys() | new.keys():
                delta = new.get(p, 0) - old.get(p, 0)
                if delta:
                    pair_counts[p] = pair_counts.get(p, 0) + delta * cnt
                    if pair_counts[p] <= 0:
                        del pair_counts[p]
                    touched.add(p)
                if p in new:
                    pair_words.setdefault(p, set()).add(w)
                elif p in old:
                    ws = pair_words.get(p)
                    if ws is not None:
                        ws.discard(w)
        for p in touched:
            c = pair_counts.get(p)
            if c is not None:
                heapq.heappush(heap, (-c, p[0], p[1]))
    return merges


def capped_vocab(
    docs: DataFrame, cap: int = _B122_VOCAB_CAP
) -> list[tuple[str, int]]:
    """The one distributed pass: (word, count) over the corpus, top
    ``cap`` by (cnt DESC, w ASC) — the bounded collect whose size is
    the cap by construction (the driver-memory contract)."""
    rows = (
        docs.select(F.explode(F.expr(TOKENS_EXPR)).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("w"))
        .limit(cap)
        .collect()  # bounded: exactly min(cap, |vocab|) rows
    )
    return [(r["w"], r["cnt"]) for r in rows]


@query("b122_bpe_production_train", oracle=B122_ORACLE)
def b122_bpe_production_train(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Production-posture BPE training (section comment): one
    distributed (word, count) pass capped to the top
    ``_B122_VOCAB_CAP`` words, then ``_B122_MERGES`` merge rounds
    driver-side with incremental pair counts — zero Spark jobs in the
    loop. Hash-exact against the capped unrolled-CTE chain."""
    wc = capped_vocab(table(spark, sf_dir, "documents"))
    merges = bpe_merge_loop(wc, _B122_MERGES)
    return spark.createDataFrame(
        [
            (step, lhs, rhs, merged, int(pw))
            for step, lhs, rhs, merged, pw in merges
        ],
        schema="step int, lhs string, rhs string, merged string,"
        " pair_count bigint",
    )


# ---------------------------------------------------------------------------
# B123: unigram-LM tokenizer training (SentencePiece's other trainer)
# ---------------------------------------------------------------------------
# Kudo 2018 ("Subword Regularization") / the SentencePiece unigram
# trainer — the tokenizer algorithm of the Llama/T5 lineage, b117's
# sibling (VERDICT r11 #2): seed a large candidate-piece vocabulary
# from frequent substrings, run EM rounds (segment the corpus under
# the current piece scores, re-estimate scores from the resulting
# piece counts), prune the vocabulary, repeat. This implementation is
# the HARD-EM (Viterbi) variant: the E-step keeps only each word's
# single best segmentation instead of the full forward-backward
# lattice expectation, and pruning drops the lowest-count pieces (the
# hard-EM proxy for Kudo's leave-one-out loss contribution) — the
# documented simplifications; the published trainer's lattice E-step
# changes the estimates, not the distributed shape.
#
# Distributed shape (b118's vocab discipline throughout — corpus text
# is touched ONCE):
#   pass 1 (corpus): token explode -> (word, cnt) distinct-word table,
#     lazily checkpointed. Everything after runs on the VOCAB.
#   seeding: per distinct word, all substrings of length <= _ULM_MAXLEN
#     (weighted by word cnt) -> one vocab-level groupBy -> top
#     _ULM_SEED_CAP by (freq DESC, piece ASC) + every single char —
#     a BOUNDED collect (the cap is the driver-memory contract, the
#     same knob SentencePiece exposes as seed_sentencepiece_size).
#   EM round: piece scores = INTEGER costs round(-1e6 * ln(freq/tot))
#     computed driver-side from exact integer counts (the Spark side
#     never takes a log — the b58 float discipline: per-word DP
#     compares integer sums, so segmentation is bit-deterministic and
#     the pure-Python twin can re-derive it exactly);
#     E-step = Viterbi DP per DISTINCT word — an Arrow-batched pandas
#     UDF over the vocab table (map-only over the vocab; the score
#     dict ships in the UDF closure, <= cap entries; at a 1e6-piece
#     production cap, ship it as a broadcast variable instead);
#     M-step = explode the chosen pieces weighted by word cnt -> ONE
#     vocab-level groupBy -> bounded collect (<= |pieces| rows).
#   prune: keep the top _ULM_VOCAB pieces by (count DESC, piece ASC),
#     plus every single char unconditionally (reachability: any word
#     must stay segmentable).
#
# Python appears ONLY as the Arrow-batched per-distinct-word DP (the
# b44 lane: a DP with dict lookups is the genuinely-not-expressible
# case) — never per corpus occurrence. Rows-only registration:
# iterative float-scored fitting is not SQL-expressible (the
# b55/b92/b120 precedent); the correctness layer is the independent
# pure-Python EM re-derivation + planted segmentation contracts in
# tests/test_selection.py.

_ULM_MAXLEN = 8
_ULM_SEED_CAP = 2048
_ULM_VOCAB = 512
_ULM_ROUNDS = 3
_ULM_SCALE = 1_000_000
# cost of an out-of-vocabulary single char (arrivals can carry chars
# the standing corpus never saw — a42): a fixed large constant, worse
# than any in-vocab piece (max in-vocab cost is SCALE * ln(total), and
# ln(total) < 46 for any total < 1e20), but finite so OOV words still
# segment deterministically
_ULM_OOV_COST = _ULM_SCALE * 64


def unigram_viterbi(
    word: str, costs: dict[str, int], maxlen: int = _ULM_MAXLEN
) -> list[str]:
    """Best segmentation of ``word`` under integer piece costs —
    minimize the summed cost; ties prefer the LONGER last piece at
    each DP cell (deterministic, and matches the greedy-longest
    intuition tokenizers ship). Unknown single chars pay
    ``_ULM_OOV_COST`` so every word is reachable."""
    L = len(word)
    inf = float("inf")
    best: list = [0] + [inf] * L
    back = [0] * (L + 1)
    for i in range(1, L + 1):
        for j in range(1, min(i, maxlen) + 1):
            piece = word[i - j : i]
            c = costs.get(piece)
            if c is None:
                if j != 1:
                    continue
                c = _ULM_OOV_COST  # unseen single char
            cand = best[i - j] + c
            if cand < best[i] or (cand == best[i] and j > back[i]):
                best[i] = cand
                back[i] = j
    out: list[str] = []
    i = L
    while i > 0:
        j = back[i]
        out.append(word[i - j : i])
        i -= j
    out.reverse()
    return out


def _ulm_costs(counts: dict[str, int]) -> dict[str, int]:
    """Integer Viterbi costs from exact piece counts: Laplace(+1)
    smoothing (a kept single char can have count 0 after a prune
    round), then round(-SCALE * ln(p)) — computed ONCE driver-side;
    the distributed DP only ever compares integer sums."""
    import math

    total = sum(counts.values()) + len(counts)
    return {
        p: round(-_ULM_SCALE * math.log((c + 1) / total))
        for p, c in counts.items()
    }


def _ulm_word_table(docs: DataFrame) -> DataFrame:
    """(w, cnt) distinct-word table — the one corpus pass."""
    return lazy_checkpoint(
        docs.select(F.explode(F.expr(TOKENS_EXPR)).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def _ulm_seed(words: DataFrame, cap: int = _ULM_SEED_CAP) -> dict[str, int]:
    """Seed piece counts: every substring of length <= _ULM_MAXLEN of
    every distinct word (with multiplicity, weighted by word count),
    top ``cap`` by (freq DESC, piece ASC) + all single chars.
    One vocab-level explode + groupBy; two bounded collects."""
    subs = F.expr(
        f"""flatten(transform(sequence(1, length(w)),
            i -> transform(sequence(i, least(length(w),
                                             i + {_ULM_MAXLEN - 1})),
                 j -> substring(w, i, j - i + 1))))"""
    )
    pieces = (
        words.select(F.col("cnt"), F.explode(subs).alias("p"))
        .groupBy("p")
        .agg(F.sum("cnt").alias("freq"))
    )
    top = (
        pieces.filter(F.length("p") > 1)
        .orderBy(F.desc("freq"), F.asc("p"))
        .limit(cap)
        .collect()  # bounded: the seed cap
    )
    chars = pieces.filter(F.length("p") == 1).collect()  # bounded:
    # the corpus alphabet (a few hundred distinct chars at any scale)
    return {r["p"]: r["freq"] for r in (*top, *chars)}


def _ulm_em_round(
    words: DataFrame, costs: dict[str, int]
) -> dict[str, int]:
    """One hard-EM round: Viterbi-segment each DISTINCT word under
    ``costs`` (Arrow-batched pandas UDF, map-only over the vocab),
    then re-count pieces weighted by word count (one vocab-level
    groupBy, bounded collect)."""
    from pyspark.sql.functions import PandasUDFType, pandas_udf

    # explicit SCALAR eval type: the module's `from __future__ import
    # annotations` turns hints into strings the inferencer can't
    # resolve for a locally-imported pandas
    @pandas_udf("array<string>", PandasUDFType.SCALAR)
    def seg(ws):
        return ws.map(lambda w: unigram_viterbi(w, costs))

    rows = (
        words.select("cnt", F.explode(seg("w")).alias("p"))
        .groupBy("p")
        .agg(F.sum("cnt").alias("freq"))
        .collect()  # bounded: <= |costs| pieces
    )
    return {r["p"]: r["freq"] for r in rows}


def _ulm_prune(
    counts: dict[str, int], vocab: int = _ULM_VOCAB
) -> dict[str, int]:
    """Keep the top ``vocab`` pieces by (count DESC, piece ASC) plus
    every single char (reachability floor); chars missing from the
    round's counts (never chosen by any Viterbi path) survive at 0 —
    the Laplace smoothing in _ulm_costs keeps their cost finite."""
    singles = {p: c for p, c in counts.items() if len(p) == 1}
    multis = sorted(
        ((p, c) for p, c in counts.items() if len(p) > 1),
        key=lambda kv: (-kv[1], kv[0]),
    )[:vocab]
    return {**dict(multis), **singles}


def _ulm_loss_prune(counts: dict[str, int], keep: int) -> dict[str, int]:
    """LOSS-CONTRIBUTION prune (r13, VERDICT r12 #5 — the schedule
    real SentencePiece runs, Kudo 2018 §3.2, in this trainer's
    hard-EM approximation): a piece's value is not its raw count but
    how much the corpus segmentation cost RISES if it is removed —
    count(p) * (alt_cost(p) - cost(p)), where alt_cost(p) is the best
    segmentation of p's own string WITHOUT p (exact under hard EM:
    every counted occurrence of p was one Viterbi step, and removing
    p re-segments exactly that span). Count-top-K keeps frequent
    pieces that are cheaply composable from other kept pieces (near-
    zero loss if dropped); contribution ranking keeps the pieces
    whose removal actually hurts — the widevocab receipt (BASELINE
    round-13) measures the disagreement.

    Entirely DRIVER-SIDE over the bounded piece inventory (the b122
    treatment): one masked Viterbi per candidate piece (len <= 8, so
    O(64) per piece); the mask (len*OOV+1) exceeds any real path so
    the alternative can never route through p itself. Single chars
    are never pruned (reachability floor)."""
    costs = _ulm_costs(counts)
    singles = {p: c for p, c in counts.items() if len(p) == 1}
    ranked: list[tuple[int, str, int]] = []
    for p, c in counts.items():
        if len(p) == 1:
            continue
        own = costs[p]
        costs[p] = _ULM_OOV_COST * len(p) + 1  # mask: beats no path
        alt_segs = unigram_viterbi(p, costs)
        alt = sum(costs.get(s, _ULM_OOV_COST) for s in alt_segs)
        costs[p] = own
        ranked.append((c * (alt - own), p, c))
    kept = sorted(ranked, key=lambda t: (-t[0], t[1]))[:keep]
    return {**{p: c for _, p, c in kept}, **singles}


def unigram_lm_train(
    docs: DataFrame,
    *,
    seed_cap: int = _ULM_SEED_CAP,
    vocab: int = _ULM_VOCAB,
    rounds: int = _ULM_ROUNDS,
    loss_prune: bool = False,
    shrink: float = 0.25,
) -> tuple[dict[str, int], DataFrame]:
    """Full trainer: seed -> ``rounds`` x (E-step, M-step, prune).
    Returns (final piece counts, the checkpointed distinct-word
    table) — the counts are the frozen artifact (driver-bounded:
    <= ``vocab`` + alphabet entries).

    Defaults reproduce the b123/a42 fixture posture bit-for-bit
    (512-piece top-K prune). PRODUCTION POSTURE (r13, VERDICT r12
    #5): ``loss_prune=True`` with an 8k-32k ``vocab`` and a
    proportionally larger ``seed_cap`` runs the Kudo schedule — each
    round prunes the lowest loss-contribution ``shrink`` fraction of
    multi-char pieces (never below ``vocab``; the FINAL round lands
    exactly on ``vocab``) — measured on the 20k-word corpus at 8k and
    32k inventories in BASELINE round-13. The distributed shape is
    IDENTICAL at every setting: one corpus pass, vocab-level E/M
    steps, bounded collects; only the driver-side prune rule changes
    (the b122 treatment — scale lives in bounded driver loops, not in
    more Spark jobs). At a 1e6-piece cap, ship the E-step cost dict
    as a broadcast variable instead of a closure (module comment)."""
    words = _ulm_word_table(docs)
    counts = _ulm_seed(words, cap=seed_cap)
    for r in range(rounds):
        em = _ulm_em_round(words, _ulm_costs(counts))
        if loss_prune:
            n_multi = sum(1 for p in em if len(p) > 1)
            keep = (
                vocab
                if r == rounds - 1
                else max(vocab, int(n_multi * (1.0 - shrink)))
            )
            counts = _ulm_loss_prune(em, keep)
        else:
            counts = _ulm_prune(em, vocab=vocab)
    return counts, words


@query("b123_unigram_lm_train")  # rows-only: iterative EM fitting
def b123_unigram_lm_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram-LM (SentencePiece) tokenizer training over the corpus
    (section comment): the final piece table (piece, piece_len,
    n_occurrences) — n_occurrences is the piece's exact weighted
    count in the last E-step's Viterbi segmentation of the corpus.
    Driver-bounded output (<= _ULM_VOCAB + alphabet rows)."""
    counts, _ = unigram_lm_train(table(spark, sf_dir, "documents"))
    return spark.createDataFrame(
        sorted(
            ((p, len(p), int(c)) for p, c in counts.items()),
            key=lambda t: (-t[2], t[0]),
        ),
        schema="piece string, piece_len int, n_occurrences bigint",
    )


def unigram_segment_frame(
    frame: DataFrame, costs: dict[str, int]
) -> DataFrame:
    """Segment any (doc_id, lang, text) relation under FROZEN integer
    piece costs -> (doc_id, lang, n_words, n_syms) — a42's per-batch
    pass and its batch-twin, one function so they cannot drift.

    a39's batch-granularity vocab move: Viterbi runs once per DISTINCT
    word in the frame (the Arrow-batched DP is the per-word cost
    center), counts join back to occurrences, and per-doc sums are
    exact integers. OOV words (chars the training corpus never saw)
    segment deterministically through the `_ULM_OOV_COST` path.
    Token-free docs are excluded (no evidence — the family's
    n_tok > 0 rule)."""
    from pyspark.sql.functions import PandasUDFType, pandas_udf

    @pandas_udf("long", PandasUDFType.SCALAR)
    def n_syms_of(ws):
        return ws.map(lambda w: len(unigram_viterbi(w, costs)))

    toks_df = frame.select(
        "doc_id", "lang", F.expr(TOKENS_EXPR).alias("toks")
    ).filter(F.size("toks") > 0)
    occ = toks_df.select(
        "doc_id",
        "lang",
        F.size("toks").cast("long").alias("n_words"),
        F.explode("toks").alias("w"),
    )
    words = (
        occ.select("w").distinct().select("w", n_syms_of("w").alias("w_syms"))
    )
    return (
        occ.join(words, "w")
        .groupBy("doc_id", "lang", "n_words")
        .agg(F.sum("w_syms").cast("long").alias("n_syms"))
        .select("doc_id", "lang", "n_words", "n_syms")
    )
