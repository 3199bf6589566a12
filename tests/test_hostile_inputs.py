"""Hostile-input robustness for the documents-reading operator family.

The driver fixtures are clean (no NULLs, no empty docs); a real corpus
at scale is not. This corpus plants the classics — NULL text, empty
string, whitespace-only, single char, emoji/CJK/RTL unicode, a
100 kB monster, and an exact duplicate pair — and asserts every
documents-reading batch query completes and respects basic sanity
(no crash, no pathological pair explosion from the degenerate docs).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from kafka_streams_sandbox_spark.operators import dedup, text

_DOCS = [
    (0, None),
    (1, ""),
    (2, "   \t  \n "),
    (3, "x"),
    (4, "word"),
    (5, "مرحبا بالعالم"),  # RTL arabic
    (6, "你好世界 深度学习"),  # CJK
    (7, "\U0001f600 \U0001f680 emoji doc \U0001f600"),
    (8, "the quick brown fox jumps over the lazy dog " * 8),
    (9, "the quick brown fox jumps over the lazy dog " * 8),  # exact dup of 8
    (10, "lorem ipsum dolor sit amet " * 4000),  # ~100 kB
    (11, None),  # second NULL: a NULL-key bucket must not self-pair
    # tab/newline-only PAIR: trim() strips only ASCII spaces, so a
    # length(trim(text)) > 0 guard would pass both and they would
    # minhash/simhash-match each other (zero tokens -> simhash 0)
    (12, "\t\n\t"),
    (13, "\n \t"),
]


@pytest.fixture(scope="module")
def hostile_dir(tmp_path_factory) -> str:
    tmp = tmp_path_factory.mktemp("hostile")
    table = pa.table(
        {
            "doc_id": pa.array([d[0] for d in _DOCS], pa.int64()),
            "text": pa.array([d[1] for d in _DOCS], pa.string()),
            "lang": pa.array(["en"] * len(_DOCS), pa.string()),
            "source": pa.array(["srcH"] * len(_DOCS), pa.string()),
            "n_chars": pa.array(
                [len(d[1]) if d[1] is not None else 0 for d in _DOCS], pa.int64()
            ),
        }
    )
    pq.write_table(table, str(tmp / "documents.parquet"))
    return str(tmp)


@pytest.mark.parametrize(
    "fn",
    [
        text.b23_text_stats,
        text.b29_language_id,
        text.b30_quality_score,
        text.b31_token_count,
        text.b32_fingerprint,
        text.b53_rolling_hash,
        text.b102_gopher_repetition,
    ],
    ids=lambda f: f.__name__,
)
def test_text_family_survives_hostile_docs(spark, hostile_dir, fn):
    rows = fn(spark, hostile_dir).collect()
    assert len(rows) == len(_DOCS)  # map-only: every doc in, every doc out


def test_exact_dedup_on_hostile_docs(spark, hostile_dir):
    # b21 emits one row per distinct text (dup_count >= 1)
    rows = dedup.b21_exact_dedup(spark, hostile_dir).collect()
    dup_groups = {r["keep_id"]: r["dup_count"] for r in rows if r["dup_count"] > 1}
    # docs 8/9 are the planted exact dup; docs 0/11 (both NULL text)
    # group together too — SQL GROUP BY treats NULLs as equal, in
    # Spark AND the DuckDB oracle alike, so the behavior is pinned
    # here as documented rather than "fixed" into oracle divergence
    assert dup_groups == {8: 2, 0: 2}
    assert len(rows) == len(_DOCS) - 2


def test_cross_source_dedup_on_hostile_docs(spark, hostile_dir):
    # b24 canonicalizes on the sorted distinct token SET: ""/
    # whitespace-only docs share the empty-set fingerprint (one
    # group), NULL texts share the NULL fingerprint (another — SQL
    # GROUP BY treats NULLs as equal in Spark and DuckDB alike).
    # Deliberate ("no content" is one canonical document) and
    # scale-safe: b24 emits groups via groupBy — never pairwise — so
    # a huge garbage group costs one aggregation row, not a quadratic
    # bucket (contrast the pair-emitting b26/b28, which exclude those
    # docs).
    rows = dedup.b24_dedup_across_sources(spark, hostile_dir).collect()
    groups = {r["keep_id"]: r["n_copies"] for r in rows}
    # {NULL,NULL} {"",ws-only,tab-only,tab-only} {8,9}
    assert groups == {0: 2, 1: 4, 8: 2}


def test_neardup_family_survives_hostile_docs(spark, hostile_dir):
    for fn in (
        dedup.b26_ngram_jaccard_pairs,
        dedup.b27_minhash_lsh_dedup,
        dedup.b28_simhash_dedup,
        dedup.b95_fuzzy_match_minhash_blocked,  # r6: same band discipline
        dedup.b105_winnowing_fingerprints,  # r7: token-less docs have no prints
    ):
        pairs = {
            (r["doc_a"], r["doc_b"]) for r in fn(spark, hostile_dir).collect()
        }
        # the exact-dup pair is the only legitimate near-dup; the
        # degenerate docs (NULL/empty/1-char) must not pair with
        # anything — a NULL-shingle bucket key or an empty shingle set
        # silently matching everything is the classic corpus-dedup bug
        # (for b95, disjoint shingle sets also mean zero band-collision
        # odds, so short unrelated docs can't reach the loose
        # edit-distance verify)
        assert (8, 9) in pairs, fn.__name__
        bad = {p for p in pairs if p != (8, 9)}
        assert not bad, (fn.__name__, bad)


def test_duplicated_spans_on_hostile_docs(spark, hostile_dir):
    """b87: every doc yields a row (zeros for NULL/empty/short); the
    planted exact-dup pair (8/9) is fully span-covered; the 100 kB
    single-doc repetition (doc 10) must NOT count — its spans repeat
    only within one document (intra-doc repetition is b63's signal,
    not cross-doc duplication)."""
    from kafka_streams_sandbox_spark.operators.dedup import b87_duplicated_spans

    out = {r["doc_id"]: r for r in b87_duplicated_spans(spark, hostile_dir).collect()}
    assert set(out) == {d[0] for d in _DOCS}
    for d in (0, 1, 2, 3, 4, 12, 13):  # null/empty/whitespace/short docs
        assert out[d]["n_spans"] == 0 and out[d]["dup_token_ratio"] == 0.0
    for d in (8, 9):  # exact dup pair: full coverage
        assert out[d]["dup_token_ratio"] == 1.0
        assert out[d]["covered_tokens"] == out[d]["n_tokens"]
    assert out[10]["dup_spans"] == 0  # intra-doc repeats don't count


def test_span_removal_rewrite_on_hostile_docs(spark, hostile_dir):
    """b97: every doc yields a row; NULL/empty/short docs come back
    untouched with clean_text '' or their original text; the planted
    exact-dup pair keeps doc 8 (min doc_id) verbatim and strips doc 9
    to nothing; the 100 kB intra-doc repeater is untouched (within-doc
    repetition is b63's signal, not cross-doc duplication)."""
    from kafka_streams_sandbox_spark.operators.dedup import (
        b97_span_removal_rewrite,
    )

    out = {
        r["doc_id"]: r
        for r in b97_span_removal_rewrite(spark, hostile_dir).collect()
    }
    assert set(out) == {d[0] for d in _DOCS}
    for d in (0, 1, 2, 3, 4, 12, 13):  # null/empty/whitespace/short
        r = out[d]
        assert r["removed_tokens"] == 0, d
        assert r["kept_tokens"] == r["n_tokens"], d
        if r["n_tokens"] == 0:
            assert r["clean_text"] == "", d
    # exact-dup pair: keeper survives verbatim, the copy is emptied
    assert out[8]["removed_tokens"] == 0
    assert out[8]["kept_tokens"] == out[8]["n_tokens"] > 0
    assert out[8]["clean_text"] != ""
    assert out[9]["kept_tokens"] == 0 and out[9]["clean_text"] == ""
    # intra-doc repeats never mark anything
    assert out[10]["removed_tokens"] == 0


def test_incremental_neardup_on_hostile_docs(spark, hostile_dir):
    """b98: the hostile corpus's exact-dup pair (8, 9) falls entirely
    in the BATCH (both %10 >= 8), so the standing corpus holds no
    near-dup of anything — every batch doc must come back unique, and
    the NULL/empty/short standing docs must not crash banding or
    surface as phantom matches."""
    from kafka_streams_sandbox_spark.operators.dedup import (
        b98_incremental_neardup,
    )

    out = {
        r["doc_id"]: r
        for r in b98_incremental_neardup(spark, hostile_dir).collect()
    }
    assert set(out) == {d[0] for d in _DOCS if d[0] % 10 >= 8}
    for d, r in out.items():
        assert r["status"] == "unique" and r["match_id"] is None, (d, r)


def test_span_removal_rewrite_mega_doc_linear(spark, tmp_path):
    """b97 (r7, VERDICT r6 Next #5): the rewrite must be LINEAR per
    doc. Planted hostile case: two identical 200k-token docs — every
    span is duplicated, so the non-keeper's removal set is its ENTIRE
    position range. The r6 in-row array_contains filter was
    O(n_tokens x |rm|) = 4e10 compares here (minutes+); the
    array_except form is O(n_tokens + |rm|) and must finish promptly
    with the exact keep-first semantics: keeper text intact,
    non-keeper fully stripped."""
    import time

    from kafka_streams_sandbox_spark.operators.dedup import (
        b97_span_removal_rewrite,
    )

    n = 200_000
    mega = " ".join(f"t{i % 997}x" for i in range(n))
    rows = [(1, mega), (2, mega)]
    table = pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows], pa.string()),
            "lang": pa.array(["en"] * len(rows), pa.string()),
            "source": pa.array(["srcM"] * len(rows), pa.string()),
            "n_chars": pa.array([len(r[1]) for r in rows], pa.int64()),
        }
    )
    pq.write_table(table, str(tmp_path / "documents.parquet"))
    t0 = time.time()
    out = {
        r["doc_id"]: r
        for r in b97_span_removal_rewrite(spark, str(tmp_path)).collect()
    }
    elapsed = time.time() - t0
    assert out[1]["removed_tokens"] == 0 and out[1]["clean_text"] == mega
    assert out[2]["removed_tokens"] == n and out[2]["clean_text"] == ""
    assert out[1]["n_tokens"] == out[2]["n_tokens"] == n
    # linearity pin: the quadratic form needs minutes-to-hours here
    assert elapsed < 120, f"rewrite took {elapsed:.0f}s — not linear"


def test_bigram_lm_gate_on_hostile_docs(spark, hostile_dir):
    """b108 over the hostile corpus: NULL/empty/whitespace/1-token
    docs (0-4, 11-13) carry no bigram evidence and emit no row; the
    rest are scored with lm_score in [0, 1). The exact-dup pair 8/9
    is maximal repeated-bigram mass and must gate IN; the unicode
    docs must tokenize without error (split is byte-agnostic)."""
    from kafka_streams_sandbox_spark.operators.pipeline import (
        b108_bigram_lm_gate,
    )

    got = {
        r["doc_id"]: r for r in b108_bigram_lm_gate(spark, hostile_dir).collect()
    }
    assert set(got) == {5, 6, 7, 8, 9, 10}
    for r in got.values():
        assert 0.0 <= r["lm_score"] < 1.0
    assert got[8]["passes_lm"] and got[9]["passes_lm"]
    assert got[8]["lm_score"] == got[9]["lm_score"]


def test_paragraph_dedup_on_hostile_docs(spark, hostile_dir):
    """b112 (r9): NULL text yields (NULL n_paras, 0 kept, '') — the
    NULL token array propagates through size()/ceil() identically in
    both engines (verified against the oracle on this corpus); empty
    and whitespace-only docs yield (0, 0, ''); every doc yields
    exactly one row and no degenerate doc contributes paragraphs
    another doc could lose to."""
    from kafka_streams_sandbox_spark.operators.dedup import (
        b112_paragraph_dedup,
    )

    out = {
        r["doc_id"]: r for r in b112_paragraph_dedup(spark, hostile_dir).collect()
    }
    assert len(out) == len(_DOCS)
    for i, txt in _DOCS:
        r = out[i]
        if txt is None:
            assert (r["n_paras"], r["kept_paras"], r["new_text"]) == (
                None, 0, "",
            ), i
        elif not txt.strip():
            assert (r["n_paras"], r["kept_paras"], r["new_text"]) == (
                0, 0, "",
            ), i
    # the planted exact-dup pair 8/9: identical texts, so every one of
    # 9's paragraphs is owned by 8 -> 9 rewrites to ''
    assert out[8]["kept_paras"] == out[8]["n_paras"] > 0
    assert (out[9]["kept_paras"], out[9]["new_text"]) == (0, "")
    assert out[9]["n_paras"] == out[8]["n_paras"]


def test_selection_family_survives_hostile_docs(spark, hostile_dir):
    """r10: the selection/tokenizer family on the hostile corpus. All
    sources here are 'srcH' (raw), so b116 scores every doc; NULL and
    token-free texts must flow through the vote/BPE/GD paths without
    crashing, with sane degenerate outputs."""
    from kafka_streams_sandbox_spark.operators.selection import (
        b116_dsir_selection,
        b117_bpe_merge_train,
        b118_bpe_apply,
        b120_quality_classifier,
    )

    # DSIR: token-free docs (NULL/empty/whitespace) are excluded —
    # the population the SQL oracle scores; counts are never NULL
    # (size(split(NULL)) is NULL — the guard this corpus found)
    rows = b116_dsir_selection(spark, hostile_dir).collect()
    assert rows, "aggregate must not be empty"
    n_tokenful = sum(1 for _id, t in _DOCS if t is not None and t.split())
    assert sum(r["n_docs"] for r in rows) == n_tokenful
    for r in rows:
        assert r["n_docs"] > 0
        assert r["sum_tokens"] > 0 and r["sum_pos_votes"] >= 0

    merges = b117_bpe_merge_train(spark, hostile_dir).collect()
    assert all(m["pair_count"] > 0 for m in merges)

    seg = b118_bpe_apply(spark, hostile_dir).collect()
    for r in seg:
        assert r["n_words"] <= r["total_symbols"] <= r["total_chars"]

    conf = b120_quality_classifier(spark, hostile_dir).collect()
    # token-free docs (NULL/empty/whitespace) are excluded by the
    # n_tok > 0 guard; the rest all classify
    n_tokenful = sum(
        1 for _id, t in _DOCS if t is not None and t.split()
    )
    assert sum(r["n_docs"] for r in conf) == n_tokenful

    # a39 (r11, ADVICE r10 #2): frozen-merge segmentation at ingest —
    # the standing side holds the NULLs/empties (vocab explode of a
    # NULL token array emits no rows), the arriving slice is the
    # planted dup pair {8, 9}; counts are never NULL and identical
    # texts segment identically
    from kafka_streams_sandbox_spark.streaming.windows import (
        a39_stream_bpe_segment,
    )

    seg39 = {
        r["doc_id"]: r
        for r in a39_stream_bpe_segment(spark, hostile_dir).collect()
    }
    assert set(seg39) == {8, 9}
    for r in seg39.values():
        assert r["n_words"] is not None and r["n_words"] > 0
        assert r["n_syms"] is not None and r["n_syms"] >= r["n_words"]
    assert seg39[8]["n_syms"] == seg39[9]["n_syms"]


def test_decontaminate_survives_hostile_docs(spark, hostile_dir):
    """r10: b119 on the hostile corpus — doc 0 (NULL text) is the
    benchmark slice (0 % 50 == 0), so the frozen set is empty and
    every non-benchmark doc passes through untouched (clean_text ==
    its token-normalized text, '' for NULL/whitespace)."""
    from kafka_streams_sandbox_spark.operators.pipeline import (
        b119_decontaminate_rewrite,
    )

    out = {r["doc_id"]: r for r in
           b119_decontaminate_rewrite(spark, hostile_dir).collect()}
    assert set(out) == {d[0] for d in _DOCS if d[0] % 50 != 0}
    for r in out.values():
        assert r["removed_tokens"] == 0
        assert r["n_tokens"] >= 0
    assert out[1]["clean_text"] == ""  # empty text
    assert out[2]["clean_text"] == ""  # whitespace-only
    assert out[11]["clean_text"] == ""  # NULL text
