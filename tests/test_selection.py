"""Contracts for the selection/tokenizer operators (b116–b118).

The BPE tests re-derive the merge sequence with an INDEPENDENT pure-
Python implementation (Counter + explicit list-scan merge, no string
replace) so the Spark replace-chain and the unrolled SQL oracle are
checked against a third formulation of the semantics. The DSIR test
re-derives the vote arithmetic with hashlib.md5 directly.
"""

from __future__ import annotations

import hashlib
from collections import Counter

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from kafka_streams_sandbox_spark.operators.selection import (
    _BPE_MERGES,
    _DSIR_D,
    _DSIR_TARGET,
    b116_dsir_selection,
    b117_bpe_merge_train,
    b118_bpe_apply,
)

SF = "/root/testdata/sf0.001"


# ---------------------------------------------------------------------------
# independent pure-Python BPE (list-scan merge, not string replace)
# ---------------------------------------------------------------------------


def _py_bpe(word_counts: Counter, k: int):
    """Return (merges, final_syms): merges = [(step, lhs, rhs, merged,
    pair_count)], final_syms = {word: [symbols]}."""
    syms = {w: list(w) for w in word_counts}
    merges = []
    for step in range(1, k + 1):
        pairs: Counter = Counter()
        for w, cnt in word_counts.items():
            s = syms[w]
            for i in range(len(s) - 1):
                pairs[(s[i], s[i + 1])] += cnt
        if not pairs:
            break
        # max count, then lexicographic (lhs, rhs) — the b117 tiebreak
        (lhs, rhs), pw = min(
            pairs.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merges.append((step, lhs, rhs, lhs + rhs, pw))
        for w in syms:
            s = syms[w]
            out, i = [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == lhs and s[i + 1] == rhs:
                    out.append(lhs + rhs)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            syms[w] = out
    return merges, syms


def _word_counts(texts) -> Counter:
    wc: Counter = Counter()
    for t in texts:
        wc.update(w for w in t.split() if w)
    return wc


@pytest.fixture(scope="module")
def docs_small():
    t = pq.read_table(f"{SF}/documents.parquet")
    return (
        t["doc_id"].to_pylist(),
        t["text"].to_pylist(),
        t["lang"].to_pylist(),
        t["source"].to_pylist(),
    )


def test_b117_matches_pure_python_rederivation(spark, docs_small):
    _, texts, _, _ = docs_small
    expect, _ = _py_bpe(_word_counts(texts), _BPE_MERGES)
    got = [
        (r["step"], r["lhs"], r["rhs"], r["merged"], r["pair_count"])
        for r in b117_bpe_merge_train(spark, SF).orderBy("step").collect()
    ]
    assert got == expect


def test_b118_matches_pure_python_rederivation(spark, docs_small):
    _, texts, langs, _ = docs_small
    wc = _word_counts(texts)
    _, syms = _py_bpe(wc, _BPE_MERGES)
    agg: dict[str, list[int]] = {}
    for text, lang in zip(texts, langs):
        a = agg.setdefault(lang, [0, 0, 0])
        for w in text.split():
            if not w:
                continue
            a[0] += 1
            a[1] += len(w)
            a[2] += len(syms[w])
    got = {
        r["lang"]: (r["n_words"], r["total_chars"], r["total_symbols"])
        for r in b118_bpe_apply(spark, SF).collect()
    }
    assert got == {k: tuple(v) for k, v in agg.items()}
    # segmentation never inflates symbol count past character count
    for n_words, chars, syms_n in got.values():
        assert n_words <= syms_n <= chars


def test_b116_matches_pure_python_rederivation(spark, docs_small):
    doc_ids, texts, langs, sources = docs_small
    bucket = lambda w: int(hashlib.md5(w.encode()).hexdigest()[:2], 16)
    c_t = [0] * _DSIR_D
    c_r = [0] * _DSIR_D
    for text, src in zip(texts, sources):
        tgt = src in _DSIR_TARGET
        for w in text.split():
            if w:
                (c_t if tgt else c_r)[bucket(w)] += 1
    t_tot, r_tot = sum(c_t), sum(c_r)
    agg: dict[tuple, list[int]] = {}
    for doc_id, text, lang, src in zip(doc_ids, texts, langs, sources):
        if src in _DSIR_TARGET:
            continue
        toks = [w for w in text.split() if w]
        if not toks:  # token-free docs are excluded (oracle semantics)
            continue
        n_pos = sum(
            1
            for w in toks
            if (c_t[bucket(w)] + 1) * (r_tot + _DSIR_D)
            > (c_r[bucket(w)] + 1) * (t_tot + _DSIR_D)
        )
        key = (lang, 2 * n_pos > len(toks))
        a = agg.setdefault(key, [0, 0, 0, doc_id])
        a[0] += 1
        a[1] += n_pos
        a[2] += len(toks)
        a[3] = min(a[3], doc_id)
    got = {
        (r["lang"], r["selected"]): (
            r["n_docs"],
            r["sum_pos_votes"],
            r["sum_tokens"],
            r["min_doc_id"],
        )
        for r in b116_dsir_selection(spark, SF).collect()
    }
    assert got == {k: tuple(v) for k, v in agg.items()}


def test_b121_matches_pure_python_rederivation(spark, docs_small):
    """b121 (r11, VERDICT r10 #5): the bigram-unit DSIR form against
    a full pure-python re-derivation — the vote arithmetic is b116's,
    the hashed unit is the adjacent token pair, and docs with < 2
    tokens are excluded (no bigram evidence)."""
    from kafka_streams_sandbox_spark.operators.selection import (
        b121_dsir_bigram_selection,
    )

    doc_ids, texts, langs, sources = docs_small
    bucket = lambda w: int(hashlib.md5(w.encode()).hexdigest()[:2], 16)

    def bigrams(text):
        toks = [w for w in text.split() if w]
        return [f"{a} {b}" for a, b in zip(toks, toks[1:])]

    c_t = [0] * _DSIR_D
    c_r = [0] * _DSIR_D
    for text, src in zip(texts, sources):
        tgt = src in _DSIR_TARGET
        for g in bigrams(text):
            (c_t if tgt else c_r)[bucket(g)] += 1
    t_tot, r_tot = sum(c_t), sum(c_r)
    agg: dict[tuple, list[int]] = {}
    for doc_id, text, lang, src in zip(doc_ids, texts, langs, sources):
        if src in _DSIR_TARGET:
            continue
        gs = bigrams(text)
        if not gs:
            continue
        n_pos = sum(
            1
            for g in gs
            if (c_t[bucket(g)] + 1) * (r_tot + _DSIR_D)
            > (c_r[bucket(g)] + 1) * (t_tot + _DSIR_D)
        )
        key = (lang, 2 * n_pos > len(gs))
        a = agg.setdefault(key, [0, 0, 0, doc_id])
        a[0] += 1
        a[1] += n_pos
        a[2] += len(gs)
        a[3] = min(a[3], doc_id)
    got = {
        (r["lang"], r["selected"]): (
            r["n_docs"],
            r["sum_pos_votes"],
            r["sum_tokens"],
            r["min_doc_id"],
        )
        for r in b121_dsir_bigram_selection(spark, SF).collect()
    }
    assert got == {k: tuple(v) for k, v in agg.items()}


def test_b121_single_token_docs_have_no_bigram_evidence(spark, tmp_path):
    """The bigram form's distinguishing exclusion: a 1-token raw doc
    votes in b116 but carries ZERO bigram units — b121 must drop it
    (not emit a NULL/zero row), while multi-token docs vote normally.
    Target mass exceeds raw mass so unseen-bucket bigrams lean RAW
    (smoothing: (0+1)(R+D) > (0+1)(T+D) iff R > T — here R < T)."""
    from kafka_streams_sandbox_spark.operators.selection import (
        b121_dsir_bigram_selection,
    )

    rows = [
        (0, "alpha beta " * 30, "en", "src0"),   # target: big mass
        (10, "omega gamma " * 5, "en", "src9"),  # raw background
        (100, "solo", "en", "src9"),             # 1 token: excluded
        (101, "alpha beta alpha", "en", "src9"),  # target-shaped
    ]
    got = {
        r["selected"]: (r["n_docs"], r["min_doc_id"])
        for r in b121_dsir_bigram_selection(
            spark, _write_planted(tmp_path, rows)
        ).collect()
    }
    # docs counted: 10 (not selected) and 101 (selected); 100 absent
    assert got[True] == (1, 101)
    assert got[False] == (1, 10)


def test_a41_frozen_weights_classify_unseen_arrivals(spark, tmp_path):
    """a41's planted separation contract (r11, VERDICT r10 #4): the
    classifier trains ONLY on the standing corpus (alpha = curated,
    omega = raw; b120's separable plant), then arriving docs it never
    saw — including an out-of-vocabulary mix — score through the
    frozen weights: the alpha-shaped arrival passes, the omega-shaped
    one fails, and token-free arrivals are excluded."""
    from kafka_streams_sandbox_spark.streaming.windows import (
        a41_stream_quality_classifier,
    )

    rows = [
        # standing (doc_id % 10 < 8)
        (0, "alpha alpha alpha", "en", "src0"),
        (1, "alpha alpha", "en", "src1"),
        (10, "omega omega omega", "en", "src9"),
        (11, "omega omega", "en", "src9"),
        # arriving (doc_id % 10 >= 8) — never seen in training
        (8, "alpha alpha alpha alpha", "en", "src9"),
        (18, "omega omega", "en", "src9"),
        (28, None, "en", "src9"),  # token-free: excluded by the guard
    ]
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "text": pa.array([r[1] for r in rows], pa.string()),
                "lang": pa.array([r[2] for r in rows], pa.string()),
                "source": pa.array([r[3] for r in rows], pa.string()),
                "n_chars": pa.array(
                    [len(r[1] or "") for r in rows], pa.int64()
                ),
            }
        ),
        str(tmp_path / "documents.parquet"),
    )
    got = {
        r["doc_id"]: r
        for r in a41_stream_quality_classifier(
            spark, str(tmp_path)
        ).collect()
    }
    assert set(got) == {8, 18}
    assert got[8]["predicted"] is True and got[8]["logit"] > 0
    assert got[18]["predicted"] is False and got[18]["logit"] < 0


def test_b116_strict_majority_planted(spark, tmp_path):
    """A raw doc whose votes split exactly 50/50 is NOT selected
    (strict majority), and a clearly target-shaped raw doc IS.

    Planted corpus: target docs use only token 'alpha'; raw
    background uses only 'omega' (hash buckets differ — asserted).
    doc 100 is half 'alpha' half 'omega' (tie → not selected);
    doc 101 is all 'alpha' (selected)."""
    bucket = lambda w: int(hashlib.md5(w.encode()).hexdigest()[:2], 16)
    assert bucket("alpha") != bucket("omega")
    rows = [
        (0, "alpha " * 50, "en", "src0"),
        (1, "alpha " * 50, "en", "src1"),
        (10, "omega " * 50, "en", "src9"),
        (11, "omega " * 50, "en", "src9"),
        (100, ("alpha " * 25) + ("omega " * 25), "en", "src9"),
        (101, "alpha " * 40, "en", "src9"),
    ]
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "text": pa.array([r[1].strip() for r in rows], pa.string()),
                "lang": pa.array([r[2] for r in rows], pa.string()),
                "source": pa.array([r[3] for r in rows], pa.string()),
                "n_chars": pa.array(
                    [len(r[1].strip()) for r in rows], pa.int64()
                ),
            }
        ),
        str(tmp_path / "documents.parquet"),
    )
    got = {
        (r["selected"]): (r["n_docs"], r["min_doc_id"])
        for r in b116_dsir_selection(spark, str(tmp_path)).collect()
    }
    # selected: only doc 101. not-selected: docs 10, 11 and the tie 100.
    assert got[True] == (1, 101)
    assert got[False] == (3, 10)


def test_b117_merge_rows_are_ordered_and_typed(spark):
    df = b117_bpe_merge_train(spark, SF)
    assert [f.name for f in df.schema.fields] == [
        "step",
        "lhs",
        "rhs",
        "merged",
        "pair_count",
    ]
    rows = df.orderBy("step").collect()
    assert [r["step"] for r in rows] == list(range(1, len(rows) + 1))
    assert all(r["merged"] == r["lhs"] + r["rhs"] for r in rows)
    # merge counts are non-increasing ONLY per identical pair space —
    # not globally monotonic; but every count is positive
    assert all(r["pair_count"] > 0 for r in rows)


def test_b117_consecutive_pair_words_match_list_scan(spark, tmp_path):
    """ADVICE r10 #1's planted trap: words with CONSECUTIVE
    occurrences of the elected pair ('abab', 'ababab', and the
    lhs == rhs run 'aaaa'). A sentinel-space replace consumes the
    shared boundary space (' a b a b ' -> ' ab a b '), under-counts
    the next round's pairs, and re-elects the same pair — the merge
    table must instead match the canonical left-to-right list scan
    (_py_bpe) exactly, duplicate-free."""
    rows = [
        (0, "abab abab abab ab", "en", "src9"),
        (1, "ababab ab ab", "en", "src9"),
        (2, "aaaa aaaa aa", "en", "src9"),
        (3, "abab aaaa", "en", "src9"),
    ]
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "text": pa.array([r[1] for r in rows], pa.string()),
                "lang": pa.array([r[2] for r in rows], pa.string()),
                "source": pa.array([r[3] for r in rows], pa.string()),
                "n_chars": pa.array([len(r[1]) for r in rows], pa.int64()),
            }
        ),
        str(tmp_path / "documents.parquet"),
    )
    expect, expect_syms = _py_bpe(
        _word_counts([r[1] for r in rows]), _BPE_MERGES
    )
    got = [
        (r["step"], r["lhs"], r["rhs"], r["merged"], r["pair_count"])
        for r in b117_bpe_merge_train(spark, str(tmp_path))
        .orderBy("step")
        .collect()
    ]
    assert got == expect
    # no pair may be elected twice (the replace-semantics symptom)
    assert len({(lhs, rhs) for _s, lhs, rhs, _m, _p in got}) == len(got)
    # and the applied segmentation agrees symbol-for-symbol
    wc = _word_counts([r[1] for r in rows])
    exp_totals = (
        sum(wc.values()),
        sum(len(w) * c for w, c in wc.items()),
        sum(len(expect_syms[w]) * c for w, c in wc.items()),
    )
    r = b118_bpe_apply(spark, str(tmp_path)).collect()
    assert len(r) == 1
    assert (
        r[0]["n_words"],
        r[0]["total_chars"],
        r[0]["total_symbols"],
    ) == exp_totals


def test_a38_frozen_histograms_differ_from_self_trained(spark, tmp_path):
    """The gate's verdicts come from the STANDING corpus's histograms,
    not the arriving slice's own: a token that dominates the arriving
    raw docs but is absent from the standing corpus votes only on +1
    smoothing — under a standing corpus whose raw side is heavy, the
    unseen token leans TARGET ((0+1)(R+D) > (0+1)(T+D) iff R > T),
    which self-trained b116 over the same union would not conclude.
    Planted: standing raw docs are 'omega'-heavy (R >> T), standing
    target docs 'alpha'; arriving raw docs are pure 'zzznovel' (unseen
    bucket — asserted distinct) → every arriving doc is SELECTED by
    the frozen gate."""
    import hashlib

    from kafka_streams_sandbox_spark.streaming.windows import (
        a38_stream_dsir_gate,
    )

    bucket = lambda w: int(hashlib.md5(w.encode()).hexdigest()[:2], 16)
    assert len({bucket("alpha"), bucket("omega"), bucket("zzznovel")}) == 3
    rows = [
        # standing (doc_id % 10 < 8): target 'alpha', raw 'omega'-heavy
        (0, "alpha " * 10, "en", "src0"),
        (1, "omega " * 50, "en", "src9"),
        (2, "omega " * 50, "en", "src9"),
        # arriving (doc_id % 10 >= 8): raw docs of an unseen token
        (8, "zzznovel " * 5, "en", "src9"),
        (18, "zzznovel " * 7, "en", "src9"),
    ]
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "text": pa.array([r[1].strip() for r in rows], pa.string()),
                "lang": pa.array([r[2] for r in rows], pa.string()),
                "source": pa.array([r[3] for r in rows], pa.string()),
                "n_chars": pa.array(
                    [len(r[1].strip()) for r in rows], pa.int64()
                ),
            }
        ),
        str(tmp_path / "documents.parquet"),
    )
    got = {
        r["doc_id"]: r["selected"]
        for r in a38_stream_dsir_gate(spark, str(tmp_path)).collect()
    }
    assert got == {8: True, 18: True}


def test_a39_oov_words_segment_through_frozen_merges(spark, tmp_path):
    """Arriving words the standing vocab never saw still segment
    through the frozen merge chain (BPE's point): standing corpus is
    'ab'-heavy so the first merges include (a,b)->ab (then (ab,ab));
    the arriving doc's OOV word 'ababab' (6 chars) must compress to
    fewer symbols than characters via those frozen merges, and a pure
    consonant string sharing no merge pair stays at one symbol per
    char."""
    from kafka_streams_sandbox_spark.streaming.windows import (
        a39_stream_bpe_segment,
    )

    rows = [
        # standing (doc_id % 10 < 8): words made of 'ab' units
        (0, "abab abab ab abab", "en", "src0"),
        (1, "ab abab ababab ab", "en", "src1"),
        # arriving: OOV 'ababab' + merge-free 'xyz'
        (8, "ababab xyz", "en", "src9"),
        # token-free arrivals (ADVICE r10 #2): NULL and empty text
        # must be excluded by the n_words > 0 guard, not emit NULL
        # count rows
        (18, None, "en", "src9"),
        (28, "", "en", "src9"),
    ]
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "text": pa.array([r[1] for r in rows], pa.string()),
                "lang": pa.array([r[2] for r in rows], pa.string()),
                "source": pa.array([r[3] for r in rows], pa.string()),
                "n_chars": pa.array(
                    [len(r[1] or "") for r in rows], pa.int64()
                ),
            }
        ),
        str(tmp_path / "documents.parquet"),
    )
    out = a39_stream_bpe_segment(spark, str(tmp_path)).collect()
    assert len(out) == 1 and out[0]["doc_id"] == 8
    assert out[0]["n_words"] == 2
    # 'ababab' compresses below its 6 chars; 'xyz' stays 3 — and the
    # exact total must match an independent re-derivation
    wc = Counter()
    for t in (rows[0][1], rows[1][1]):
        wc.update(t.split())
    merges, _ = _py_bpe(wc, _BPE_MERGES)
    syms = {"ababab": list("ababab"), "xyz": list("xyz")}
    for _step, lhs, rhs, _m, _pw in merges:
        for w, s in syms.items():
            o, i = [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == lhs and s[i + 1] == rhs:
                    o.append(lhs + rhs)
                    i += 2
                else:
                    o.append(s[i])
                    i += 1
            syms[w] = o
    expect = len(syms["ababab"]) + len(syms["xyz"])
    assert out[0]["n_syms"] == expect
    assert len(syms["ababab"]) < 6 and len(syms["xyz"]) == 3


def _write_planted(tmp_path, rows):
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "text": pa.array([r[1] for r in rows], pa.string()),
                "lang": pa.array([r[2] for r in rows], pa.string()),
                "source": pa.array([r[3] for r in rows], pa.string()),
                "n_chars": pa.array([len(r[1]) for r in rows], pa.int64()),
            }
        ),
        str(tmp_path / "documents.parquet"),
    )
    return str(tmp_path)


def test_b120_planted_separation(spark, tmp_path):
    """On a separable planted corpus ('alpha'-docs curated,
    'omega'-docs raw) the 3-round GD must classify every doc
    correctly; after round 1 the weights are already hand-derivable
    (w[b_alpha] = +lr/4, w[b_omega] = -lr/4 with balanced classes and
    zero init), so separation here is arithmetic, not luck."""
    from kafka_streams_sandbox_spark.operators.selection import (
        b120_quality_classifier,
    )

    rows = [
        (0, "alpha alpha alpha", "en", "src0"),
        (1, "alpha alpha", "en", "src1"),
        (10, "omega omega omega", "en", "src9"),
        (11, "omega omega", "en", "src9"),
    ]
    got = {
        (r["y"], r["predicted"]): r["n_docs"]
        for r in b120_quality_classifier(
            spark, _write_planted(tmp_path, rows)
        ).collect()
    }
    assert got == {(1, True): 2, (0, False): 2}


def test_b120_matches_numpy_rederivation(spark, docs_small):
    """Full numpy re-derivation of the 3-round GD on sf0.001: same
    features, same update rule; final weights within float-summation
    tolerance and identical confusion counts."""
    import numpy as np

    from kafka_streams_sandbox_spark.operators.selection import (
        _B120_ITERS,
        _B120_LR,
        b120_quality_classifier,
        train_quality_classifier,
    )
    from kafka_streams_sandbox_spark.catalog import table

    doc_ids, texts, langs, sources = docs_small
    bucket = lambda w: int(hashlib.md5(w.encode()).hexdigest()[:2], 16)
    feats = []
    for text, lang, src in zip(texts, langs, sources):
        toks = [w for w in text.split() if w]
        if not toks:
            continue
        x = np.zeros(_DSIR_D)
        for w in toks:
            x[bucket(w)] += 1.0
        feats.append((x / len(toks), 1.0 if src in _DSIR_TARGET else 0.0,
                      lang))
    X = np.array([f[0] for f in feats])
    y = np.array([f[1] for f in feats])
    n = len(feats)
    w = np.zeros(_DSIR_D)
    b = 0.0
    for _ in range(_B120_ITERS):
        p = 1.0 / (1.0 + np.exp(-(X @ w + b)))
        err = p - y
        w -= _B120_LR * (X.T @ err) / n
        b -= _B120_LR * err.sum() / n

    docs = table(spark, "/root/testdata/sf0.001", "documents").withColumn(
        "is_target",
        __import__("pyspark.sql.functions", fromlist=["col"]).col(
            "source"
        ).isin("src0", "src1", "src2", "src3"),
    )
    got_w, got_b, _ = train_quality_classifier(docs)
    assert abs(got_b - b) < 1e-9
    assert np.max(np.abs(np.array(got_w) - w)) < 1e-9

    expect = {}
    for (x, yy, lang) in feats:
        pred = (x @ w + b) > 0
        k = (lang, int(yy), bool(pred))
        expect[k] = expect.get(k, 0) + 1
    got = {
        (r["lang"], r["y"], bool(r["predicted"])): r["n_docs"]
        for r in b120_quality_classifier(
            spark, "/root/testdata/sf0.001"
        ).collect()
    }
    assert got == expect


# ---------------------------------------------------------------------------
# B122: production-shape trainer (driver-side incremental merge loop)
# ---------------------------------------------------------------------------


def test_b122_incremental_loop_matches_recount_twin(spark, docs_small):
    """The incremental pair-index + lazy-heap loop must reproduce the
    per-round full-recount twin (_py_bpe) merge-for-merge — on the
    fixture corpus at a merge count deep enough to exhaust most of the
    pair space (the regime where stale heap entries and index updates
    actually exercise)."""
    from kafka_streams_sandbox_spark.operators.selection import (
        bpe_merge_loop,
    )

    _, texts, _, _ = docs_small
    wc = _word_counts(texts)
    k = 200  # far past the fixture's pair space: exercises exhaustion
    expect, _ = _py_bpe(wc, k)
    got = bpe_merge_loop(sorted(wc.items()), k)
    assert got == expect


def test_b122_consecutive_pair_contract():
    """The planted 'abab' trap through the PRODUCTION loop: canonical
    left-to-right non-overlapping semantics, no pair elected twice."""
    from kafka_streams_sandbox_spark.operators.selection import (
        bpe_merge_loop,
    )

    texts = ["abab abab abab ab", "ababab ab ab", "aaaa aaaa aa", "abab aaaa"]
    wc = _word_counts(texts)
    expect, _ = _py_bpe(wc, _BPE_MERGES)
    got = bpe_merge_loop(sorted(wc.items()), _BPE_MERGES)
    assert got == expect
    assert len({(lhs, rhs) for _s, lhs, rhs, _m, _p in got}) == len(got)


def test_b122_query_matches_python_on_capped_vocab(spark, docs_small):
    """End-to-end b122 at sf0.001 == the pure-Python twin over the
    identically capped vocab (the fixture vocab is far under the cap,
    so this also pins b122 == b117 semantics when the cap is
    unbinding)."""
    from kafka_streams_sandbox_spark.operators.selection import (
        _B122_MERGES,
        _B122_VOCAB_CAP,
        b122_bpe_production_train,
    )

    _, texts, _, _ = docs_small
    wc = _word_counts(texts)
    capped = sorted(wc.items(), key=lambda kv: (-kv[1], kv[0]))[
        :_B122_VOCAB_CAP
    ]
    expect, _ = _py_bpe(Counter(dict(capped)), _B122_MERGES)
    got = [
        (r["step"], r["lhs"], r["rhs"], r["merged"], r["pair_count"])
        for r in b122_bpe_production_train(spark, SF)
        .orderBy("step")
        .collect()
    ]
    assert got == expect


def test_b122_binding_cap_drops_tail_words(spark, tmp_path):
    """When the cap BINDS, training must see only the top-cap words by
    (cnt DESC, w ASC) — the tail word's pairs must not influence the
    merge table (both engines apply the same cap, so this is the
    semantics the oracle hash-verifies at scale)."""
    from kafka_streams_sandbox_spark.operators.selection import (
        bpe_merge_loop,
        capped_vocab,
    )

    rows = [
        (0, "xy xy xy xy zq", "en", "src9"),
        (1, "xy xy zq pp", "en", "src9"),
    ]
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "text": pa.array([r[1] for r in rows], pa.string()),
                "lang": pa.array([r[2] for r in rows], pa.string()),
                "source": pa.array([r[3] for r in rows], pa.string()),
                "n_chars": pa.array([len(r[1]) for r in rows], pa.int64()),
            }
        ),
        str(tmp_path / "documents.parquet"),
    )
    from kafka_streams_sandbox_spark.catalog import table as _table

    docs = _table(spark, str(tmp_path), "documents")
    wc = capped_vocab(docs, cap=2)
    # corpus vocab is {xy:6, zq:2, pp:1} -> cap=2 keeps xy, zq
    assert wc == [("xy", 6), ("zq", 2)]
    merges = bpe_merge_loop(wc, 4)
    merged_syms = {m for _s, _l, _r, m, _p in merges}
    assert "pp" not in merged_syms  # the dropped tail word
    expect, _ = _py_bpe(Counter({"xy": 6, "zq": 2}), 4)
    assert merges == expect


# ---------------------------------------------------------------------------
# B123/a42: unigram-LM trainer — independent pure-Python EM twin
# ---------------------------------------------------------------------------
# Re-derives seed, integer costs, Viterbi, EM and prune from the
# written contract (module comment in selection.py) without importing
# the trainer's internals — the b55/b92 independent-re-derivation
# layer for an operator whose float-EM fitting has no SQL oracle.


def _twin_viterbi(word, costs, maxlen=8, oov=1_000_000 * 64):
    L = len(word)
    best = [0] + [float("inf")] * L
    back = [0] * (L + 1)
    for i in range(1, L + 1):
        for j in range(1, min(i, maxlen) + 1):
            piece = word[i - j : i]
            c = costs.get(piece)
            if c is None:
                if j != 1:
                    continue
                c = oov
            cand = best[i - j] + c
            if cand < best[i] or (cand == best[i] and j > back[i]):
                best[i], back[i] = cand, j
    out, i = [], L
    while i > 0:
        out.append(word[i - back[i] : i])
        i -= back[i]
    return list(reversed(out))


def _twin_unigram_train(texts, maxlen=8, seed_cap=2048, vocab=512, rounds=3):
    import math

    wc = _word_counts(texts)
    # seed: all substrings <= maxlen with multiplicity, weighted
    seed: Counter = Counter()
    for w, cnt in wc.items():
        for i in range(len(w)):
            for j in range(i + 1, min(len(w), i + maxlen) + 1):
                seed[w[i:j]] += cnt
    multis = sorted(
        ((p, c) for p, c in seed.items() if len(p) > 1),
        key=lambda kv: (-kv[1], kv[0]),
    )[:seed_cap]
    counts = dict(multis)
    counts.update({p: c for p, c in seed.items() if len(p) == 1})

    def costs_of(cs):
        total = sum(cs.values()) + len(cs)
        return {
            p: round(-1_000_000 * math.log((c + 1) / total))
            for p, c in cs.items()
        }

    for _ in range(rounds):
        costs = costs_of(counts)
        new: Counter = Counter()
        for w, cnt in wc.items():
            for p in _twin_viterbi(w, costs, maxlen):
                new[p] += cnt
        multis = sorted(
            ((p, c) for p, c in new.items() if len(p) > 1),
            key=lambda kv: (-kv[1], kv[0]),
        )[:vocab]
        counts = dict(multis)
        counts.update({p: c for p, c in new.items() if len(p) == 1})
    return counts


def test_b123_matches_pure_python_twin_on_fixture(spark, docs_small):
    from kafka_streams_sandbox_spark.operators.selection import (
        b123_unigram_lm_train,
    )

    _, texts, _, _ = docs_small
    expect = _twin_unigram_train(texts)
    got = {
        r["piece"]: r["n_occurrences"]
        for r in b123_unigram_lm_train(spark, SF).collect()
    }
    assert got == expect


def test_b123_planted_morphemes_split_long_words(spark, tmp_path):
    """Planted corpus: 'alphabeta'/'betaalpha' (9 chars) exceed the
    8-char piece ceiling so they MUST segment; the frequent morphemes
    'alpha'/'beta' must be the chosen pieces — and the trained table
    must equal the independent twin's exactly."""
    from kafka_streams_sandbox_spark.operators.selection import (
        _ulm_costs,
        b123_unigram_lm_train,
        unigram_lm_train,
        unigram_viterbi,
    )
    from kafka_streams_sandbox_spark.catalog import table as _table

    texts = ["alpha beta alphabeta betaalpha"] * 20 + ["alpha beta"] * 10
    rows = list(enumerate(texts))
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "text": pa.array([r[1] for r in rows], pa.string()),
                "lang": pa.array(["en"] * len(rows), pa.string()),
                "source": pa.array(["src9"] * len(rows), pa.string()),
                "n_chars": pa.array(
                    [len(r[1]) for r in rows], pa.int64()
                ),
            }
        ),
        str(tmp_path / "documents.parquet"),
    )
    expect = _twin_unigram_train(texts)
    got = {
        r["piece"]: r["n_occurrences"]
        for r in b123_unigram_lm_train(spark, str(tmp_path)).collect()
    }
    assert got == expect
    counts, _ = unigram_lm_train(_table(spark, str(tmp_path), "documents"))
    costs = _ulm_costs(counts)
    assert unigram_viterbi("alphabeta", costs) == ["alpha", "beta"]
    assert unigram_viterbi("betaalpha", costs) == ["beta", "alpha"]


def test_unigram_viterbi_oov_chars_segment_deterministically():
    from kafka_streams_sandbox_spark.operators.selection import (
        unigram_viterbi,
    )

    costs = {"ab": 5, "a": 10, "b": 10}
    # 'z' is OOV: must fall back to the single-char OOV path
    assert unigram_viterbi("abz", costs) == ["ab", "z"]
    assert unigram_viterbi("zzz", costs) == ["z", "z", "z"]


def test_unigram_segment_frame_matches_twin(spark, tmp_path):
    """The a42 per-batch core (distinct-word Arrow DP + count join)
    must reproduce the twin's per-doc (n_words, n_syms) — including a
    doc carrying an OOV word."""
    from kafka_streams_sandbox_spark.operators.selection import (
        unigram_segment_frame,
    )
    from kafka_streams_sandbox_spark.catalog import table as _table

    texts = [
        "alphabeta alpha beta",
        "betaalpha qqq",  # 'q' never in the cost table -> OOV path
        "alpha alpha alpha",
    ]
    rows = list(enumerate(texts))
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "text": pa.array([r[1] for r in rows], pa.string()),
                "lang": pa.array(["en"] * len(rows), pa.string()),
                "source": pa.array(["src9"] * len(rows), pa.string()),
                "n_chars": pa.array(
                    [len(r[1]) for r in rows], pa.int64()
                ),
            }
        ),
        str(tmp_path / "documents.parquet"),
    )
    costs = {"alpha": 100, "beta": 120, "a": 900, "b": 900, "l": 900,
             "p": 900, "h": 900, "e": 900, "t": 900}
    got = {
        r["doc_id"]: (r["n_words"], r["n_syms"])
        for r in unigram_segment_frame(
            _table(spark, str(tmp_path), "documents"), costs
        ).collect()
    }
    expect = {}
    for doc_id, text in rows:
        ws = text.split()
        expect[doc_id] = (
            len(ws),
            sum(len(_twin_viterbi(w, costs)) for w in ws),
        )
    assert got == expect


def test_ulm_loss_prune_keeps_irreplaceable_pieces():
    """r13 (VERDICT r12 #5): the loss-contribution prune must keep
    the piece whose REMOVAL hurts segmentation most, not the piece
    with the biggest raw count — a frequent piece that is cheaply
    composable from other kept pieces ranks below a piece over rare
    chars. The expected ranking is re-derived independently here
    (masked-Viterbi contribution per piece)."""
    import math

    from kafka_streams_sandbox_spark.operators.selection import (
        _ULM_OOV_COST,
        _ulm_costs,
        _ulm_loss_prune,
        unigram_viterbi,
    )

    # "ab": huge count but 'a'/'b' are cheap -> tiny loss if dropped.
    # "qz": small count but 'q'/'z' are rare singles -> costly alt.
    counts = {"a": 5000, "b": 5000, "ab": 900, "qz": 40, "q": 2, "z": 2}

    def contribution(p):
        costs = _ulm_costs(counts)
        own = costs[p]
        costs[p] = _ULM_OOV_COST * len(p) + 1
        alt = sum(
            costs.get(s, _ULM_OOV_COST) for s in unigram_viterbi(p, costs)
        )
        return counts[p] * (alt - own)

    expect_winner = max(["ab", "qz"], key=contribution)
    assert expect_winner == "qz"  # the scenario is actually separating
    pruned = _ulm_loss_prune(counts, keep=1)
    # singles always survive (reachability floor); exactly one multi
    assert {p for p in pruned if len(p) == 1} == {"a", "b", "q", "z"}
    assert {p for p in pruned if len(p) > 1} == {"qz"}


def test_ulm_trainer_defaults_unchanged_and_schedule_lands_on_vocab(
    spark, tmp_path
):
    """Parameterizing the trainer (r13) must not move the b123/a42
    fixture posture: default args == the pre-r13 constant path (same
    piece table). The loss-prune schedule must land exactly on the
    requested inventory (multi-char pieces <= vocab) while keeping
    every single char."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from kafka_streams_sandbox_spark.operators.selection import (
        _ULM_ROUNDS,
        _ULM_SEED_CAP,
        _ULM_VOCAB,
        unigram_lm_train,
    )

    texts = ["walker walking talked talker walked talking"] * 6
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(6), pa.int64()),
                "text": pa.array(texts, pa.string()),
                "lang": pa.array(["en"] * 6, pa.string()),
                "source": pa.array(["t"] * 6, pa.string()),
                "n_chars": pa.array([len(t) for t in texts], pa.int64()),
            }
        ),
        str(tmp_path / "documents.parquet"),
    )
    docs = spark.read.parquet(str(tmp_path / "documents.parquet"))
    default_counts, _ = unigram_lm_train(docs)
    explicit_counts, _ = unigram_lm_train(
        docs,
        seed_cap=_ULM_SEED_CAP,
        vocab=_ULM_VOCAB,
        rounds=_ULM_ROUNDS,
        loss_prune=False,
    )
    assert default_counts == explicit_counts

    loss_counts, _ = unigram_lm_train(docs, vocab=4, loss_prune=True)
    multis = [p for p in loss_counts if len(p) > 1]
    singles = {p for p in loss_counts if len(p) == 1}
    assert 0 < len(multis) <= 4
    # singles = the chars some Viterbi path chose (chars covered only
    # by multi-char pieces drop out of the EM counts — the same rule
    # as the top-K path); all must come from the corpus alphabet
    assert singles and singles <= {c for t in texts for c in t if c != " "}
