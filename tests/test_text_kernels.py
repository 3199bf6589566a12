"""Kernel-exactness properties for the text fingerprint family.

The DuckDB oracle certifies these on the driver corpus; these tests
certify the KERNEL math itself on adversarial strings a corpus draw
may never contain — a third, independent implementation (pure Python)
must agree byte-for-byte.
"""

from __future__ import annotations

import hashlib

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from kafka_streams_sandbox_spark.operators.text import (
    _RH_BASE,
    _RH_PRIME,
    b32_fingerprint,
    b53_rolling_hash,
)

_STRINGS = [
    "",
    "a",
    "abc",
    "the quick brown fox",
    "aaaaaaaaaaaaaaaaaaaaaaaaaaaaaa",  # degenerate repetition
    "ZyXwVu 0123456789 !@#$%^&*()",
    "tab\tnewline\nreturn\rmix",
    "ünïcödé ストリング 中文",  # multi-byte codepoints
    "x" * 10_000,  # long doc: fold must not overflow int64
    "mixed CASE Mixed case MIXED",
]


def _py_rolling_hash(text: str) -> int:
    h = 0
    for ch in text:
        h = (h * _RH_BASE + ord(ch)) % _RH_PRIME
    return h


def _docs_dir(tmp_path, texts) -> str:
    table = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(["en"] * len(texts), pa.string()),
            "source": pa.array(["srcK"] * len(texts), pa.string()),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )
    pq.write_table(table, str(tmp_path / "documents.parquet"))
    return str(tmp_path)


def test_rolling_hash_matches_python_twin(spark, tmp_path):
    """b53's SQL fold h = (h*B + code) mod P must equal the obvious
    Python left fold codepoint-for-codepoint, including multi-byte
    unicode (Spark ascii() = leading codepoint, ord() in Python) and
    a 10k-char doc that would overflow int64 without the mod."""
    sf_dir = _docs_dir(tmp_path, _STRINGS)
    got = {
        r["doc_id"]: r["rolling_hash"]
        for r in b53_rolling_hash(spark, sf_dir).collect()
    }
    for i, s in enumerate(_STRINGS):
        assert got[i] == _py_rolling_hash(s), (i, s[:30])


def test_fingerprint_is_token_order_insensitive(spark, tmp_path):
    """b32's md5-over-sorted-distinct-tokens must be invariant under
    token reordering and duplication — that IS its dedup contract —
    and must equal a pure-Python md5 of the same canonical form."""
    texts = [
        "alpha beta gamma",
        "gamma  alpha   beta",  # reordered + extra whitespace
        "beta gamma alpha alpha beta",  # duplicated tokens
        "Alpha Beta Gamma",  # case-folded by the kernel (lower)
        "alpha beta gamma delta",  # genuinely different
    ]
    sf_dir = _docs_dir(tmp_path, texts)
    rows = {
        r["doc_id"]: (r["fingerprint"], r["vocab_size"])
        for r in b32_fingerprint(spark, sf_dir).collect()
    }
    expected = hashlib.md5(b"alpha beta gamma").hexdigest()
    for i in range(4):
        assert rows[i] == (expected, 3), i
    assert rows[4][0] != expected
    assert rows[4][1] == 4


def _py_gopher_metrics(text):
    """Pure-Python third implementation of b102's metric definitions."""
    from collections import Counter

    toks = text.split() if text else []
    n_tokens = len(toks)

    def grams(n):
        if n_tokens < n:
            return []
        return [" ".join(toks[i : i + n]) for i in range(n_tokens - n + 1)]

    def top_frac(n):
        g = grams(n)
        return max(Counter(g).values()) * n / n_tokens if g else 0.0

    def dup_cov(n):
        g = grams(n)
        if not g:
            return 0.0
        c = Counter(g)
        covered = set()
        for i, gr in enumerate(g):
            if c[gr] >= 2:
                covered.update(range(i, i + n))
        return len(covered) / n_tokens

    m = {
        "n_tokens": n_tokens,
        "top2_frac": top_frac(2),
        "top3_frac": top_frac(3),
        "dup5_cov": dup_cov(5),
        "dup10_cov": dup_cov(10),
    }
    m["passes_repetition"] = (
        m["top2_frac"] <= 0.20
        and m["top3_frac"] <= 0.18
        and m["dup5_cov"] <= 0.15
        and m["dup10_cov"] <= 0.10
    )
    return m


def test_gopher_repetition_matches_python_twin(spark, tmp_path):
    """b102's posting-list plan must agree metric-for-metric (exact
    float equality — every metric is one integer division in both
    implementations) with the obvious pure-Python Counter form, on
    docs spanning every rule: a top-2-gram spam loop, a long repeated
    block inside otherwise-unique filler (dup10 fires, top2 doesn't),
    a clean passing doc, and the degenerate short/empty docs."""
    from kafka_streams_sandbox_spark.operators.text import b102_gopher_repetition

    filler = " ".join(f"tok{i}" for i in range(40))
    block = " ".join(f"rep{i}" for i in range(12))
    texts = [
        "buy now " * 30,  # top2 ~1.0: fails the 0.20 rule
        f"{filler} {block} middle {block} tail",  # dup10 fires only
        # clean doc needs realistic length: with T all-unique tokens
        # top3_frac = 3/T, so anything under 17 tokens fails the 0.18
        # rule by construction (the rules target page-length docs)
        " ".join(f"clean{i}" for i in range(40)),
        "word",
        "",
        "a b a b c d e f g h i j k l m n o p q r s t u v w x y z",
    ]
    sf_dir = _docs_dir(tmp_path, texts)
    got = {
        r["doc_id"]: r.asDict()
        for r in b102_gopher_repetition(spark, sf_dir).collect()
    }
    assert set(got) == set(range(len(texts)))
    for i, t in enumerate(texts):
        want = _py_gopher_metrics(t)
        for k, v in want.items():
            assert got[i][k] == v, (i, k, got[i][k], v)
    assert not got[0]["passes_repetition"]  # spam loop rejected
    assert not got[1]["passes_repetition"]  # repeated block rejected
    assert got[1]["top2_frac"] <= 0.20  # ...but only via the dup rule
    assert got[1]["dup10_cov"] > 0.10
    assert got[2]["passes_repetition"]  # clean doc passes
    assert got[3]["passes_repetition"] and got[4]["passes_repetition"]


def _py_b108(texts, with_avg=False):
    """Pure-Python twin of b108's scoring core (Counter form).
    ``with_avg=True`` also returns the corpus score (b111's bucket
    threshold) as a second value."""
    from collections import Counter

    toks = {
        i: [t for t in (txt or "").strip().split() if t]
        for i, txt in enumerate(texts)
    }
    occ = {
        i: list(zip(ts, ts[1:])) for i, ts in toks.items() if len(ts) >= 2
    }
    pn: Counter = Counter(bg for bgs in occ.values() for bg in bgs)
    n_p: Counter = Counter()
    for (p, _n), c in pn.items():
        n_p[p] += c
    masses = {}
    for i, bgs in occ.items():
        masses[i] = (
            len(bgs),
            sum(pn[bg] for bg in bgs if pn[bg] >= 2),
            sum(n_p[bg[0]] for bg in bgs),
        )
    g_hit = sum(h for _b, h, _ba in masses.values())
    g_den = sum(b + ba for b, _h, ba in masses.values())
    avg = g_hit / g_den
    out = {
        i: (b, h / (b + ba), 2.0 * (h / (b + ba)) >= avg)
        for i, (b, h, ba) in masses.items()
    }
    return (out, avg) if with_avg else out


def test_bigram_lm_gate_matches_python_twin_and_separates(spark, tmp_path):
    """b108's engine plan must agree value-for-value (exact float
    equality — the score is one integer-ratio division in both
    implementations) with the obvious pure-Python Counter twin, and
    the gate must SEPARATE: corpus-typical template docs pass, docs
    made of globally-unique bigrams (the self-trained-MLE pathology
    that scores gibberish as maximally fluent) land at 0.0 and fail.
    Degenerate docs (< 2 tokens) are not scored — the b69 length
    floor owns that band."""
    from kafka_streams_sandbox_spark.operators.pipeline import (
        b108_bigram_lm_gate,
    )

    template = "the cat sat on the mat and the dog sat on the rug " * 3
    texts = (
        [template] * 6  # corpus-typical: repeated transitions
        + [
            " ".join(f"gib{i}_{j}" for j in range(30))  # unique bigrams
            for i in range(4)
        ]
        + ["solo", ""]  # < 2 tokens: excluded
    )
    sf_dir = _docs_dir(tmp_path, texts)
    got = {
        r["doc_id"]: (r["n_bigrams"], r["lm_score"], r["passes_lm"])
        for r in b108_bigram_lm_gate(spark, sf_dir).collect()
    }
    want = _py_b108(texts)
    assert set(got) == set(want)  # solo/empty rows absent
    for i in want:
        assert got[i] == want[i], (i, got[i], want[i])
    for i in range(6):  # templates pass
        assert got[i][2] and 0.0 < got[i][1] < 1.0
    for i in range(6, 10):  # gibberish: hapax mass excluded -> 0.0
        assert got[i][1] == 0.0 and not got[i][2]


def test_lm_bucket_mixture_separates_and_samples(spark, tmp_path):
    """b111 (r8): on the template/gibberish corpus the templates score
    above the corpus ratio (head — kept outright) and the
    unique-bigram gibberish lands at 0.0 (tail — kept only under the
    100-permille Lehmer pick); bucket membership and the keep bit
    must match the pure-Python re-derivation of both rules."""
    from kafka_streams_sandbox_spark.operators.pipeline import (
        _B111_RATE_PERMILLE,
        b111_lm_bucket_mixture,
    )

    template = "the cat sat on the mat and the dog sat on the rug " * 3
    texts = [template] * 6 + [
        " ".join(f"gib{i}_{j}" for j in range(30)) for i in range(4)
    ]
    sf_dir = _docs_dir(tmp_path, texts)
    got = {
        r["doc_id"]: (r["bucket"], r["keep"], r["lm_score"])
        for r in b111_lm_bucket_mixture(spark, sf_dir).collect()
    }
    assert set(got) == set(range(10))
    for i in range(6):
        assert got[i][0] == "head" and got[i][1]
    for i in range(6, 10):
        assert got[i][0] == "tail" and got[i][2] == 0.0
        want_keep = ((i * 48271) % 2147483647) % 1000 < _B111_RATE_PERMILLE[
            "tail"
        ]
        assert got[i][1] == want_keep
