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
