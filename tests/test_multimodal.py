"""Direct coverage for the multimodal decode/sample/audio operators
(b37/b38/b49) — schema, row-count expansion, and determinism of the
stubbed codecs (previously exercised only via registry import)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kafka_streams_sandbox_spark.operators.multimodal import (
    AUDIO_SCHEMA,
    DECODE_SCHEMA,
    FRAME_SCHEMA,
    _FRAME_SIZE,
    _FRAME_STRIDE,
    _SAMPLE_RATE,
    b37_image_decode_stub,
    b38_frame_sample,
    b49_audio_features,
    decode_image_batch,
)


def _doc_byte_lens(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return {
        r.doc_id: r.n
        for r in docs.select(
            "doc_id", F.length(F.encode("text", "utf-8")).alias("n")
        ).collect()
    }


def test_b37_schema_rows_and_determinism(spark, sf_dir):
    out = b37_image_decode_stub(spark, sf_dir)
    assert out.schema == DECODE_SCHEMA
    rows1 = {r.doc_id: r for r in out.collect()}
    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    assert len(rows1) == n_docs  # 1 row in -> 1 row out
    # deterministic fake decode: re-run must be identical
    rows2 = {r.doc_id: r for r in b37_image_decode_stub(spark, sf_dir).collect()}
    assert rows1 == rows2
    # spot-check the stub geometry against the blob length
    lens = _doc_byte_lens(spark, sf_dir)
    for doc_id, r in list(rows1.items())[:20]:
        n = lens[doc_id]
        assert r.width == 64 + (n % 64) * 16
        assert r.height == 64 + (n % 48) * 16
        assert r.n_pixels == r.width * r.height


def test_b37_real_codec_path_is_gated():
    with pytest.raises(NotImplementedError):
        decode_image_batch(b"\xff\xd8\xff", fake=False)


def test_b38_frame_expansion_counts(spark, sf_dir):
    """b38 is 1 -> N: per doc, frames = ceil(max(len//64, 1) / stride)."""
    out = b38_frame_sample(spark, sf_dir)
    assert out.schema == FRAME_SCHEMA
    per_doc = {
        r.doc_id: r.n
        for r in out.groupBy("doc_id").agg(F.count("*").alias("n")).collect()
    }
    lens = _doc_byte_lens(spark, sf_dir)
    assert set(per_doc) == set(lens)
    for doc_id, n_bytes in lens.items():
        n_frames = max(n_bytes // _FRAME_SIZE, 1)
        expected = -(-n_frames // _FRAME_STRIDE)  # ceil div
        assert per_doc[doc_id] == expected, doc_id
    assert sum(per_doc.values()) > len(per_doc)  # genuinely expanded


def test_b38_frames_are_real_slices(spark, sf_dir):
    row = (
        b38_frame_sample(spark, sf_dir)
        .filter(F.col("frame_idx") == 0)
        .orderBy("doc_id")
        .first()
    )
    text = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .filter(F.col("doc_id") == row.doc_id)
        .first()
        .text
    )
    assert bytes(row.frame_bytes) == text.encode("utf-8")[:_FRAME_SIZE]


def test_b49_audio_features_deterministic(spark, sf_dir):
    out = b49_audio_features(spark, sf_dir)
    assert out.schema == AUDIO_SCHEMA
    rows = {r.doc_id: r for r in out.collect()}
    lens = _doc_byte_lens(spark, sf_dir)
    assert set(rows) == set(lens)
    for doc_id, r in rows.items():
        assert r.n_samples == lens[doc_id]
        assert r.duration_s == round(r.n_samples / _SAMPLE_RATE, 6)
        assert 0 <= r.peak <= 128
    rows2 = {r.doc_id: r for r in b49_audio_features(spark, sf_dir).collect()}
    assert rows == rows2


def test_phash_neardup_contract(spark):
    """b86 at sf0.1 (the only SF whose corpus contains exact-duplicate
    texts): exact-duplicate payloads must pair at Hamming 0; every
    returned pair respects the threshold, is canonical (a<b), and
    appears once; the hash itself is deterministic."""
    from kafka_streams_sandbox_spark.operators.multimodal import (
        _PHASH_MAX_HAMMING,
        b86_phash_neardup,
        phash_batch,
    )

    assert phash_batch(b"some payload bytes" * 8) == phash_batch(
        b"some payload bytes" * 8
    )
    sf = "/root/testdata/sf0.1"
    pairs = b86_phash_neardup(spark, sf).collect()
    assert pairs, "sf0.1 corpus has exact dups; phash must find them"
    seen = set()
    for r in pairs:
        assert r.doc_a < r.doc_b
        assert 0 <= r.hamming <= _PHASH_MAX_HAMMING
        assert (r.doc_a, r.doc_b) not in seen
        seen.add((r.doc_a, r.doc_b))
    # every exact text dup shares a blob -> must appear with hamming 0
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    dups = (
        docs.groupBy("text").agg(F.collect_list("doc_id").alias("ids"))
        .filter(F.size("ids") >= 2)
        .select(F.slice(F.sort_array("ids"), 1, 2).alias("ab"))
        .collect()
    )
    assert dups, "fixture expectation: sf0.1 contains exact dup texts"
    for row in dups:
        a, b = row.ab
        assert (a, b) in seen, f"exact dup pair ({a},{b}) missing"


def test_phash_batch_kernel_matches_reference(spark, sf_dir):
    """The batch-vectorized hash kernel must equal the documented
    single-payload reference (phash_batch) bit-for-bit."""
    import pandas as pd

    from kafka_streams_sandbox_spark.catalog import table
    from kafka_streams_sandbox_spark.operators.multimodal import (
        phash_batch,
        phash_hashes,
        with_blob,
    )

    docs = with_blob(table(spark, sf_dir, "documents")).select("doc_id", "blob")
    rows = docs.limit(40).collect()
    pdf = pd.DataFrame(
        {
            "doc_id": [r.doc_id for r in rows],
            "blob": [bytes(r.blob) for r in rows],
        }
    )
    (out,) = list(phash_hashes(iter([pdf])))
    got = dict(zip(out["doc_id"], out["phash"]))
    for r in rows:
        assert int(got[r.doc_id]) == phash_batch(bytes(r.blob)), r.doc_id


# ---------------------------------------------------------------------------
# Hostile-kernel sweep (ADVICE r4 / VERDICT r4 #8): the Arrow kernels
# must survive degenerate inputs Spark usually shields them from —
# empty Arrow batches, NULL payloads, empty payloads — both through
# the plan and as direct calls on the public kernel functions.
# ---------------------------------------------------------------------------


def _hostile_docs_dir(tmp_path_factory):
    import pyarrow as pa
    import pyarrow.parquet as pq

    tmp = tmp_path_factory.mktemp("hostile_blobs")
    rows = [
        (0, "a normal document with some words"),
        (1, ""),  # empty text -> empty blob
        (2, None),  # NULL text -> NULL blob
        (3, "é中文 unicode \U0001f600"),  # multi-byte utf-8
        (4, "x" * 10_000),  # oversized payload
    ]
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "text": pa.array([r[1] for r in rows], pa.string()),
                "lang": pa.array(["en"] * len(rows), pa.string()),
                "source": pa.array(["s"] * len(rows), pa.string()),
                "n_chars": pa.array(
                    [len(r[1]) if r[1] else 0 for r in rows], pa.int64()
                ),
            }
        ),
        str(tmp / "documents.parquet"),
    )
    return str(tmp)


def test_decode_kernels_survive_hostile_blobs(spark, tmp_path_factory):
    """b37/b38/b49 through the plan over NULL/empty/unicode/oversized
    payloads: every doc yields its row(s), nothing crashes, NULL
    decodes as an empty payload."""
    from kafka_streams_sandbox_spark.operators.multimodal import (
        b37_image_decode_stub,
        b38_frame_sample,
        b49_audio_features,
    )

    d = _hostile_docs_dir(tmp_path_factory)
    dec = {r["doc_id"]: r for r in b37_image_decode_stub(spark, d).collect()}
    assert set(dec) == {0, 1, 2, 3, 4}
    for did in (1, 2):  # empty and NULL decode identically
        assert dec[did]["mean_luma"] == 0.0 and dec[did]["width"] == 64

    frames = b38_frame_sample(spark, d).collect()
    assert {r["frame_idx"] for r in frames if r["doc_id"] in (1, 2)} == {0}
    assert sum(1 for r in frames if r["doc_id"] == 4) > 1  # long blob

    au = {r["doc_id"]: r for r in b49_audio_features(spark, d).collect()}
    assert set(au) == {0, 1, 2, 3, 4}
    for did in (1, 2):
        assert au[did]["n_samples"] == 0 and au[did]["rms"] == 0.0


def test_kernel_functions_survive_direct_degenerate_calls():
    """The public kernels as plain functions: empty payloads and empty
    Arrow batches (which Spark may deliver after a selective filter)
    must not raise or emit schema-less frames."""
    import pandas as pd

    from kafka_streams_sandbox_spark.operators.multimodal import (
        decode_image_batch,
        phash_batch,
    )

    feats = decode_image_batch(b"")
    assert feats["mean_luma"] == 0.0 and feats["n_pixels"] > 0
    assert isinstance(phash_batch(b""), int)
    # NotImplementedError gate still pinned for the real-codec path
    import pytest as _pytest

    with _pytest.raises(NotImplementedError):
        decode_image_batch(b"abc", fake=False)
