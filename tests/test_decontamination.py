"""Planted contracts for b119_decontaminate_rewrite (13-gram
benchmark decontamination as a span rewrite)."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq

from kafka_streams_sandbox_spark.operators.pipeline import (
    _B119_N,
    b119_decontaminate_rewrite,
)


def _write_docs(tmp_path, rows):
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "text": pa.array([r[1] for r in rows], pa.string()),
                "lang": pa.array(["en"] * len(rows), pa.string()),
                "source": pa.array(["src0"] * len(rows), pa.string()),
                "n_chars": pa.array([len(r[1]) for r in rows], pa.int64()),
            }
        ),
        str(tmp_path / "documents.parquet"),
    )
    return str(tmp_path)


def test_b119_planted_contamination(spark, tmp_path):
    """A training doc embedding a 20-token benchmark passage loses
    EXACTLY those 20 tokens (8 matching 13-gram windows, interval
    union = the passage); a doc sharing only 12 consecutive benchmark
    tokens is untouched (below the n-gram length); a short doc is
    untouched; the benchmark doc itself is not emitted."""
    passage = [f"bench{i}" for i in range(20)]  # 20-token passage
    head = [f"head{i}" for i in range(5)]
    tail = [f"tail{i}" for i in range(4)]
    rows = [
        (50, " ".join(passage)),  # benchmark (doc_id % 50 == 0)
        (1, " ".join(head + passage + tail)),  # contaminated
        (2, " ".join(head + passage[: _B119_N - 1] + tail)),  # 12 < N
        (3, "tiny doc"),  # shorter than any n-gram
    ]
    out = {
        r["doc_id"]: r
        for r in b119_decontaminate_rewrite(
            spark, _write_docs(tmp_path, rows)
        ).collect()
    }
    assert set(out) == {1, 2, 3}  # benchmark doc 50 not emitted
    r1 = out[1]
    assert r1["n_tokens"] == 29
    assert r1["removed_tokens"] == 20
    assert r1["kept_tokens"] == 9
    assert r1["clean_text"] == " ".join(head + tail)
    assert out[2]["removed_tokens"] == 0
    assert out[2]["clean_text"] == " ".join(
        head + passage[: _B119_N - 1] + tail
    )
    assert out[3]["removed_tokens"] == 0
    assert out[3]["clean_text"] == "tiny doc"


def test_b119_overlapping_occurrences_union_exactly(spark, tmp_path):
    """Two overlapping embeddings of the same benchmark passage in one
    doc remove the union of their intervals, never double-counting:
    tokens = A + passage + passage (back-to-back repetition also
    creates NEW matching windows spanning the seam only if the seam
    n-grams exist in the benchmark — they don't here, but the union
    still covers both copies exactly)."""
    passage = [f"p{i}" for i in range(_B119_N)]  # exactly one window
    head = ["lead0", "lead1"]
    rows = [
        (0, " ".join(passage)),  # benchmark: one 13-gram
        (7, " ".join(head + passage + passage)),
    ]
    out = {
        r["doc_id"]: r
        for r in b119_decontaminate_rewrite(
            spark, _write_docs(tmp_path, rows)
        ).collect()
    }
    r7 = out[7]
    assert r7["n_tokens"] == 2 + 2 * _B119_N
    assert r7["removed_tokens"] == 2 * _B119_N
    assert r7["clean_text"] == " ".join(head)


def test_a40_arriving_doc_rewrites_against_standing_benchmark(
    spark, tmp_path
):
    """The frozen set comes from the STANDING corpus's benchmark docs:
    an arriving doc embedding a standing benchmark passage loses it;
    an arriving doc of fresh tokens is untouched. (Under the %10/%50
    id rules no arriving doc can itself be benchmark, so the frozen
    set is complete by construction.)"""
    from kafka_streams_sandbox_spark.streaming.windows import (
        a40_stream_decontaminate,
    )

    passage = [f"bench{i}" for i in range(_B119_N)]  # one 13-gram
    head = ["h0", "h1"]
    rows = [
        (0, " ".join(passage)),  # standing benchmark (0 % 50 == 0)
        (1, "just a standing training doc"),  # standing, non-bench
        (8, " ".join(head + passage)),  # arriving, contaminated
        (18, "fresh tokens only nothing shared"),  # arriving, clean
    ]
    out = {
        r["doc_id"]: r
        for r in a40_stream_decontaminate(
            spark, _write_docs(tmp_path, rows)
        ).collect()
    }
    assert set(out) == {8, 18}  # standing docs are not re-emitted
    assert out[8]["removed_tokens"] == _B119_N
    assert out[8]["clean_text"] == " ".join(head)
    assert out[18]["removed_tokens"] == 0
    assert out[18]["clean_text"] == "fresh tokens only nothing shared"
