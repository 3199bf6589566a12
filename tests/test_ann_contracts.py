"""Semantic contracts for the rows-only near-dup / ANN family.

b27 (MinHash-LSH), b28 (SimHash), b35 (sign-projection LSH-ANN) carry
rows-only driver checks because banding recall is probabilistic and
engine-specific (SURVEY.md §2.C). These tests pin their semantics the
way the streaming twins got duality asserts:

* precision — every emitted value is re-derived OUTSIDE the plan
  (pure-Python set Jaccard, numpy cosine) and must match exactly;
* recall — a planted-duplicate corpus is recovered. All three plans
  hash-derive their permutations/planes (no RNG state), so results on
  a fixed corpus are bit-stable and the pinned counts are exact, not
  flaky expectations.
"""

from __future__ import annotations

import random

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from kafka_streams_sandbox_spark.operators.dedup import (
    b27_minhash_lsh_dedup,
    b28_simhash_dedup,
)
from kafka_streams_sandbox_spark.operators.similarity import (
    b35_ann_random_projection,
)

SF_SMALL = "/root/testdata/sf0.001"


def _char5(text: str) -> set[str]:
    """Python twin of char_ngrams_hashed_expr(5) (pre-hash string form)."""
    if len(text) < 5:
        return {text}
    return {text[i : i + 5] for i in range(len(text) - 4)}


def _jaccard(a: set, b: set) -> float:
    inter = len(a & b)
    return inter / (len(a) + len(b) - inter)


# ---------------------------------------------------------------------------
# planted corpora (deterministic)
# ---------------------------------------------------------------------------

_VOCAB = [f"w{i:03d}" for i in range(200)]


def _planted_docs_dir(tmp_path) -> tuple[str, list[tuple[int, int]]]:
    """30 base docs + 15 near-copies (ONE token of ~80 changed =>
    char-5-gram jaccard ~0.95). Returns (sf_dir, planted_pairs)."""
    rng = random.Random(4242)
    base = [
        " ".join(rng.choice(_VOCAB) for _ in range(80)) for _ in range(30)
    ]
    rows = [(i, base[i]) for i in range(30)]
    planted = []
    for j in range(15):
        toks = base[j].split()
        toks[37] = "zzzzz"
        rows.append((100 + j, " ".join(toks)))
        planted.append((j, 100 + j))
    table = pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows], pa.string()),
            "lang": pa.array(["en"] * len(rows), pa.string()),
            "source": pa.array(["srcT"] * len(rows), pa.string()),
            "n_chars": pa.array([len(r[1]) for r in rows], pa.int64()),
        }
    )
    pq.write_table(table, str(tmp_path / "documents.parquet"))
    return str(tmp_path), planted


def _planted_vecs_dir(tmp_path) -> tuple[str, list[tuple[int, int]], np.ndarray]:
    """40 base vectors + 20 near-copies (cos ~0.9999). vec ids: base
    0..39, copy of i is 100+i for i<20."""
    g = np.random.default_rng(7)
    base = g.normal(size=(40, 64))
    copies = base[:20] + 0.01 * g.normal(size=(20, 64))
    vecs = np.concatenate([base, copies]).astype(np.float32)
    ids = list(range(40)) + [100 + i for i in range(20)]
    table = pa.table(
        {
            "vec_id": pa.array(ids, pa.int64()),
            "embedding": pa.array(
                [v.tolist() for v in vecs], pa.list_(pa.float32())
            ),
            "label": pa.array([i % 5 for i in range(60)], pa.int32()),
        }
    )
    pq.write_table(table, str(tmp_path / "embeddings.parquet"))
    planted = [(i, 100 + i) for i in range(20)]
    by_id = dict(zip(ids, vecs.astype(np.float64)))
    return str(tmp_path), planted, by_id


# ---------------------------------------------------------------------------
# b27 MinHash-LSH
# ---------------------------------------------------------------------------


def test_minhash_precision_on_driver_corpus(spark):
    """Every pair b27 emits on the real sf0.001 corpus must carry the
    exact char-5-gram Jaccard (re-derived in pure Python) and clear
    the 0.8 threshold — certifies the whole verify stage
    (tokenization, hashing, set math) end-to-end."""
    got = b27_minhash_lsh_dedup(spark, SF_SMALL).collect()
    assert got, "sf0.001 corpus is known to contain near-dup pairs"
    texts = {
        r["doc_id"]: r["text"]
        for r in spark.read.parquet(f"{SF_SMALL}/documents.parquet")
        .select("doc_id", "text")
        .collect()
    }
    for row in got:
        truth = _jaccard(_char5(texts[row["doc_a"]]), _char5(texts[row["doc_b"]]))
        assert truth >= 0.8
        assert row["jaccard"] == pytest.approx(truth, abs=1e-12)


def test_minhash_recall_on_planted_corpus(spark, tmp_path):
    """All 15 planted j~0.95 copies must surface. At j=0.95 a 4x8
    banding catches a pair w.p. 1-(1-0.95^8)^4 ~ 0.99 per pair — and
    the hash-derived permutations make the outcome deterministic:
    measured 15/15 on this corpus, pinned exactly. No false planted
    positives either: every emitted pair is exact-verified >= 0.8 and
    unrelated same-vocab docs sit near j~0.1."""
    sf_dir, planted = _planted_docs_dir(tmp_path)
    got = {
        (r["doc_a"], r["doc_b"])
        for r in b27_minhash_lsh_dedup(spark, sf_dir).collect()
    }
    assert set(planted) <= got
    assert got == set(planted)  # nothing else clears 0.8 on this corpus


# ---------------------------------------------------------------------------
# b28 SimHash
# ---------------------------------------------------------------------------


def test_simhash_recall_and_separation_on_planted_corpus(spark, tmp_path):
    """One changed token flips few simhash bits: every planted copy
    must land within hamming <= 8 of its base, and no unrelated pair
    (token jaccard ~0.2 from the shared vocab) may sneak in."""
    sf_dir, planted = _planted_docs_dir(tmp_path)
    got = {
        (r["doc_a"], r["doc_b"]): r["hamming"]
        for r in b28_simhash_dedup(spark, sf_dir).collect()
    }
    assert set(planted) <= set(got)
    assert set(got) == set(planted)
    assert all(h <= 8 for h in got.values())


# ---------------------------------------------------------------------------
# b35 sign-random-projection ANN
# ---------------------------------------------------------------------------


def test_lsh_ann_precision_and_recall_on_planted_vectors(spark, tmp_path):
    """Precision: every emitted cos_sim must equal the numpy cosine of
    that pair. Recall: a 0.01-noise copy is ~0.06 degrees from its
    base, so a sign flip on any of the 8 hash-derived planes is
    vanishingly unlikely — every planted pair shares a bucket and,
    at cos ~0.9999 against random (~N(0, 1/8)) alternatives, must
    rank as its twin's #1 neighbor."""
    sf_dir, planted, by_id = _planted_vecs_dir(tmp_path)
    rows = b35_ann_random_projection(spark, sf_dir).collect()
    assert rows
    for r in rows:
        a, b = by_id[r["query_id"]], by_id[r["neighbor_id"]]
        truth = float(
            a @ b / (np.linalg.norm(a) * np.linalg.norm(b))
        )
        assert r["cos_sim"] == pytest.approx(truth, abs=1e-9)
    top1 = {
        r["query_id"]: r["neighbor_id"] for r in rows if r["rnk"] == 1
    }
    for base_id, copy_id in planted:
        assert top1.get(base_id) == copy_id
        assert top1.get(copy_id) == base_id


# ---------------------------------------------------------------------------
# b44 Arrow kernel vs b33 JVM-fold duality
# ---------------------------------------------------------------------------


def test_arrow_topk_matches_exact_topk(spark):
    """b44 is rows-only because BLAS summation order keeps its doubles
    off the DuckDB hash — but its RESULTS must equal oracle-verified
    b33 exactly: same (query, neighbor, rank) triples on the driver
    corpus, cosines within float-reassociation distance."""
    from kafka_streams_sandbox_spark.operators.extended import (
        b44_cosine_topk_arrow,
    )
    from kafka_streams_sandbox_spark.operators.similarity import b33_cosine_topk

    exact = {
        (r["query_id"], r["rnk"]): (r["neighbor_id"], r["cos_sim"])
        for r in b33_cosine_topk(spark, SF_SMALL).collect()
    }
    arrow = {
        (r["query_id"], r["rnk"]): (r["neighbor_id"], r["cos_sim"])
        for r in b44_cosine_topk_arrow(spark, SF_SMALL).collect()
    }
    assert exact.keys() == arrow.keys()
    for key, (nbr, cos) in exact.items():
        a_nbr, a_cos = arrow[key]
        assert a_nbr == nbr, key
        assert a_cos == pytest.approx(cos, abs=1e-9)


# ---------------------------------------------------------------------------
# b39_lsh candidate-fed near-dup vs its exact oracle twin
# ---------------------------------------------------------------------------


def test_lsh_neardup_precision_subset_and_planted_recall(spark, tmp_path):
    """The scale path may only LOSE pairs to bucketing, never invent
    or mis-score them: emitted pairs must be a subset of the exact
    twin's output with numpy-exact cosines, and the planted 0.01-noise
    copies (cos ~0.9999 — a plane sign flip is vanishingly unlikely)
    must all survive bucketing."""
    from kafka_streams_sandbox_spark.operators.dedup import (
        b39_embedding_neardup,
        b39_lsh_embedding_neardup,
    )

    sf_dir, planted, by_id = _planted_vecs_dir(tmp_path)
    lsh = b39_lsh_embedding_neardup(spark, sf_dir).collect()
    assert lsh
    for r in lsh:
        a, b = by_id[r["vec_a"]], by_id[r["vec_b"]]
        truth = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))
        assert r["cos_sim"] == pytest.approx(truth, abs=1e-9)
    exact_pairs = {
        (r["vec_a"], r["vec_b"])
        for r in b39_embedding_neardup(spark, sf_dir).collect()
    }
    lsh_pairs = {(r["vec_a"], r["vec_b"]) for r in lsh}
    assert lsh_pairs <= exact_pairs
    for base_id, copy_id in planted:
        assert (base_id, copy_id) in lsh_pairs


# ---------------------------------------------------------------------------
# b91 scaled-cells IVF (label x hash sub-bucket)
# ---------------------------------------------------------------------------


def test_scaled_ivf_precision_and_planted_recall(spark, tmp_path):
    """b91 = b34's cell join with the 256-way hash subdivision. The
    fixture's copies share their base's label (40 = 0 mod 5) and a
    0.01-noise copy shares the hash bucket (b35's argument), so every
    planted pair must survive the finer cells and rank mutual top-1;
    every emitted cosine must be numpy-exact."""
    from kafka_streams_sandbox_spark.operators.similarity import (
        b91_ann_ivf_scaled_cells,
    )

    sf_dir, planted, by_id = _planted_vecs_dir(tmp_path)
    rows = b91_ann_ivf_scaled_cells(spark, sf_dir).collect()
    assert rows
    for r in rows:
        a, b = by_id[r["query_id"]], by_id[r["neighbor_id"]]
        truth = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))
        assert r["cos_sim"] == pytest.approx(truth, abs=1e-9)
    top1 = {r["query_id"]: r["neighbor_id"] for r in rows if r["rnk"] == 1}
    for base_id, copy_id in planted:
        assert top1.get(base_id) == copy_id
        assert top1.get(copy_id) == base_id
