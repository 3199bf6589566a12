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


def _collapse_corpus(tmp_path):
    """8-doc corpus with exact-copy groups AND a near-dup: doc 0 with
    exact copies 201/202 (group size 3), doc 1 with exact copy 301
    (size 2), near-copy 100 of doc 0 (j ~ 0.95), unrelated 2/3."""
    rng = random.Random(99)
    base = [" ".join(rng.choice(_VOCAB) for _ in range(80)) for _ in range(4)]
    near = base[0].split()
    near[37] = "zzzzz"
    rows = [
        (0, base[0]), (1, base[1]), (2, base[2]), (3, base[3]),
        (100, " ".join(near)),   # near-copy of 0 (j ~ 0.95)
        (201, base[0]), (202, base[0]),  # exact copies of 0
        (301, base[1]),          # exact copy of 1
    ]
    table = pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows], pa.string()),
            "lang": pa.array(["en"] * len(rows), pa.string()),
            "source": pa.array(["srcC"] * len(rows), pa.string()),
            "n_chars": pa.array([len(r[1]) for r in rows], pa.int64()),
        }
    )
    pq.write_table(table, str(tmp_path / "documents.parquet"))
    return str(tmp_path)


def test_minhash_exact_collapse_semantics(spark, tmp_path):
    """r5 rewrite (VERDICT r4 Next #3): byte-identical docs collapse to
    one representative BEFORE banding. Since r6 the collapse gates on
    corpus row count (fixed cost below _COLLAPSE_MIN_DOCS), so the
    contract forces collapse=True explicitly. Expected:
      - star edges rep->member, jaccard exactly 1.0, weight 1:
        (0,201) (0,202) (1,301) — g-1 edges, never the C(g,2) clique;
      - the near-dup surfaces ONCE at rep level (0,100) with
        pair_weight = |group_0| x |group_100| = 3 x 1;
      - no pair between non-representative copies (201,202), (201,301)."""
    from kafka_streams_sandbox_spark.operators.dedup import _minhash_lsh

    sf_dir = _collapse_corpus(tmp_path)
    got = {
        (r["doc_a"], r["doc_b"]): r
        for r in _minhash_lsh(spark, sf_dir, collapse=True).collect()
    }
    assert set(got) == {(0, 201), (0, 202), (1, 301), (0, 100)}
    for star in [(0, 201), (0, 202), (1, 301)]:
        assert got[star]["jaccard"] == 1.0
        assert got[star]["pair_weight"] == 1
    assert got[(0, 100)]["jaccard"] >= 0.8
    assert got[(0, 100)]["pair_weight"] == 3  # 3 copies of doc 0, 1 of 100


def test_minhash_collapse_gate_and_path_equivalence(spark, tmp_path):
    """r6 (VERDICT r5 Next #6): the registered query gates the
    collapse on the footer row count, so small corpora take the
    direct path — every verified pair explicit, weight 1. The two
    paths express the SAME near-dup relation: their connected
    components must agree, and the direct path must enumerate every
    underlying pair the collapse path aggregates (expanding rep-level
    pairs through group membership)."""
    from kafka_streams_sandbox_spark.operators.dedup import (
        _COLLAPSE_MIN_DOCS,
        _minhash_lsh,
    )

    assert _COLLAPSE_MIN_DOCS > 5000  # sf0.1 and fixtures: direct path
    sf_dir = _collapse_corpus(tmp_path)
    direct = {
        (r["doc_a"], r["doc_b"]): r
        for r in _minhash_lsh(spark, sf_dir, collapse=False).collect()
    }
    # registered query == direct path on a tiny corpus
    auto = {
        (r["doc_a"], r["doc_b"]): r
        for r in b27_minhash_lsh_dedup(spark, sf_dir).collect()
    }
    assert set(auto) == set(direct)
    assert all(r["pair_weight"] == 1 for r in direct.values())
    # direct path enumerates the full expansion: group {0,201,202}
    # internally (C(3,2) = 3 pairs), x100 across (3 pairs), {1,301}
    direct_pairs = set(direct)
    expected = {
        (0, 201), (0, 202), (201, 202),          # group-internal clique
        (0, 100), (100, 201), (100, 202),        # near-dup x each copy
        (1, 301),
    }
    assert direct_pairs == expected
    # connected components agree between the two forms
    collapse_pairs = {
        (r["doc_a"], r["doc_b"])
        for r in _minhash_lsh(spark, sf_dir, collapse=True).collect()
    }
    ids = [0, 1, 2, 3, 100, 201, 202, 301]
    assert _union_find_clusters(ids, collapse_pairs) == _union_find_clusters(
        ids, direct_pairs
    )


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


def _union_find_clusters(n_ids, pairs):
    """Ground-truth connected components (min-id label) in pure Python."""
    parent = {i: i for i in n_ids}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {i: find(i) for i in n_ids}


def test_semantic_dedup_exact_matches_ground_truth(spark, tmp_path):
    """b94 on the planted corpus must equal a pure-Python re-derivation:
    union-find over all >= 0.3-cosine pairs for the clustering, max-norm
    (tie: min id) for the keeper."""
    from kafka_streams_sandbox_spark.operators.dedup import (
        b94_semantic_dedup_exact,
    )

    sf_dir, planted, by_id = _planted_vecs_dir(tmp_path)
    ids = sorted(by_id)
    pairs = [
        (a, b)
        for i, a in enumerate(ids)
        for b in ids[i + 1 :]
        if float(
            by_id[a] @ by_id[b]
            / (np.linalg.norm(by_id[a]) * np.linalg.norm(by_id[b]))
        )
        >= 0.3
    ]
    truth_cluster = _union_find_clusters(ids, pairs)
    norms = {i: float(np.linalg.norm(by_id[i])) for i in ids}
    truth_keep = {}
    for i, c in truth_cluster.items():
        cur = truth_keep.get(c)
        if cur is None or (norms[i], -i) > (norms[cur], -cur):
            truth_keep[c] = i
    rows = b94_semantic_dedup_exact(spark, str(sf_dir)).collect()
    assert len(rows) == len(ids)
    for r in rows:
        assert r["cluster_id"] == truth_cluster[r["vec_id"]], r
        assert r["keep_id"] == truth_keep[r["cluster_id"]], r
        assert r["is_kept"] == (r["vec_id"] == r["keep_id"]), r
    # the planted copies must actually have merged with their bases
    for base_id, copy_id in planted:
        assert truth_cluster[base_id] == truth_cluster[copy_id]


def test_semantic_dedup_scale_path_refines_exact(spark, tmp_path):
    """b93 (bucketed candidates) may only LOSE pairs to bucketing, so
    its clusters must be a refinement of b94's exact clusters — and the
    planted 0.01-noise copies (cos ~0.9999, same bucket with
    near-certainty) must still merge with their bases and lose the
    keeper pick to whichever of the pair has the larger norm."""
    from kafka_streams_sandbox_spark.operators.dedup import (
        b93_semantic_dedup,
        b94_semantic_dedup_exact,
    )

    sf_dir, planted, by_id = _planted_vecs_dir(tmp_path)
    lsh = {r["vec_id"]: r for r in b93_semantic_dedup(spark, str(sf_dir)).collect()}
    exact = {
        r["vec_id"]: r["cluster_id"]
        for r in b94_semantic_dedup_exact(spark, str(sf_dir)).collect()
    }
    assert set(lsh) == set(exact)
    # refinement: two vectors sharing an LSH cluster share the exact one
    by_lsh_cluster: dict = {}
    for vid, r in lsh.items():
        by_lsh_cluster.setdefault(r["cluster_id"], []).append(vid)
    for members in by_lsh_cluster.values():
        assert len({exact[m] for m in members}) == 1, members
    norms = {i: float(np.linalg.norm(v)) for i, v in by_id.items()}
    for base_id, copy_id in planted:
        assert lsh[base_id]["cluster_id"] == lsh[copy_id]["cluster_id"]
        keeper = lsh[base_id]["keep_id"]
        cluster_members = [
            m for m, r in lsh.items() if r["cluster_id"] == lsh[base_id]["cluster_id"]
        ]
        best = max(cluster_members, key=lambda m: (norms[m], -m))
        assert keeper == best
    # exactly one keeper per cluster, flags consistent
    for members in by_lsh_cluster.values():
        kept = [m for m in members if lsh[m]["is_kept"]]
        assert len(kept) == 1


def test_kmeans_ivf_precision_and_planted_recall(spark, tmp_path):
    """b92 (r5): IVF over a LEARNED spherical-k-means quantizer. The
    0.01-noise copies sit ~0.06 degrees from their bases, so after
    Lloyd assignment base and copy land in the same (or, via nprobe=2,
    a probed) cell and must rank mutual top-1; every emitted cosine
    must be numpy-exact (sequential-fold rerank)."""
    from kafka_streams_sandbox_spark.operators.similarity import (
        b92_ann_ivf_kmeans,
    )

    sf_dir, planted, by_id = _planted_vecs_dir(tmp_path)
    rows = b92_ann_ivf_kmeans(spark, sf_dir).collect()
    assert rows
    for r in rows:
        a, b = by_id[r["query_id"]], by_id[r["neighbor_id"]]
        truth = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))
        assert r["cos_sim"] == pytest.approx(truth, abs=1e-9)
    top1 = {r["query_id"]: r["neighbor_id"] for r in rows if r["rnk"] == 1}
    for base_id, copy_id in planted:
        assert top1.get(base_id) == copy_id
        assert top1.get(copy_id) == base_id


def test_kmeans_cell_count_rule():
    """k ~ sqrt(n), floored for degenerate corpora and capped so the
    centroid broadcast stays bounded. r6: the cap no longer implies
    linear per-cell growth — sub_plane_count subdivides past the
    per-task expected-population cap, so the Arrow group a rerank task
    pulls is bounded by construction at any n."""
    from kafka_streams_sandbox_spark.operators.similarity import (
        cell_count,
        plane_count,
        sub_plane_count,
    )

    assert cell_count(0) == 1 and cell_count(1) == 1
    assert cell_count(60) == 8
    assert cell_count(2000) == 45
    assert cell_count(10**9) == 4096  # capped
    # sub-bucket rule: off for every corpus the sqrt rule keeps
    # balanced (fixtures, 100x probe), on past the k-cap knee
    assert sub_plane_count(60, cell_count(60)) == 0
    assert sub_plane_count(200_000, cell_count(200_000)) == 0
    assert sub_plane_count(4096 * 4096, 4096) == 0  # boundary: pop == cap
    assert sub_plane_count(17_000_000, 4096) == 8  # just past the knee
    # 1e9 rows / 4096 cells = 244k expected per cell -> 14 planes
    # (2^14 sub-buckets -> occupancy ~15, the b35 target)
    assert sub_plane_count(10**9, 4096) == plane_count(10**9 // 4096) == 14
    # forced-cap probe geometry: k=16 over the 100x corpus
    assert sub_plane_count(200_000, 16) == 10


def test_kmeans_ivf_forced_cap_trips_sub_buckets(spark, tmp_path):
    """Force the b34 trap shape — tiny k over a corpus whose expected
    cell population exceeds the per-task cap — and the sub-bucket
    guard must engage instead of one giant Arrow group: planted
    0.01-noise copies still collide (scale-invariant sign projection
    over ue) and rank mutual top-1, cosines stay numpy-exact."""
    from kafka_streams_sandbox_spark.operators.similarity import _kmeans_ivf

    sf_dir, planted, by_id = _planted_vecs_dir(tmp_path)
    # 60 vectors, k=1, cap=8 -> expected pop 60 > 8 -> 8 sub-planes
    rows = _kmeans_ivf(spark, sf_dir, k=1, cell_pop_cap=8).collect()
    assert rows
    for r in rows:
        a, b = by_id[r["query_id"]], by_id[r["neighbor_id"]]
        truth = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))
        assert r["cos_sim"] == pytest.approx(truth, abs=1e-9)
    top1 = {r["query_id"]: r["neighbor_id"] for r in rows if r["rnk"] == 1}
    for base_id, copy_id in planted:
        assert top1.get(base_id) == copy_id
        assert top1.get(copy_id) == base_id


def test_plane_count_scales_with_corpus():
    """r5 (VERDICT r4 Next #2): geometry derives from n by default.
    Pins: (a) every driver fixture (40-2000 vectors) stays at the
    8-plane floor, so the planted contracts above and the driver rows
    are unchanged; (b) the r4 100x probe's measured best config —
    14 planes at 200k vectors (52 s vs 947 s fixed) — is exactly what
    the rule produces; (c) the cap bounds signature arithmetic."""
    from kafka_streams_sandbox_spark.operators.similarity import plane_count

    for fixture_n in (40, 60, 500, 2000):
        assert plane_count(fixture_n) == 8
    assert plane_count(20_000) == 10
    assert plane_count(200_000) == 14  # the measured-best 100x config
    assert plane_count(10**12) == 24  # capped
    assert plane_count(0) == 8  # degenerate corpora hit the floor


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


# ---------------------------------------------------------------------------
# b96 n-scaled embedding-LSH near-dup (additive scaled twin of b39_lsh)
# ---------------------------------------------------------------------------


def test_scaled_lsh_neardup_contracts(spark, tmp_path):
    """b96 (r6): precision — every emitted pair must appear in exact
    b39 with a numpy-exact cosine; recall — planted 0.01-noise copies
    survive bucketing; geometry — on fixture corpora plane_count
    resolves to the same 8-plane floor as b39_lsh, so the scaled twin
    must emit EXACTLY the fixed twin's pairs there (they diverge only
    where the fixed config stops scaling — the 100x regime)."""
    from kafka_streams_sandbox_spark.operators.dedup import (
        b39_embedding_neardup,
        b39_lsh_embedding_neardup,
        b96_lsh_embedding_neardup_scaled,
    )

    sf_dir, planted, by_id = _planted_vecs_dir(tmp_path)
    scaled = b96_lsh_embedding_neardup_scaled(spark, sf_dir).collect()
    assert scaled
    for r in scaled:
        a, b = by_id[r["vec_a"]], by_id[r["vec_b"]]
        truth = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))
        assert r["cos_sim"] == pytest.approx(truth, abs=1e-9)
    scaled_pairs = {(r["vec_a"], r["vec_b"]) for r in scaled}
    exact_pairs = {
        (r["vec_a"], r["vec_b"])
        for r in b39_embedding_neardup(spark, sf_dir).collect()
    }
    assert scaled_pairs <= exact_pairs
    for base_id, copy_id in planted:
        assert (base_id, copy_id) in scaled_pairs
    fixed_pairs = {
        (r["vec_a"], r["vec_b"])
        for r in b39_lsh_embedding_neardup(spark, sf_dir).collect()
    }
    assert scaled_pairs == fixed_pairs  # same 8-plane floor at n=60


# ---------------------------------------------------------------------------
# b95 minhash-band blocked fuzzy ER
# ---------------------------------------------------------------------------


def _levenshtein(a: str, b: str) -> int:
    """Unit-cost edit distance (pure-Python twin of both engines)."""
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[-1]


def test_minhash_blocked_fuzzy_match_contracts(spark, tmp_path):
    """b95 (r6): precision — every emitted edit_dist is re-derived in
    pure Python and clears the cap; recall — the planted one-token
    mutations (token 37 of ~80, past the 60-char head => head edit 0,
    full-doc jaccard ~0.95 => band collision near-certain) must all
    surface; separation — unrelated same-vocabulary docs (j ~ 0.1,
    band collision ~1e-8) must not. Deterministic: hash-derived
    permutations, planted corpus pinned exactly."""
    from kafka_streams_sandbox_spark.operators.dedup import (
        b95_fuzzy_match_minhash_blocked,
    )

    sf_dir, planted = _planted_docs_dir(tmp_path)
    texts = {
        r["doc_id"]: r["text"]
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "text")
        .collect()
    }
    got = {
        (r["doc_a"], r["doc_b"]): r["edit_dist"]
        for r in b95_fuzzy_match_minhash_blocked(spark, sf_dir).collect()
    }
    for (a, b), dist in got.items():
        truth = _levenshtein(
            texts[a].strip()[:60], texts[b].strip()[:60]
        )
        assert dist == truth <= 20, (a, b)
    assert set(got) == set(planted)
    assert all(d == 0 for d in got.values())  # heads unchanged by design


def test_incremental_neardup_contracts(spark, tmp_path):
    """b98 (r6): ingest-time near-dup vs the standing corpus.
    Planted verdicts — a one-token mutation of a standing doc is
    flagged with its source, an EXACT copy scores jaccard 1.0, the
    best-match tiebreak picks the min-id of two identical standing
    twins, an unrelated-vocabulary doc and an empty doc both come
    back unique (the empty one with a NULL match, still present:
    every batch doc gets a verdict row). Precision — every emitted
    jaccard is re-derived in pure Python. Split rule: doc_id % 10
    >= 8 is the arriving batch (b68's convention)."""
    from kafka_streams_sandbox_spark.operators.dedup import (
        b98_incremental_neardup,
    )

    rng = random.Random(777)
    base = " ".join(rng.choice(_VOCAB) for _ in range(80))
    others = {
        i: " ".join(rng.choice(_VOCAB) for _ in range(80))
        for i in (1, 2, 3, 4, 5, 6)
    }
    mut = base.split()
    mut[37] = "zzzzz"
    rows = (
        [(i, t) for i, t in others.items()]
        + [(7, base), (17, base)]            # identical standing twins
        + [(18, " ".join(mut))]              # batch: near-copy of 7/17
        + [(28, " ".join("q%d" % k for k in range(80)))]  # batch: unrelated
        + [(38, base)]                       # batch: exact copy
        + [(48, "")]                         # batch: empty text
    )
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
    out = {
        r["doc_id"]: r
        for r in b98_incremental_neardup(spark, str(tmp_path)).collect()
    }
    assert set(out) == {18, 28, 38, 48}  # exactly the batch, each once
    texts = dict(rows)
    for d, r in out.items():
        if r["match_id"] is not None:
            truth = _jaccard(_char5(texts[d]), _char5(texts[r["match_id"]]))
            assert abs(r["jaccard"] - truth) < 1e-12, (d, r)
            assert r["jaccard"] >= 0.8 and r["status"] == "neardup_corpus"
    assert out[18]["match_id"] == 7  # equal jaccard vs 7/17 -> min id
    assert out[38]["match_id"] == 7 and out[38]["jaccard"] == 1.0
    assert out[28]["status"] == "unique" and out[28]["match_id"] is None
    assert out[48]["status"] == "unique" and out[48]["match_id"] is None


def test_incremental_neardup_heterogeneous_oversized_bucket(
    spark, tmp_path, monkeypatch
):
    """b98's r6 recall edge, planted (VERDICT r6 Next #2): an
    OVERSIZED index bucket need not be a homogeneous mass — a band
    collision needs only one matching 8-row minhash slice, so a
    non-discriminative key can co-bucket otherwise-unrelated docs.
    White-box: the banding is monkeypatched to put every doc in ONE
    bucket (the adversarial premise, planted directly rather than
    reverse-engineering xxhash preimages) and _BUCKET_CAP shrunk so
    the 7-doc corpus bucket is oversized.

    Corpus docs 1..7 are mutually unrelated (disjoint vocab,
    asserted j < 0.3); batch doc 98 is an EXACT copy of corpus doc 3,
    batch doc 88 an exact copy of corpus doc 7.

    * r6 semantics (_REP_N=1, min-id rep only): doc 98's only true
      neighbor (3) is dropped from the index; it verifies against
      rep 1 at j < 0.3 and WRONGLY reads "unique".
    * r7 semantics (_REP_N=4 here): reps are the 4 min-id members
      {1,2,3,4}; doc 98 finds 3 at jaccard 1.0. Doc 88's neighbor
      (7) sits PAST the rep bound — still "unique": the documented
      residual caveat (guarded_band_index docstring), pinned here so
      the contract is explicit, not silent."""
    from pyspark.sql import functions as F

    from kafka_streams_sandbox_spark.operators import dedup

    texts = {
        i: " ".join(f"v{i}t{k:02d}" for k in range(40)) for i in range(1, 8)
    }
    rows = [(i, t) for i, t in texts.items()] + [
        (98, texts[3]),
        (88, texts[7]),
    ]
    for a in range(1, 8):
        for b in range(a + 1, 8):
            assert _jaccard(_char5(texts[a]), _char5(texts[b])) < 0.3
    table = pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows], pa.string()),
            "lang": pa.array(["en"] * len(rows), pa.string()),
            "source": pa.array(["srcH"] * len(rows), pa.string()),
            "n_chars": pa.array([len(r[1]) for r in rows], pa.int64()),
        }
    )
    pq.write_table(table, str(tmp_path / "documents.parquet"))

    def flat_banding(docs):
        return docs.select(
            "doc_id",
            F.lit(0).cast("int").alias("band"),
            F.lit(0).cast("long").alias("key"),
        )

    monkeypatch.setattr(dedup, "_minhash_band_keys", flat_banding)
    monkeypatch.setattr(dedup, "_BUCKET_CAP", 4)

    def run():
        return {
            r["doc_id"]: r
            for r in dedup.b98_incremental_neardup(
                spark, str(tmp_path)
            ).collect()
        }

    monkeypatch.setattr(dedup, "_REP_N", 1)  # r6: min-id rep only
    r6 = run()
    assert r6[98]["status"] == "unique"  # the edge: true match dropped
    assert r6[88]["status"] == "unique"

    monkeypatch.setattr(dedup, "_REP_N", 4)  # r7: bounded rep set
    r7 = run()
    assert r7[98]["status"] == "neardup_corpus"
    assert r7[98]["match_id"] == 3 and r7[98]["jaccard"] == 1.0
    # residual caveat: neighbor past the rep bound stays invisible
    assert r7[88]["status"] == "unique" and r7[88]["match_id"] is None


def test_selfseed_neardup_cross_batch_contract(spark, tmp_path):
    """b99 (r7): accepted docs must seed the index for later batches;
    rejected ones must not.

    * corpus doc 7 holds base text B; seq-8 doc 18 is a one-token
      mutation of B -> REJECTED (match 7); seq-8 doc 28 is fresh text
      Y -> ACCEPTED.
    * seq-9 doc 19 mutates Y: b99 must flag it with match 28 — the
      CROSS-BATCH case (b98, run on the same dir, reads it "unique":
      its frozen corpus cannot see doc 28 — asserted here as the gap
      b99 exists to close).
    * seq-9 doc 29 mutates B: its match must be the STANDING keeper 7,
      not the rejected 18 — rejected docs never seed.
    * seq-9 doc 49 is empty -> unique with NULL match (every ingested
      doc gets a verdict row).
    Precision: every emitted jaccard re-derived in pure Python."""
    from kafka_streams_sandbox_spark.operators.dedup import (
        b98_incremental_neardup,
        b99_selfseed_neardup,
    )

    rng = random.Random(9199)
    base = " ".join(rng.choice(_VOCAB) for _ in range(80))
    fresh = " ".join(rng.choice(_VOCAB) for _ in range(80))
    others = {
        i: " ".join(rng.choice(_VOCAB) for _ in range(80)) for i in (1, 2, 3)
    }

    def mutate(text: str, pos: int) -> str:
        toks = text.split()
        toks[pos] = "zzzzz"
        return " ".join(toks)

    rows = (
        [(i, t) for i, t in others.items()]
        + [(7, base)]
        + [(18, mutate(base, 37)), (28, fresh), (8, others[1] + " tail8x")]
        + [(19, mutate(fresh, 23)), (29, mutate(base, 51)), (49, "")]
    )
    table = pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows], pa.string()),
            "lang": pa.array(["en"] * len(rows), pa.string()),
            "source": pa.array(["srcS"] * len(rows), pa.string()),
            "n_chars": pa.array([len(r[1]) for r in rows], pa.int64()),
        }
    )
    pq.write_table(table, str(tmp_path / "documents.parquet"))
    texts = dict(rows)

    out = {
        r["doc_id"]: r
        for r in b99_selfseed_neardup(spark, str(tmp_path)).collect()
    }
    assert set(out) == {18, 28, 8, 19, 29, 49}
    for d, r in out.items():
        assert r["seq"] == d % 10
        if r["match_id"] is not None:
            truth = _jaccard(_char5(texts[d]), _char5(texts[r["match_id"]]))
            assert abs(r["jaccard"] - truth) < 1e-12, (d, r)
            assert r["jaccard"] >= 0.8 and r["status"] == "neardup_corpus"
    assert out[18]["match_id"] == 7  # in-corpus match, rejected
    assert out[28]["status"] == "unique"  # accepted -> seeds the index
    assert out[19]["match_id"] == 28  # CROSS-BATCH: seq 9 sees seq 8
    assert out[29]["match_id"] == 7  # rejected 18 never seeded
    assert out[49]["status"] == "unique" and out[49]["match_id"] is None

    # the contrast b99 exists for: b98's frozen corpus cannot see 28
    b98 = {
        r["doc_id"]: r
        for r in b98_incremental_neardup(spark, str(tmp_path)).collect()
    }
    assert b98[19]["status"] == "unique"


def test_curation_capstone_funnel_contract(spark, tmp_path):
    """b100 (r7, lm stage r8): the composed funnel must equal a
    pure-Python re-derivation of every stage rule on a corpus that
    exercises each drop reason — quality (doc 1, 15 tokens), lm gate
    (doc 11: all-unique bigrams, the gibberish b108 sends to 0.0),
    exact dup (doc 3 = copy of 2), near dup (doc 5 = one-token
    mutation of 4, j ~ 0.95), rewrite re-gate (doc 9 shares a
    20-token passage with the larger keeper 8 and keeps only 5
    tokens), span attrition without a doc drop (doc 7 shares a
    12-token passage with keeper 6, keeps 30). Docs 1-10 carry a
    shared 7-token header: it gives every intended survivor repeated
    (n >= 2) bigram mass so the lm gate separates them from doc 11,
    and at 7 tokens it sits under b97's 8-token span window, so it
    cannot form a duplicated span except where it abuts the planted
    shared passages (6/7 and 8/9 — where its positions join the
    removed span, accounted below). All sources are tier 0 (mixture
    keeps every survivor), so the mixture stage isolates nothing
    here — its rule is b67/b71's, already oracle-certified — while
    train/holdout re-derive the md5 bucket split."""
    import hashlib

    from tests.test_text_kernels import _py_b108

    from kafka_streams_sandbox_spark.operators.pipeline import (
        _B69_MIN_TOKENS,
        _SPLIT_BUCKETS_TRAIN,
        b100_curation_capstone,
    )

    rng = random.Random(100100)

    def words(n, tag):
        return [f"{tag}{rng.randrange(10**6):06d}" for _ in range(n)]

    H = [f"hdr{i}" for i in range(7)]  # shared header (see docstring)
    P = words(12, "p")  # shared passage docs 6/7
    R = words(20, "r")  # shared passage docs 8/9
    t2 = words(40, "a")
    t4 = words(40, "b")
    t5 = list(t4)
    t5[20] = "zzzzz"  # near-dup mutation
    # 12/13: same token SET, every 20-token block different — one swap
    # per block (the doc is H(7)+e(40), so blocks split at body
    # indices 13 and 33) — invisible to b112's paragraph dedup,
    # caught by the fingerprint stage on the REWRITTEN text (graded)
    # and the raw text (flat)
    e = words(40, "e")
    e13 = list(e)
    for a, b in ((0, 1), (13, 14), (33, 34)):
        e13[a], e13[b] = e13[b], e13[a]
    # 14/15: one-CHAR mutation inside each 20-token block — paragraph
    # dedup keeps both whole (every block differs), char-5-gram
    # jaccard stays >= 0.8, so the pair is the graded near-dup plant
    f = words(40, "f")
    f15 = list(f)
    for bodypos in (5, 25, 35):
        f15[bodypos] = f15[bodypos][:-1] + "X"
    texts = {
        1: " ".join(H + words(8, "s")),       # quality fail (15 < 16)
        2: " ".join(H + t2),
        3: " ".join(H + t2),                  # exact dup of 2
        4: " ".join(H + t4),
        5: " ".join(H + t5),                  # near dup of 4
        6: " ".join(H + P + words(30, "u")),  # span keeper
        7: " ".join(H + P + words(30, "v")),  # loses hdr+P, survives
        8: " ".join(H + R + words(30, "w")),  # span keeper
        9: " ".join(H + R + words(5, "x")),   # loses hdr+R, re-gate drop
        10: " ".join(H + words(40, "y")),     # clean survivor
        11: " ".join(words(40, "g")),         # lm-gate fail (no header)
        12: " ".join(H + e),                  # set-twin keeper
        13: " ".join(H + e13),                # same set, drops at exact
        14: " ".join(H + f),                  # near keeper (graded too)
        15: " ".join(H + f15),                # char-level near dup of 14
    }
    table = pa.table(
        {
            "doc_id": pa.array(sorted(texts), pa.int64()),
            "text": pa.array([texts[i] for i in sorted(texts)], pa.string()),
            "lang": pa.array(["en"] * len(texts), pa.string()),
            "source": pa.array(["src0"] * len(texts), pa.string()),
            "n_chars": pa.array(
                [len(texts[i]) for i in sorted(texts)], pa.int64()
            ),
        }
    )
    pq.write_table(table, str(tmp_path / "documents.parquet"))

    # ---- pure-Python twin of every stage rule (flat b100 form) ----
    def grams5(txt):
        return {txt[k : k + 5] for k in range(len(txt) - 4)}

    def near_drops(survivors, text_of):
        """char-5-gram jaccard >= 0.8 pairs -> min-label components ->
        every non-min member drops (b27 verify + b55/b60 rules)."""
        import itertools

        g = {i: grams5(text_of[i]) for i in survivors}
        label = {i: i for i in survivors}
        changed = True
        while changed:
            changed = False
            for i, j in itertools.combinations(sorted(survivors), 2):
                inter = len(g[i] & g[j])
                union = len(g[i] | g[j])
                if union and inter / union >= 0.8:
                    m = min(label[i], label[j])
                    if label[i] != m or label[j] != m:
                        label[i] = label[j] = m
                        changed = True
        return {i for i in survivors if label[i] != i}

    def span_kept(survivors, toks_of, n_of):
        """b97 rule: 8-token windows seen in >= 2 docs elect keeper
        min(doc_id); other docs remove the window positions."""
        span_at = {}
        for i in survivors:
            ts = toks_of[i]
            for p0 in range(len(ts) - 7):
                span_at.setdefault(tuple(ts[p0 : p0 + 8]), []).append(
                    (i, p0)
                )
        removed = {i: set() for i in survivors}
        for occ in span_at.values():
            docs_in = {i for i, _ in occ}
            if len(docs_in) >= 2:
                keeper = min(docs_in)
                for i, p0 in occ:
                    if i != keeper:
                        removed[i].update(range(p0, p0 + 8))
        return {i: n_of[i] - len(removed[i]) for i in survivors}

    ntok = {i: len(t.split()) for i, t in texts.items()}
    toks_all = {i: texts[i].split() for i in texts}
    quality = {i for i in texts if ntok[i] >= _B69_MIN_TOKENS}
    assert quality == set(texts) - {1}  # trigram repetition is 0 here
    # b108's rule via its own Python twin (model over the RAW corpus)
    py108 = _py_b108([texts.get(i, "") for i in range(max(texts) + 1)])
    lm = {i for i in quality if py108[i][2]}
    assert lm == quality - {11}  # header mass passes, gibberish fails
    # 3's and 13's sorted-distinct-token fingerprints match 2's / 12's
    ex = lm - {3, 13}
    near = ex - near_drops(ex, texts)
    assert near == ex - {5, 15}  # the two planted verified pairs
    kept = span_kept(near, toks_all, ntok)
    assert kept[7] == 30 and kept[9] == 5  # planted span attrition
    rw = {i for i in near if kept[i] >= _B69_MIN_TOKENS}
    assert rw == near - {9}
    mix = rw  # tier 0, w = 1.0: ((id % 1000) * 16807) % 1000 < 1000

    def bucket(i):
        return int(hashlib.md5(str(i).encode()).hexdigest()[:2], 16)

    train = {i for i in mix if bucket(i) < _SPLIT_BUCKETS_TRAIN}
    expect = {
        "raw": (len(texts), sum(ntok.values())),
        "quality": (len(quality), sum(ntok[i] for i in quality)),
        "lm_gate": (len(lm), sum(ntok[i] for i in lm)),
        "dedup_exact": (len(ex), sum(ntok[i] for i in ex)),
        "dedup_near": (len(near), sum(ntok[i] for i in near)),
        "rewrite": (len(rw), sum(kept[i] for i in rw)),
        "mixture": (len(mix), sum(kept[i] for i in mix)),
        "train": (len(train), sum(kept[i] for i in train)),
        "holdout": (
            len(mix - train),
            sum(kept[i] for i in mix - train),
        ),
    }
    got = {
        r["stage"]: (r["n_docs"], r["n_tokens"])
        for r in b100_curation_capstone(spark, str(tmp_path)).collect()
    }
    assert got == expect

    # ---- b113 (r9, VERDICT r8 #3/#7): the CCNet-shaped twin —
    # paragraph dedup first, every later stage over the rewritten
    # text, graded mixture — all re-derived in pure Python ----
    from kafka_streams_sandbox_spark.operators.dedup import _B112_P
    from kafka_streams_sandbox_spark.operators.pipeline import (
        _B111_RATE_PERMILLE,
        b113_curation_graded_mixture,
    )

    # b112's rule over quality survivors: keep-first by (doc_id, pos)
    owner = {}
    for i in sorted(quality):
        ts = toks_all[i]
        for p0 in range(0, len(ts), _B112_P):
            owner.setdefault(tuple(ts[p0 : p0 + _B112_P]), (i, p0))
    ptoks = {}
    for i in sorted(quality):
        ts = toks_all[i]
        kept_b = []
        for p0 in range(0, len(ts), _B112_P):
            if owner[tuple(ts[p0 : p0 + _B112_P])] == (i, p0):
                kept_b.extend(ts[p0 : p0 + _B112_P])
        ptoks[i] = kept_b
    ptext = {i: " ".join(ptoks[i]) for i in quality}
    pn = {i: len(ptoks[i]) for i in quality}
    para = {i for i in quality if pn[i] >= _B69_MIN_TOKENS}
    # doc 3 fully owned by 2; doc 9's remnant is 12 tokens < 16
    assert 3 not in para and 9 not in para and pn[3] == 0 and pn[9] == 12
    # doc 5 keeps exactly its mutated middle block
    assert pn[5] == 20
    # the lm model self-trains on the paragraph-deduped corpus
    g_scores, g_avg = _py_b108(
        [ptext.get(i, "") for i in range(max(texts) + 1)], with_avg=True
    )
    g_lm = {i for i in para if g_scores[i][2]}
    assert 11 not in g_lm  # gibberish still lands at 0.0
    # exact dedup over REWRITTEN-text fingerprints: 13's set == 12's
    by_key = {}
    for i in sorted(g_lm):
        by_key.setdefault(tuple(sorted(set(ptoks[i]))), i)
    g_ex = {i for i in g_lm if by_key[tuple(sorted(set(ptoks[i])))] == i}
    assert 13 not in g_ex and 12 in g_ex
    g_near = g_ex - near_drops(g_ex, ptext)
    assert 15 not in g_near and 14 in g_near  # per-block char mutant
    assert 5 in g_near  # para already stripped 5's duplicate mass
    g_kept = span_kept(g_near, ptoks, pn)
    g_rw = {i for i in g_near if g_kept[i] >= _B69_MIN_TOKENS}

    def bkt(i):
        sc = g_scores[i][1]
        if sc >= g_avg:
            return "head"
        return "middle" if 2.0 * sc >= g_avg else "tail"

    def lehmer_keep(i):
        return ((i % 2147483647) * 48271 % 2147483647) % 1000 < (
            _B111_RATE_PERMILLE[bkt(i)]
        )

    g_mix = {i for i in g_rw if lehmer_keep(i)}
    g_train = {i for i in g_mix if bucket(i) < _SPLIT_BUCKETS_TRAIN}
    g_expect = {
        "raw": (len(texts), sum(ntok.values())),
        "quality": (len(quality), sum(ntok[i] for i in quality)),
        "dedup_para": (len(para), sum(pn[i] for i in para)),
        "lm_gate": (len(g_lm), sum(pn[i] for i in g_lm)),
        "dedup_exact": (len(g_ex), sum(pn[i] for i in g_ex)),
        "dedup_near": (len(g_near), sum(pn[i] for i in g_near)),
        "rewrite": (len(g_rw), sum(g_kept[i] for i in g_rw)),
        "mixture": (len(g_mix), sum(g_kept[i] for i in g_mix)),
        "train": (len(g_train), sum(g_kept[i] for i in g_train)),
        "holdout": (
            len(g_mix - g_train),
            sum(g_kept[i] for i in g_mix - g_train),
        ),
    }
    for b in ("head", "middle", "tail"):
        members_in = {i for i in g_rw if bkt(i) == b}
        members_kept = {i for i in g_mix if bkt(i) == b}
        g_expect[f"{b}_in"] = (
            len(members_in),
            sum(g_kept[i] for i in members_in),
        )
        g_expect[f"{b}_kept"] = (
            len(members_kept),
            sum(g_kept[i] for i in members_kept),
        )
    g_got = {
        r["stage"]: (r["n_docs"], r["n_tokens"])
        for r in b113_curation_graded_mixture(
            spark, str(tmp_path)
        ).collect()
    }
    assert g_got == g_expect


def test_exact_substring_run_vs_window_semantics(spark, tmp_path):
    """b101 vs b97 (r7): the planted case where maximal-run keeper
    election and per-window keeper election DIVERGE. Docs 2 and 3
    share a full 16-token run R (plus unique tails); doc 4 contains
    only R's first 8 tokens inside its own context.

    * b97 (window-granular): every duplicated window elects keeper
      min(doc) = 2, so doc 3 loses R AND doc 4 loses its embedded
      8-token slice — the doc-4 removal is the chimera: doc 4 never
      duplicated anything at run granularity.
    * b101 (run-granular): doc 3's maximal run is byte-identical to
      keeper 2's -> removed; doc 4's maximal run (just the 8-token
      slice) has unique content among maximal runs -> KEPT.
    Both engines' totals re-derived from the planted geometry."""
    from kafka_streams_sandbox_spark.operators.dedup import (
        b97_span_removal_rewrite,
        b101_exact_substring_runs,
    )

    rng = random.Random(101101)

    def words(n, tag):
        return [f"{tag}{rng.randrange(10**6):06d}" for _ in range(n)]

    R = words(16, "r")
    texts = {
        2: " ".join(R + words(20, "a")),
        3: " ".join(R + words(20, "b")),
        4: " ".join(R[:8] + words(20, "c")),
    }
    table = pa.table(
        {
            "doc_id": pa.array(sorted(texts), pa.int64()),
            "text": pa.array([texts[i] for i in sorted(texts)], pa.string()),
            "lang": pa.array(["en"] * 3, pa.string()),
            "source": pa.array(["srcR"] * 3, pa.string()),
            "n_chars": pa.array(
                [len(texts[i]) for i in sorted(texts)], pa.int64()
            ),
        }
    )
    pq.write_table(table, str(tmp_path / "documents.parquet"))

    runs = {
        r["doc_id"]: r
        for r in b101_exact_substring_runs(spark, str(tmp_path)).collect()
    }
    wins = {
        r["doc_id"]: r
        for r in b97_span_removal_rewrite(spark, str(tmp_path)).collect()
    }
    # shared behavior: keeper doc 2 intact, doc 3 loses the whole run
    for out in (runs, wins):
        assert out[2]["removed_tokens"] == 0
        assert out[2]["clean_text"] == texts[2]
        assert out[3]["removed_tokens"] == 16
        assert out[3]["clean_text"] == " ".join(texts[3].split()[16:])
    # THE divergence: doc 4's embedded slice
    assert wins[4]["removed_tokens"] == 8  # window-granular chimera
    assert wins[4]["clean_text"] == " ".join(texts[4].split()[8:])
    assert runs[4]["removed_tokens"] == 0  # run content is unique
    assert runs[4]["clean_text"] == texts[4]


# ---------------------------------------------------------------------------
# b104 PQ ANN (product quantization + ADC)
# ---------------------------------------------------------------------------
def test_pq_ann_exact_copy_is_rank_one(spark, tmp_path):
    """An exact duplicate gets identical PQ codes, so ADC gives it the
    query's own reconstruction score — rank 1 in both directions (the
    copy id 120 is itself a query via the %10 rule). This is the
    deterministic contract that stands in for the float-sum oracle a
    learned quantizer can't have."""
    from kafka_streams_sandbox_spark.operators.similarity import b104_pq_ann

    g = np.random.default_rng(11)
    base = g.normal(size=(50, 64)).astype(np.float32)
    ids = list(range(50)) + [120]
    vecs = [v.tolist() for v in base] + [base[0].tolist()]  # 120 == 0
    table = pa.table(
        {
            "vec_id": pa.array(ids, pa.int64()),
            "embedding": pa.array(vecs, pa.list_(pa.float32())),
            "label": pa.array([i % 5 for i in range(len(ids))], pa.int32()),
        }
    )
    pq.write_table(table, str(tmp_path / "embeddings.parquet"))

    out = b104_pq_ann(spark, str(tmp_path)).collect()
    rank1 = {r["query_id"]: r["neighbor_id"] for r in out if r["rnk"] == 1}
    assert rank1[0] == 120
    assert rank1[120] == 0


def test_pq_ann_recall_floor_on_driver_corpus(spark):
    """Measured recall floor at sf0.01 (deterministic: hash-chosen
    training sample, fixed Lloyd, argmin tiebreaks): 8-bit PQ top-10
    must keep >= 0.85 of exact top-1 and >= 0.70 of exact top-3
    (measured 0.96 / 0.86; slack for BLAS build differences)."""
    from kafka_streams_sandbox_spark.operators.similarity import b104_pq_ann

    sf = "/root/testdata/sf0.01"
    t = pq.read_table(f"{sf}/embeddings.parquet").to_pandas()
    emb = np.array(list(t["embedding"]), dtype=np.float64)
    ids = t["vec_id"].to_numpy()
    ue = emb / np.linalg.norm(emb, axis=1, keepdims=True)
    qmask = ids % 10 == 0
    sims = ue[qmask] @ ue.T

    got: dict[int, set[int]] = {}
    for r in b104_pq_ann(spark, sf).collect():
        got.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    rec1 = rec3 = n = 0.0
    for qi, qid in enumerate(ids[qmask]):
        s = sims[qi].copy()
        s[ids == qid] = -9.0
        order = ids[np.argsort(-s)]
        pq10 = got.get(qid, set())
        rec1 += order[0] in pq10
        rec3 += len(set(order[:3]) & pq10) / 3
        n += 1
    assert rec1 / n >= 0.85, rec1 / n
    assert rec3 / n >= 0.70, rec3 / n


def test_pq_ann_survives_hostile_vectors(spark, tmp_path):
    """Degenerate rows (zero/NULL/short/NaN/Inf vectors) must be
    excluded from codebook training, encoding, and the query batch —
    no phantom neighbors, no NaN scores (b104's own column names keep
    it out of the shared hostile sweep)."""
    from kafka_streams_sandbox_spark.operators.similarity import b104_pq_ann

    g = np.random.default_rng(99)
    clean = g.normal(size=(30, 64)).astype(np.float32)
    ids = list(range(30)) + [100, 101, 102, 103, 104]
    vecs = [v.tolist() for v in clean] + [
        [0.0] * 64,
        None,
        [1.0] * 8,
        [float("nan")] + [1.0] * 63,
        [float("inf")] + [1.0] * 63,
    ]
    table = pa.table(
        {
            "vec_id": pa.array(ids, pa.int64()),
            "embedding": pa.array(vecs, pa.list_(pa.float32())),
            "label": pa.array([i % 3 for i in range(len(ids))], pa.int32()),
        }
    )
    pq.write_table(table, str(tmp_path / "embeddings.parquet"))
    rows = b104_pq_ann(spark, str(tmp_path)).collect()
    assert rows
    hostile = {100, 101, 102, 103, 104}
    for r in rows:
        assert r["query_id"] not in hostile, r
        assert r["neighbor_id"] not in hostile, r
        assert r["approx_cos"] is not None and np.isfinite(r["approx_cos"]), r


# ---------------------------------------------------------------------------
# b105 winnowing fingerprints
# ---------------------------------------------------------------------------
_WP = 1_000_000_007
_WB2 = 1_000_003


def _py_winnow_prints(text: str) -> set[int]:
    """Pure-Python twin of b105's print selection (token poly hash ->
    4-gram poly fold -> 4-window minima)."""
    toks = text.split() if text else []
    if not toks:
        return set()
    th = []
    for tok in toks:
        h = 0
        for ch in tok:
            h = (h * 31 + ord(ch)) % _WP
        th.append(h)
    if len(th) < 4:
        g = 0
        for t in th:
            g = (g * _WB2 + t) % _WP
        gh = [g]
    else:
        gh = []
        for i in range(len(th) - 3):
            g = th[i]
            for j in (1, 2, 3):
                g = (g * _WB2 + th[i + j]) % _WP
            gh.append(g)
    if len(gh) < 4:
        return {min(gh)}
    return {min(gh[i : i + 4]) for i in range(len(gh) - 3)}


def test_winnowing_matches_python_twin_and_guarantee(spark, tmp_path):
    """b105's pair set must equal the pure-Python re-derivation
    (prints -> df-capped live set -> >=2 shared) exactly, and the
    winnowing GUARANTEE must hold on a planted 30-token run copied
    between two otherwise-disjoint docs: any shared run of
    >= w + n - 1 tokens yields shared selected prints."""
    from collections import Counter

    from kafka_streams_sandbox_spark.operators.dedup import (
        b105_winnowing_fingerprints,
    )

    run = " ".join(f"run{i}" for i in range(30))
    texts = [
        " ".join(f"aa{i}" for i in range(30)),  # disjoint filler A
        " ".join(f"bb{i}" for i in range(30)),  # disjoint filler B
        " ".join(f"aa{i}" for i in range(30)) + " " + run,  # A + run
        run + " " + " ".join(f"cc{i}" for i in range(30)),  # run + C
        "solo",  # single token -> one print, pairs with nothing
        " ".join(f"aa{i}" for i in range(30)),  # exact dup of doc 0
    ]
    table = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(["en"] * len(texts), pa.string()),
            "source": pa.array(["srcW"] * len(texts), pa.string()),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )
    pq.write_table(table, str(tmp_path / "documents.parquet"))

    prints = {i: _py_winnow_prints(t) for i, t in enumerate(texts)}
    df = Counter(pr for s in prints.values() for pr in s)
    live = {pr for pr, c in df.items() if 2 <= c <= 50}
    expected = {}
    for a in prints:
        for b in prints:
            if a < b:
                shared = len(prints[a] & prints[b] & live)
                if shared >= 2:
                    expected[(a, b)] = shared

    got = {
        (r["doc_a"], r["doc_b"]): r["shared_prints"]
        for r in b105_winnowing_fingerprints(spark, str(tmp_path)).collect()
    }
    assert got == expected
    # the guarantee, concretely: the planted run links 2-3, and the
    # exact dup links 0-5, both through >= 2 shared prints
    assert (2, 3) in got
    assert (0, 5) in got and (0, 2) in got
    assert all(k[0] != 4 and k[1] != 4 for k in got)


def test_winnowing_compresses_the_posting_set():
    """The point of winnowing at 100 TB: selected prints per doc sit
    well under the full gram count (expected density ~2/(w+1) = 0.4
    for random hashes) — pin < 60% on a 200-unique-token doc via the
    twin (the operator explodes exactly these prints)."""
    import random

    rng = random.Random(5)
    toks = [f"w{rng.randrange(10**9)}" for _ in range(200)]
    prints = _py_winnow_prints(" ".join(toks))
    n_grams = 200 - 3
    assert len(prints) < 0.6 * n_grams, (len(prints), n_grams)


# ---------------------------------------------------------------------------
# b106 IVF x PQ
# ---------------------------------------------------------------------------
def test_ivfpq_exact_copy_is_rank_one(spark, tmp_path):
    """An exact duplicate lands in the same coarse cell with the same
    residual, hence identical codes — its ADC score equals the
    query's own reconstruction score, so it ranks 1 in both
    directions (id 120 is itself a query via %10)."""
    from kafka_streams_sandbox_spark.operators.similarity import b106_ivfpq_ann

    g = np.random.default_rng(13)
    base = g.normal(size=(50, 64)).astype(np.float32)
    ids = list(range(50)) + [120]
    vecs = [v.tolist() for v in base] + [base[0].tolist()]
    table = pa.table(
        {
            "vec_id": pa.array(ids, pa.int64()),
            "embedding": pa.array(vecs, pa.list_(pa.float32())),
            "label": pa.array([i % 5 for i in range(len(ids))], pa.int32()),
        }
    )
    pq.write_table(table, str(tmp_path / "embeddings.parquet"))
    out = b106_ivfpq_ann(spark, str(tmp_path)).collect()
    rank1 = {r["query_id"]: r["neighbor_id"] for r in out if r["rnk"] == 1}
    assert rank1[0] == 120
    assert rank1[120] == 0


def test_ivfpq_matches_exact_rerank_recall(spark):
    """The IVFPQ claim: on the driver corpus the 8-bit residual ADC
    loses (near) NOTHING vs b92's exact in-cell rerank — the coarse
    pruning is the whole recall ceiling (measured: both 0.30 recall@3
    of exact top-1 at sf0.01 under nprobe=2). Pin b106 within 0.05 of
    b92 and above an absolute floor."""
    from kafka_streams_sandbox_spark.operators.similarity import (
        b106_ivfpq_ann,
        b92_ann_ivf_kmeans,
    )

    sf = "/root/testdata/sf0.01"
    t = pq.read_table(f"{sf}/embeddings.parquet").to_pandas()
    emb = np.array(list(t["embedding"]), dtype=np.float64)
    ids = t["vec_id"].to_numpy()
    ue = emb / np.linalg.norm(emb, axis=1, keepdims=True)
    qmask = ids % 10 == 0
    qrows = np.flatnonzero(qmask)
    sims = ue[qmask] @ ue.T

    def recall_of(df, query_filter=True):
        got: dict[int, set[int]] = {}
        for r in df.collect():
            if r["query_id"] % 10 == 0:
                got.setdefault(r["query_id"], set()).add(r["neighbor_id"])
        rec = n = 0.0
        for qi, qid in enumerate(ids[qmask]):
            s = sims[qi].copy()
            s[ids == qid] = -9.0
            rec += ids[np.argsort(-s)][0] in got.get(qid, set())
            n += 1
        return rec / n

    r_pq = recall_of(b106_ivfpq_ann(spark, sf))
    r_exact = recall_of(b92_ann_ivf_kmeans(spark, sf))
    assert r_pq >= r_exact - 0.05, (r_pq, r_exact)
    assert r_pq >= 0.2, r_pq


def test_ivfpq_survives_hostile_vectors(spark, tmp_path):
    """Degenerate rows must be excluded from cell training, residual
    codebooks, encoding, and the query batch (b106's approx_cos
    column keeps it out of the shared hostile sweep)."""
    from kafka_streams_sandbox_spark.operators.similarity import b106_ivfpq_ann

    g = np.random.default_rng(99)
    clean = g.normal(size=(30, 64)).astype(np.float32)
    ids = list(range(30)) + [100, 101, 102, 103, 104]
    vecs = [v.tolist() for v in clean] + [
        [0.0] * 64,
        None,
        [1.0] * 8,
        [float("nan")] + [1.0] * 63,
        [float("inf")] + [1.0] * 63,
    ]
    table = pa.table(
        {
            "vec_id": pa.array(ids, pa.int64()),
            "embedding": pa.array(vecs, pa.list_(pa.float32())),
            "label": pa.array([i % 3 for i in range(len(ids))], pa.int32()),
        }
    )
    pq.write_table(table, str(tmp_path / "embeddings.parquet"))
    rows = b106_ivfpq_ann(spark, str(tmp_path)).collect()
    assert rows
    hostile = {100, 101, 102, 103, 104}
    for r in rows:
        assert r["query_id"] not in hostile, r
        assert r["neighbor_id"] not in hostile, r
        assert r["approx_cos"] is not None and np.isfinite(r["approx_cos"]), r


# ---------------------------------------------------------------------------
# b107 containment pairs
# ---------------------------------------------------------------------------
def test_containment_catches_what_jaccard_prunes(spark, tmp_path):
    """The motivating case: a 40-token snippet reproduced inside a
    200-token page. b26's symmetric jaccard deliberately prunes pairs
    whose shingle sets differ >2x in size, so it misses the pair;
    b107 flags it DIRECTIONALLY (snippet contained in page, not the
    reverse). Sub-threshold and tiny-doc cases stay absent."""
    from kafka_streams_sandbox_spark.operators.dedup import (
        b26_ngram_jaccard_pairs,
        b107_containment_pairs,
    )

    page = " ".join(f"pg{i}" for i in range(200))
    snippet = " ".join(f"pg{i}" for i in range(80, 120))  # 40 tokens of it
    texts = [
        page,  # 0: container
        snippet,  # 1: contained (38 shingles, all inside doc 0's 198)
        " ".join(f"zz{i}" for i in range(60)),  # 2: unrelated
        "a b c",  # 3: 1 shingle -> excluded by _B107_MIN_SH
        "a b c d",  # 4: 2 shingles -> still excluded
    ]
    table = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(["en"] * len(texts), pa.string()),
            "source": pa.array(["srcC"] * len(texts), pa.string()),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )
    pq.write_table(table, str(tmp_path / "documents.parquet"))

    got = {
        (r["contained_id"], r["container_id"]): r
        for r in b107_containment_pairs(spark, str(tmp_path)).collect()
    }
    assert (1, 0) in got  # snippet contained in page
    assert got[(1, 0)]["containment"] == 1.0
    assert got[(1, 0)]["n_common"] == 38
    assert (0, 1) not in got  # the page is NOT contained in the snippet
    assert all(3 not in k and 4 not in k for k in got)  # tiny docs out
    # and b26 misses the pair entirely (size-ratio prune: 198 vs 38)
    jac = {
        (r["doc_a"], r["doc_b"])
        for r in b26_ngram_jaccard_pairs(spark, str(tmp_path)).collect()
    }
    assert (0, 1) not in jac and (1, 0) not in jac


def test_containment_on_hostile_docs(spark, tmp_path):
    """b107's own column names keep it out of the shared neardup
    hostile sweep; same contract: the exact-dup pair appears (both
    directions — containment is directional), degenerate docs never
    pair (token-less docs have no shingles; 1-2-shingle docs are
    excluded as vacuous)."""
    from tests.test_hostile_inputs import _DOCS

    from kafka_streams_sandbox_spark.operators.dedup import (
        b107_containment_pairs,
    )

    table = pa.table(
        {
            "doc_id": pa.array([d[0] for d in _DOCS], pa.int64()),
            "text": pa.array([d[1] for d in _DOCS], pa.string()),
            "lang": pa.array(["en"] * len(_DOCS), pa.string()),
            "source": pa.array(["srcH"] * len(_DOCS), pa.string()),
            "n_chars": pa.array(
                [len(d[1]) if d[1] is not None else 0 for d in _DOCS],
                pa.int64(),
            ),
        }
    )
    pq.write_table(table, str(tmp_path / "documents.parquet"))
    pairs = {
        (r["contained_id"], r["container_id"])
        for r in b107_containment_pairs(spark, str(tmp_path)).collect()
    }
    assert pairs == {(8, 9), (9, 8)}


def test_ann_query_batch_bound(spark, monkeypatch):
    """b44/b104/b106 must answer a BOUNDED, deterministic query batch
    (r8, VERDICT r7 #2): the % 10 workload query set is TH(n), so the
    broadcast paths cap it at _ANN_QBATCH via a hash-ordered limit.
    Forcing the cap below the sf0.001 set (50 queries) must yield
    exactly cap-many distinct query_ids — the same hash-chosen ids on
    a re-run (determinism), and a subset of the uncapped workload set.
    b33 stays uncapped by design: it is the quarantined exact-oracle
    anchor whose DuckDB twin defines the workload."""
    from kafka_streams_sandbox_spark.operators import extended, similarity

    sf = "/root/testdata/sf0.001"
    monkeypatch.setattr(similarity, "_ANN_QBATCH", 7)
    for fn in (
        similarity.b104_pq_ann,
        similarity.b106_ivfpq_ann,
        extended.b44_cosine_topk_arrow,
    ):
        ids1 = {
            r["query_id"]
            for r in fn(spark, sf).select("query_id").distinct().collect()
        }
        ids2 = {
            r["query_id"]
            for r in fn(spark, sf).select("query_id").distinct().collect()
        }
        assert len(ids1) == 7, fn.__name__
        assert ids1 == ids2, f"{fn.__name__}: non-deterministic batch"
        assert all(q % 10 == 0 for q in ids1), fn.__name__
    # the cap must not be SILENT (r9, ADVICE r8): every forced-cap run
    # above records its truncation in the observable audit dict
    assert all(
        similarity.ANN_QBATCH_TRUNCATED[n]
        for n in ("b104_pq_ann", "b106_ivfpq_ann", "b44_cosine_topk_arrow")
    )
    # and an uncapped run (sf0.001's 50 queries fit any real cap)
    # clears the flag — capped and complete runs are distinguishable
    monkeypatch.setattr(similarity, "_ANN_QBATCH", 4096)
    extended.b44_cosine_topk_arrow(spark, sf).count()
    assert not similarity.ANN_QBATCH_TRUNCATED["b44_cosine_topk_arrow"]


def test_winnowing_coverage_aggregates_pair_set(spark):
    """b109 (r8, VERDICT r7 #6): the coverage rows must be exactly
    the per-doc aggregate of b105's pair set — same df guard, same
    print arithmetic — so the output-bounded scale form and the
    oracle-anchored pair form cannot drift. Recomputed here from
    b105's own output (a third derivation, independent of the shared
    plan lineage)."""
    from collections import defaultdict

    from kafka_streams_sandbox_spark.operators.dedup import (
        b105_winnowing_fingerprints,
        b109_winnowing_coverage,
    )

    sf = "/root/testdata/sf0.001"
    agg: dict[int, list[int]] = defaultdict(list)
    for r in b105_winnowing_fingerprints(spark, sf).collect():
        agg[r["doc_a"]].append(r["shared_prints"])
        agg[r["doc_b"]].append(r["shared_prints"])
    want = {
        d: (len(v), max(v), sum(v)) for d, v in agg.items()
    }
    got = {
        r["doc_id"]: (r["n_partners"], r["max_shared"], r["shared_print_mass"])
        for r in b109_winnowing_coverage(spark, sf).collect()
    }
    assert got == want and got


def test_lsh_components_recover_oversized_bucket_membership(spark, tmp_path):
    """b96 + b110 (r8, VERDICT r7 #5): past _BUCKET_CAP a bucket emits
    only STAR pairs (bucket-min -> member) — so a planted
    600-identical-vector mass (> the 512 cap; identical vectors share
    every signature, so the star guard MUST engage) yields exactly
    mass-1 edges from b96 instead of the C(600,2) ~ 180k clique. The
    closure claim: connected components over those star edges recover
    FULL membership — b110 must put all 600 in one cluster labeled by
    the min id. Background vectors are random (no accidental >= 0.92
    cosine at 64 dims) and must stay out of that cluster."""
    g = np.random.default_rng(110)
    n_mass, n_bg = 600, 50
    mass_vec = g.normal(size=64)
    bg = g.normal(size=(n_bg, 64))
    vecs = np.concatenate([np.tile(mass_vec, (n_mass, 1)), bg]).astype(
        np.float32
    )
    ids = list(range(1000, 1000 + n_mass)) + list(range(n_bg))
    table = pa.table(
        {
            "vec_id": pa.array(ids, pa.int64()),
            "embedding": pa.array(
                [v.tolist() for v in vecs], pa.list_(pa.float32())
            ),
            "label": pa.array([0] * len(ids), pa.int32()),
        }
    )
    pq.write_table(table, str(tmp_path / "embeddings.parquet"))
    from kafka_streams_sandbox_spark.operators.dedup import (
        b96_lsh_embedding_neardup_scaled,
        b110_lsh_neardup_components,
    )

    mass_ids = set(range(1000, 1000 + n_mass))
    pairs = [
        (r["vec_a"], r["vec_b"])
        for r in b96_lsh_embedding_neardup_scaled(spark, str(tmp_path)).collect()
    ]
    mass_pairs = [
        (a, b) for a, b in pairs if a in mass_ids or b in mass_ids
    ]
    # star guard engaged: linear evidence, all anchored at the min id
    assert len(mass_pairs) == n_mass - 1
    assert all(a == 1000 for a, _b in mass_pairs)
    clusters = {
        r["vec_id"]: r["cluster_id"]
        for r in b110_lsh_neardup_components(spark, str(tmp_path)).collect()
    }
    assert {clusters[i] for i in mass_ids} == {1000}  # full membership
    assert all(
        c == 1000 or v not in mass_ids for v, c in clusters.items()
    )


def test_ann_drain_chunk_invariance_and_b104_parity(spark, monkeypatch):
    """b114 (r9, VERDICT r8 #6): the full-set drain must (a) answer
    EVERY % 10 query, (b) produce results independent of how the
    query set is cut into pages — forcing _ANN_QBATCH to 7 makes the
    sf0.001 drain run ~8 pages, and the result set must be
    bit-identical to the single-page run (the a28 duality discipline
    applied to ANN), and (c) agree with b104 row-for-row on the batch
    b104 answers (the shared pq_adc_topk kernel, frozen books/codes).
    """
    from kafka_streams_sandbox_spark.operators import similarity

    sf = "/root/testdata/sf0.001"
    n_queries = (
        spark.read.parquet(f"{sf}/embeddings.parquet")
        .filter("vec_id % 10 = 0")
        .count()
    )
    full = {
        tuple(r) for r in similarity.b114_ann_drain(spark, sf).collect()
    }
    assert len({q for q, *_ in full}) == n_queries
    b104 = {tuple(r) for r in similarity.b104_pq_ann(spark, sf).collect()}
    assert b104 == full  # sf0.001's 50 queries fit one b104 batch
    monkeypatch.setattr(similarity, "_ANN_QBATCH", 7)
    chunked = {
        tuple(r) for r in similarity.b114_ann_drain(spark, sf).collect()
    }
    assert chunked == full


def test_ann_drain_kill_and_resume(spark, monkeypatch, tmp_path):
    """b114 restartability contract (r10, VERDICT r9 #6): run the
    drain's first 2 pages against an external out_dir, DROP the loop
    (max_pages kill switch — the caller process dying between jobs),
    then re-invoke against the same directory. The resume must (a)
    recover its cursor from the committed page subpaths alone (no
    in-memory state survives), (b) not re-answer drained queries
    (page numbering continues), and (c) finish with results
    bit-identical to a single-shot drain. Also pins the recovery
    rule's _SUCCESS discipline: a torn page (marker removed) is
    invisible to recovery and gets re-run."""
    import os
    import shutil

    from kafka_streams_sandbox_spark.operators import similarity

    sf = "/root/testdata/sf0.001"
    monkeypatch.setattr(similarity, "_ANN_QBATCH", 7)  # ~8 pages
    full = {
        tuple(r) for r in similarity.pq_ann_drain(spark, sf).collect()
    }
    out = str(tmp_path / "drain")
    first = similarity.pq_ann_drain(spark, sf, out_dir=out, max_pages=2)
    first.collect()  # pages 0-1 committed, loop dropped
    committed = sorted(os.listdir(out))
    assert committed == ["page=0", "page=1"]
    # torn third page: data present, no _SUCCESS — must be invisible
    shutil.copytree(f"{out}/page=1", f"{out}/page=2")
    os.remove(f"{out}/page=2/_SUCCESS")
    page_no, cursor = similarity._drain_recover_cursor(out)
    assert page_no == 2 and cursor is not None
    resumed_rows = similarity.pq_ann_drain(spark, sf, out_dir=out).collect()
    assert {tuple(r) for r in resumed_rows} == full
    # resumed pages continued the numbering; the torn page was re-run
    # in place (overwritten with a _SUCCESS marker this time)
    assert os.path.exists(f"{out}/page=2/_SUCCESS")
    # no query answered twice across the union of committed pages:
    # row COUNT (not set) equals queries x topk — a re-answered page
    # would duplicate rows that a set comparison silently absorbs
    assert len(resumed_rows) == len({q for q, *_ in full}) * similarity._PQ_TOPK
