"""Hostile-input robustness for the embeddings-reading family.

A 100 TB embedding table will contain all-zero vectors (dead encoder
outputs), NULL rows (failed upstream decode), and mis-dimensioned
arrays (schema drift). The similarity family must neither crash nor
emit phantom neighbors for them.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from kafka_streams_sandbox_spark.operators.similarity import (
    b33_cosine_topk,
    b34_ann_ivf_label,
    b35_ann_random_projection,
    b91_ann_ivf_scaled_cells,
    b92_ann_ivf_kmeans,
)

_DIM = 64


@pytest.fixture(scope="module")
def hostile_vec_dir(tmp_path_factory) -> str:
    g = np.random.default_rng(99)
    clean = g.normal(size=(30, _DIM)).astype(np.float32)
    vecs: list = [v.tolist() for v in clean]
    ids = list(range(30))
    # vec_id 100: all-zero vector (norm 0)
    ids.append(100)
    vecs.append([0.0] * _DIM)
    # vec_id 101: NULL embedding
    ids.append(101)
    vecs.append(None)
    # vec_id 102: wrong dimension (8 instead of 64)
    ids.append(102)
    vecs.append([1.0] * 8)
    # vec_id 103: NaN component — norm NaN, and NaN sorts ABOVE every
    # double in Spark, so an unguarded plan ranks it as the #1
    # phantom neighbor of every bucket mate
    ids.append(103)
    vecs.append([float("nan")] + [1.0] * (_DIM - 1))
    # vec_id 104: Inf component — norm Inf, cosine Inf/Inf = NaN
    ids.append(104)
    vecs.append([float("inf")] + [1.0] * (_DIM - 1))
    tmp = tmp_path_factory.mktemp("hostile_vec")
    table = pa.table(
        {
            "vec_id": pa.array(ids, pa.int64()),
            "embedding": pa.array(vecs, pa.list_(pa.float32())),
            "label": pa.array([i % 3 for i in range(len(ids))], pa.int32()),
        }
    )
    pq.write_table(table, str(tmp / "embeddings.parquet"))
    # matching documents table (doc_id == vec_id) so doc-joining
    # embedding consumers (b81) run on the same hostile corpus
    docs = pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "text": pa.array([f"doc {i}" for i in ids], pa.string()),
            "lang": pa.array(
                [["en", "de", "fr"][i % 3] for i in range(len(ids))],
                pa.string(),
            ),
            "source": pa.array(["srcV"] * len(ids), pa.string()),
            "n_chars": pa.array([5] * len(ids), pa.int64()),
        }
    )
    pq.write_table(docs, str(tmp / "documents.parquet"))
    return str(tmp)


@pytest.mark.parametrize(
    "fn",
    [
        b33_cosine_topk,
        b34_ann_ivf_label,
        b35_ann_random_projection,
        b92_ann_ivf_kmeans,  # degenerate rows must not seed/skew centroids
    ],
    ids=lambda f: f.__name__,
)
def test_similarity_family_survives_hostile_vectors(spark, hostile_vec_dir, fn):
    rows = fn(spark, hostile_vec_dir).collect()
    assert rows
    hostile_ids = {100, 101, 102, 103, 104}
    for r in rows:
        # degenerate vectors are neither queries nor neighbors, and no
        # NaN/NULL similarity leaks into the ranking
        assert r["query_id"] not in hostile_ids, r
        assert r["neighbor_id"] not in hostile_ids, r
        assert r["cos_sim"] is not None and not np.isnan(r["cos_sim"]), r


def test_scaled_ivf_survives_hostile_vectors(spark, hostile_vec_dir):
    """b91 subdivides each label into 256 hash cells, so on this
    ~20-vector fixture most cells hold a single vector and an EMPTY
    result is legitimate (bucket geometry is sized for large corpora
    — the sf0.01 corpus yields rows). The hostile guarantee is only
    that degenerate vectors never appear and no NaN leaks."""
    rows = b91_ann_ivf_scaled_cells(spark, hostile_vec_dir).collect()
    hostile_ids = {100, 101, 102, 103, 104}
    for r in rows:
        assert r["query_id"] not in hostile_ids, r
        assert r["neighbor_id"] not in hostile_ids, r
        assert r["cos_sim"] is not None and not np.isnan(r["cos_sim"]), r


def test_arrow_topk_survives_hostile_vectors(spark, hostile_vec_dir):
    from kafka_streams_sandbox_spark.operators.extended import (
        b44_cosine_topk_arrow,
    )

    rows = b44_cosine_topk_arrow(spark, hostile_vec_dir).collect()
    assert rows
    hostile_ids = {100, 101, 102, 103, 104}
    for r in rows:
        assert r["query_id"] not in hostile_ids, r
        assert r["neighbor_id"] not in hostile_ids, r
        assert r["cos_sim"] is not None and not np.isnan(r["cos_sim"]), r


def test_lang_centroid_outliers_survive_hostile_vectors(spark, hostile_vec_dir):
    """b81: degenerate vectors must neither poison the language
    centroids nor claim the top-of-queue outlier slots with NULL
    cos_sim (Spark sorts NULLs first under ASC ordering)."""
    from kafka_streams_sandbox_spark.operators.curation import (
        b81_lang_centroid_outliers,
    )

    rows = b81_lang_centroid_outliers(spark, hostile_vec_dir).collect()
    assert rows
    hostile_ids = {100, 101, 102, 103, 104}
    for r in rows:
        assert r["doc_id"] not in hostile_ids, r
        assert r["cos_sim"] is not None and not np.isnan(r["cos_sim"]), r


def test_embedding_neardup_survives_hostile_vectors(spark, hostile_vec_dir):
    from kafka_streams_sandbox_spark.operators.dedup import (
        b39_embedding_neardup,
        b39_lsh_embedding_neardup,
        b96_lsh_embedding_neardup_scaled,
    )

    hostile_ids = {100, 101, 102, 103, 104}
    for fn in (
        b39_embedding_neardup,
        b39_lsh_embedding_neardup,
        b96_lsh_embedding_neardup_scaled,  # r6 scaled twin, same guards
    ):
        for r in fn(spark, hostile_vec_dir).collect():
            assert r["vec_a"] not in hostile_ids, (fn.__name__, r)
            assert r["vec_b"] not in hostile_ids, (fn.__name__, r)
            assert r["cos_sim"] is not None and not np.isnan(r["cos_sim"])


def test_semantic_dedup_survives_identical_embedding_mass(spark, tmp_path):
    """r6 (VERDICT r5 Next #1): a mass of IDENTICAL embeddings defeats
    plane scaling — they share every signature bit at any plane count,
    so without the oversized-bucket star guard the candidate stage
    materializes a C(g,2) clique inside one collect_list agg-buffer
    row (the pattern that OOMed b28's first 100x probe). Plant a mass
    comfortably past _BUCKET_CAP (600 > 512): the guard must emit g-1
    star candidates, the exact-cosine verify passes them (cos exactly
    1.0), and the component loop must still produce ONE cluster
    holding the whole mass with the min-id member as keeper (all
    norms identical -> vec_id ASC tiebreak)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from kafka_streams_sandbox_spark.operators.dedup import (
        _BUCKET_CAP,
        b93_semantic_dedup,
    )

    g = np.random.default_rng(1234)
    mass_n = _BUCKET_CAP + 88  # 600: one bucket, guard must trip
    mass_vec = g.normal(size=_DIM).astype(np.float32)
    base = g.normal(size=(40, _DIM)).astype(np.float32)
    ids = list(range(1000, 1000 + mass_n)) + list(range(40))
    vecs = [mass_vec.tolist()] * mass_n + [v.tolist() for v in base]
    table = pa.table(
        {
            "vec_id": pa.array(ids, pa.int64()),
            "embedding": pa.array(vecs, pa.list_(pa.float32())),
            "label": pa.array([i % 5 for i in range(len(ids))], pa.int32()),
        }
    )
    pq.write_table(table, str(tmp_path / "embeddings.parquet"))
    rows = {r["vec_id"]: r for r in b93_semantic_dedup(spark, str(tmp_path)).collect()}
    assert len(rows) == len(ids)  # every vector exactly once
    mass_ids = set(range(1000, 1000 + mass_n))
    mass_clusters = {rows[i]["cluster_id"] for i in mass_ids}
    assert len(mass_clusters) == 1  # stars + CC reconnect the mass
    keeper = {rows[i]["keep_id"] for i in mass_ids}
    assert keeper == {min(mass_ids)}  # equal norms -> min-id keeper
    kept = [i for i in mass_ids if rows[i]["is_kept"]]
    assert kept == [min(mass_ids)]


def test_semantic_dedup_survives_hostile_vectors(spark, hostile_vec_dir):
    """b93/b94: degenerate vectors are excluded entirely (never
    clustered, never keepers); every clean vector appears exactly once
    with exactly one keeper per cluster."""
    from kafka_streams_sandbox_spark.operators.dedup import (
        b93_semantic_dedup,
        b94_semantic_dedup_exact,
    )

    hostile_ids = {100, 101, 102, 103, 104}
    for fn in (b93_semantic_dedup, b94_semantic_dedup_exact):
        rows = fn(spark, hostile_vec_dir).collect()
        assert len(rows) == 30, fn.__name__  # the clean vectors only
        assert not {r["vec_id"] for r in rows} & hostile_ids
        assert not {r["keep_id"] for r in rows} & hostile_ids
        by_cluster: dict = {}
        for r in rows:
            by_cluster.setdefault(r["cluster_id"], []).append(r)
        for members in by_cluster.values():
            assert sum(1 for m in members if m["is_kept"]) == 1


def test_kmeans_ivf_survives_identical_embedding_mass(spark, tmp_path):
    """r6: an identical-embedding mass shares its k-means cell AND its
    sign-projection sub key at any plane count, so one cogroup group
    legitimately holds the whole mass — the rerank kernel must stream
    probes in chunks instead of materializing a (queries x members)
    sims matrix (the b28-class OOM shape). 700 planted copies force
    >= 2 _RERANK_CHUNK blocks, so this also pins block-boundary
    correctness: every mass member still gets cos ~ 1.0 mass
    neighbors and <= 3 rows, exactly as the unchunked form."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    g = np.random.default_rng(4321)
    mass_n = 700
    mass_vec = g.normal(size=_DIM).astype(np.float32)
    base = g.normal(size=(40, _DIM)).astype(np.float32)
    ids = list(range(1000, 1000 + mass_n)) + list(range(40))
    vecs = [mass_vec.tolist()] * mass_n + [v.tolist() for v in base]
    table = pa.table(
        {
            "vec_id": pa.array(ids, pa.int64()),
            "embedding": pa.array(vecs, pa.list_(pa.float32())),
            "label": pa.array([i % 5 for i in range(len(ids))], pa.int32()),
        }
    )
    pq.write_table(table, str(tmp_path / "embeddings.parquet"))
    rows = b92_ann_ivf_kmeans(spark, str(tmp_path)).collect()
    by_q: dict = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(r)
    mass_ids = set(range(1000, 1000 + mass_n))
    # every mass member gets results, capped at top-3, and its #1
    # neighbor is another mass member at cosine exactly ~1.0
    assert mass_ids <= set(by_q)
    for q in mass_ids:
        rs = sorted(by_q[q], key=lambda r: r["rnk"])
        assert len(rs) <= 3
        assert rs[0]["neighbor_id"] in mass_ids and rs[0]["neighbor_id"] != q
        assert rs[0]["cos_sim"] == pytest.approx(1.0, abs=1e-9)
        # rank-1 tie-break inside an all-identical mass: lowest id wins
        expect = min(i for i in mass_ids if i != q)
        assert rs[0]["neighbor_id"] == expect


def test_banded_ann_paths_survive_identical_embedding_mass(spark, tmp_path):
    """r6 completeness: the SMJ-pair-join ANN paths (b35 sign-LSH,
    b91 scaled-cells IVF) face the same identical-embedding mass as
    b92 — the mass shares its bucket at any plane count, so the
    in-bucket rerank legitimately goes quadratic in the mass. Unlike
    the cogrouped kernel these paths stream mass x mass PAIRS through
    a spilling SortMergeJoin (slow, never a single-task memory spike),
    so the pin here is functional: both complete and every mass member
    ranks a mass sibling (cos ~ 1.0, min-id tiebreak) at #1."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    g = np.random.default_rng(2468)
    mass_n = 300  # 300^2 = 90k in-bucket pairs at test scale
    mass_vec = g.normal(size=_DIM).astype(np.float32)
    base = g.normal(size=(40, _DIM)).astype(np.float32)
    ids = list(range(1000, 1000 + mass_n)) + list(range(40))
    vecs = [mass_vec.tolist()] * mass_n + [v.tolist() for v in base]
    table = pa.table(
        {
            "vec_id": pa.array(ids, pa.int64()),
            "embedding": pa.array(vecs, pa.list_(pa.float32())),
            "label": pa.array([i % 5 for i in range(len(ids))], pa.int32()),
        }
    )
    pq.write_table(table, str(tmp_path / "embeddings.parquet"))
    mass_ids = set(range(1000, 1000 + mass_n))
    for fn in (b35_ann_random_projection, b91_ann_ivf_scaled_cells):
        by_q: dict = {}
        for r in fn(spark, str(tmp_path)).collect():
            by_q.setdefault(r["query_id"], []).append(r)
        assert mass_ids <= set(by_q), fn.__name__
        label_cells = fn is b91_ann_ivf_scaled_cells
        for q in mass_ids:
            rs = sorted(by_q[q], key=lambda r: r["rnk"])
            if label_cells:
                # b91 probes ONLY the query's label cell (the join is
                # on label AND sub — similarity.py b91 docstring): the
                # candidate set for a mass query is the same-label
                # slice of the mass, so rank-1 at the min-id tiebreak
                # is the min-id SAME-LABEL sibling, and every returned
                # neighbor must share the query's label (labels here
                # are (id - 1000) % 5 by construction).
                expect = min(
                    i
                    for i in mass_ids
                    if i != q and (i - 1000) % 5 == (q - 1000) % 5
                )
                assert all(
                    (r["neighbor_id"] - 1000) % 5 == (q - 1000) % 5
                    for r in rs
                    if r["neighbor_id"] in mass_ids
                ), (fn.__name__, q)
            else:
                # b35's signature has no label component: the whole
                # mass shares one bucket, global min-id wins.
                expect = min(i for i in mass_ids if i != q)
            assert rs[0]["neighbor_id"] == expect, (fn.__name__, q)
            assert rs[0]["cos_sim"] == pytest.approx(1.0, abs=1e-9)
