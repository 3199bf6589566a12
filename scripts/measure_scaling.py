#!/usr/bin/env python
"""Scaling-slope measurement for the five most expensive plans
(VERDICT r3 #4): b26, b27, b39_lsh, b78, b60 at sf0.1 (5k docs / 2k
vecs) vs a seed-stable ~10x documents/embeddings set (50k docs / 20k
vecs) generated with the SAME marginals as the driver data —
empirical word frequencies, doc-length distribution, lang/source
mix, and matched near-duplicate rates (b26 finds ~1.6% strong dup
pairs and b27 ~5% minhash pairs at sf0.1; the generator plants
mutated copies at 5% to land in the same regime).

The banded/bucketed paths (b27, b39_lsh, b78, b60) should scale
near-linearly in rows; the exact all-pairs anchors (b26's per-lang
exact Jaccard) are expected to blow up superlinearly — that contrast
is the point: it proves the quarantine of the exact anchors is real.

Usage: python scripts/measure_scaling.py [out_dir]
Writes the 10x set under out_dir (default /tmp/kss_scale10x), times
both scales best-of-3, prints one JSON with per-query secs + slopes.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = "/root/testdata/sf0.1"
SEED = 777
# Overridable for deeper probes (e.g. a 100x sweep of just the banded
# paths: KSS_SCALE_DOCS=500000 KSS_SCALE_VECS=200000
# KSS_SCALE_QUERIES=b27_...,b87_... python scripts/measure_scaling.py /tmp/kss_100x)
N_DOCS = int(os.environ.get("KSS_SCALE_DOCS", 50_000))
N_VECS = int(os.environ.get("KSS_SCALE_VECS", 20_000))
# Timing repeats per (query, scale). VERDICT r4 #7: the 100x tier must
# be at least best-of-2 — a single draw on a multi-minute job makes
# the headline slope table noisy — so the floor is 2 regardless of the
# env override (use KSS_SCALE_REPEATS=2 for big sweeps to bound cost).
REPEATS = max(2, int(os.environ.get("KSS_SCALE_REPEATS", "3")))
P_DUP_DOC = 0.05  # mutated-copy rate -> same dup regime as sf0.1
P_DUP_VEC = 0.07
# r6 hostile-mass knob (VERDICT r5 Next #1): overwrite the first M
# vector rows with ONE identical embedding — the boilerplate-mass
# shape that defeats LSH plane scaling (identical vectors share every
# signature bit at any plane count). Used to probe b93's oversized-
# bucket star guard at 100x:
#   KSS_SCALE_VEC_MASS=20000 KSS_SCALE_QUERIES=b93_semantic_dedup \
#   KSS_SCALE_DOCS=500000 KSS_SCALE_VECS=200000 KSS_SCALE_REPEATS=2 \
#   python scripts/measure_scaling.py /tmp/kss_100x_mass
VEC_MASS = int(os.environ.get("KSS_SCALE_VEC_MASS", "0"))
QUERIES = (
    "b26_ngram_jaccard_pairs",
    "b27_minhash_lsh_dedup",
    "b39_lsh_embedding_neardup",
    "b78_keep_best_in_cluster",
    "b60_canonical_assignment",
    # round-4 extension: the remaining banded paths, plus the exact
    # brute-force b33 anchor vs its Arrow-kernel twin b44 — the
    # same-semantics pair separates plan shape (both O(n*q)) from
    # per-pair kernel throughput (JVM HOF fold vs numpy matmul)
    "b28_simhash_dedup",
    "b35_ann_random_projection",
    "b33_cosine_topk",
    "b44_cosine_topk_arrow",
    # late-r4 additions: the span-posting pipeline and the two-phase
    # distributed global rank — both claimed near-linear
    "b87_duplicated_spans",
    "b88_shard_shuffle",
    # end-r4: b34's scaled-cells remedy (measured 14.2 s vs 349 s at
    # 10x; 82 s at 100x) — keep it in every future sweep. b34 itself
    # is the documented fixed-config anchor; time it deliberately,
    # not by default (349 s at 10x).
    "b91_ann_ivf_scaled_cells",
    # round-5 additions: the learned-quantizer IVF and the SemDeDup
    # capstone (bucketed candidates -> components -> keeper), plus the
    # collapsed-b27 rewrite already covered above
    "b92_ann_ivf_kmeans",
    "b93_semantic_dedup",
    # round-6 additions: the n-scaled star-guarded twin of b39_lsh and
    # the minhash-blocked fuzzy ER (the blocking key that completes
    # the 100x Zipf corpus b76's first-token blocks cannot)
    "b96_lsh_embedding_neardup_scaled",
    "b95_fuzzy_match_minhash_blocked",
    # b97: b87's posting plan as a corpus rewrite — the one extra cost
    # is the doc_id join that carries token arrays to the rewrite
    "b97_span_removal_rewrite",
    # b98: per-ingest cost must stay O(batch + index join) as the
    # standing corpus grows 100x
    "b98_incremental_neardup",
    # round-7: the self-seeding ingest form (two cap-admitted rounds)
    # and the composed curation capstone funnel
    "b99_selfseed_neardup",
    "b100_curation_capstone",
    "b101_exact_substring_runs",
)
if os.environ.get("KSS_SCALE_QUERIES"):
    QUERIES = tuple(os.environ["KSS_SCALE_QUERIES"].split(","))


def build_10x(out_dir: str) -> None:
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.default_rng(SEED)
    os.makedirs(out_dir, exist_ok=True)
    # non-scaled tables ride along as symlinks so sf_dir is complete
    for name in (
        "region nation customer supplier part orders lineitem events"
    ).split():
        dst = os.path.join(out_dir, f"{name}.parquet")
        # lexists, not exists: a dangling symlink from a prior run
        # must be repaired, not re-created (FileExistsError)
        if os.path.lexists(dst):
            os.unlink(dst)
        os.symlink(os.path.join(SF_DIR, f"{name}.parquet"), dst)

    # ---- documents: empirical marginals from the sf0.1 corpus ----
    base = pq.read_table(os.path.join(SF_DIR, "documents.parquet"))
    texts = base["text"].to_pylist()
    langs = base["lang"].to_pylist()
    sources = base["source"].to_pylist()
    from collections import Counter

    wc: Counter = Counter()
    lens = []
    for t in texts:
        ws = t.split()
        lens.append(len(ws))
        wc.update(ws)
    vocab = np.array(sorted(wc))
    freq = np.array([wc[w] for w in vocab], dtype=np.float64)
    freq /= freq.sum()
    lens_arr = np.array(lens)
    lang_v, lang_c = np.unique(langs, return_counts=True)
    src_v, src_c = np.unique(sources, return_counts=True)

    doc_words: list[list[str]] = []
    out_lang = rng.choice(lang_v, N_DOCS, p=lang_c / lang_c.sum())
    out_src = rng.choice(src_v, N_DOCS, p=src_c / src_c.sum())
    n_words = rng.choice(lens_arr, N_DOCS)  # empirical length dist
    dup_of = np.full(N_DOCS, -1)
    dup_mask = rng.random(N_DOCS) < P_DUP_DOC
    for i in range(N_DOCS):
        if dup_mask[i] and i > 10:
            j = int(rng.integers(0, i))
            words = list(doc_words[j])
            if not words:  # empty source doc: nothing to mutate-copy
                doc_words.append(
                    [str(w) for w in rng.choice(vocab, int(n_words[i]), p=freq)]
                )
                continue
            # mutate ~10% of words so the copy is a NEAR dup
            for k in rng.integers(0, len(words), max(1, len(words) // 10)):
                words[k] = str(rng.choice(vocab, p=freq))
            dup_of[i] = j
            out_lang[i] = out_lang[j]  # b26 blocks by lang
        else:
            words = [str(w) for w in rng.choice(vocab, n_words[i], p=freq)]
        doc_words.append(words)
    out_text = [" ".join(ws) for ws in doc_words]
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(N_DOCS), pa.int64()),
                "text": pa.array(out_text, pa.string()),
                "lang": pa.array([str(x) for x in out_lang], pa.string()),
                "source": pa.array([str(x) for x in out_src], pa.string()),
                "n_chars": pa.array(
                    [len(t) for t in out_text], pa.int64()
                ),
            }
        ),
        os.path.join(out_dir, "documents.parquet"),
    )

    # ---- embeddings: 10 label clusters + planted near-dup copies ----
    dim = 64
    # iid gaussian vectors with label as independent metadata — the
    # driver corpus's shape (measured: mean pairwise cos 0.0, p99.9
    # 0.376 at sf0.1; label ~ uniform 0-9 uncorrelated with the
    # vector). Two earlier cuts used label-centered clusters and
    # produced millions of in-cluster pairs over the 0.3 near-dup
    # threshold at 10x — an output-dominated slope that measured
    # result size, not the plan.
    lab = rng.integers(0, 10, N_VECS)
    vecs = rng.normal(0, 1.0, (N_VECS, dim))
    vdup = rng.random(N_VECS) < P_DUP_VEC
    for i in np.flatnonzero(vdup):
        if i > 10:
            j = int(rng.integers(0, i))
            vecs[i] = vecs[j] + rng.normal(0, 0.01, dim)
            lab[i] = lab[j]
    if VEC_MASS:  # planted identical-embedding mass (see VEC_MASS)
        vecs[:VEC_MASS] = vecs[0]
        lab[:VEC_MASS] = lab[0]
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(range(N_VECS), pa.int64()),
                "embedding": pa.array(
                    [v.astype(np.float32) for v in vecs],
                    pa.list_(pa.float32()),
                ),
                "label": pa.array(lab.astype(np.int32), pa.int32()),
            }
        ),
        os.path.join(out_dir, "embeddings.parquet"),
    )


def main() -> int:
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/kss_scale10x"
    build_10x(out_dir)

    from kafka_streams_sandbox_spark.registry import all_queries
    from kafka_streams_sandbox_spark.session import get_spark

    spark = get_spark()
    qs = all_queries()
    result: dict = {"n_docs_10x": N_DOCS, "n_vecs_10x": N_VECS, "queries": {}}
    for name in QUERIES:
        row: dict = {}
        for label, d in (("sf0.1", SF_DIR), ("10x", out_dir)):
            best, rows = float("inf"), None
            for _ in range(REPEATS):
                t0 = time.perf_counter()
                rows = qs[name](spark, d).count()
                best = min(best, time.perf_counter() - t0)
            row[label] = round(best, 2)
            row[f"rows_{label}"] = rows
        row["slope"] = round(row["10x"] / row["sf0.1"], 1)
        result["queries"][name] = row
        print(f"{name}: {row}", file=sys.stderr, flush=True)
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
