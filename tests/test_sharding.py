"""Span-level dedup (b87) and training-shard layout (b88/b89).

b87's planted-corpus test pins the span semantics the sf-data oracle
can't isolate (exact coverage arithmetic on known overlaps); b88/b89
pin the layout contract (dense global positions, exact shard balance,
read-back integrity) and the two-phase plan shape that replaces the
oracle's single-partition global sort.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from kafka_streams_sandbox_spark.operators.dedup import (
    B87_SPAN,
    b87_duplicated_spans,
)
from kafka_streams_sandbox_spark.operators.packing import (
    B88_SHARDS,
    b88_shard_shuffle,
    b89_shard_write_manifest,
)
from kafka_streams_sandbox_spark.plans.inspect import (
    has_operator,
    plan_string,
    uses_row_python_udf,
)

# Planted span corpus (B87_SPAN == 8):
#   doc 0 and doc 1 share a verbatim 10-token span ("s1".."s10") with
#   distinct 8-token prefixes/suffixes -> each has 3 duplicated span
#   positions covering exactly the 10 shared tokens;
#   doc 2 is clean; doc 3 is shorter than a span (no spans at all).
_SHARED = " ".join(f"s{i}" for i in range(1, 11))
_DOCS = [
    (0, " ".join(f"a{i}" for i in range(8)) + " " + _SHARED),
    (1, _SHARED + " " + " ".join(f"b{i}" for i in range(8))),
    (2, " ".join(f"c{i}" for i in range(30))),
    (3, "tiny doc below span length"),
]


@pytest.fixture(scope="module")
def span_dir(tmp_path_factory) -> str:
    tmp = tmp_path_factory.mktemp("span_corpus")
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([d[0] for d in _DOCS], pa.int64()),
                "text": pa.array([d[1] for d in _DOCS], pa.string()),
                "lang": pa.array(["en"] * len(_DOCS), pa.string()),
                "source": pa.array(["s"] * len(_DOCS), pa.string()),
                "n_chars": pa.array(
                    [len(d[1]) for d in _DOCS], pa.int64()
                ),
            }
        ),
        str(tmp / "documents.parquet"),
    )
    return str(tmp)


def test_b87_planted_span_coverage(spark, span_dir):
    assert B87_SPAN == 8  # the planted arithmetic below assumes it
    out = {r["doc_id"]: r for r in b87_duplicated_spans(spark, span_dir).collect()}
    assert set(out) == {0, 1, 2, 3}
    # docs 0/1: 18 tokens -> 11 spans; the shared 10-token run yields
    # exactly 3 duplicated 8-gram positions; interval union covers the
    # 10 shared tokens only
    for d in (0, 1):
        r = out[d]
        assert r["n_tokens"] == 18 and r["n_spans"] == 11
        assert r["dup_spans"] == 3
        assert r["covered_tokens"] == 10
        assert r["dup_token_ratio"] == pytest.approx(10 / 18)
    # clean doc: spans exist, none duplicated
    assert out[2]["n_spans"] == 23 and out[2]["dup_spans"] == 0
    assert out[2]["covered_tokens"] == 0 and out[2]["dup_token_ratio"] == 0.0
    # short doc: no spans at all, still present with zeros
    assert out[3]["n_spans"] == 0 and out[3]["dup_token_ratio"] == 0.0


def test_b87_plan_never_pairwise(spark, sf_dir):
    """The span pipeline is posting-list shaped: no nested-loop join
    (never all-pairs) and no Python anywhere."""
    df = b87_duplicated_spans(spark, sf_dir)
    plan = plan_string(df)
    assert not has_operator(df, "BroadcastNestedLoopJoin"), plan
    assert not uses_row_python_udf(df), plan


def test_b88_layout_contract(spark, sf_dir):
    rows = b88_shard_shuffle(spark, sf_dir).collect()
    n = len(rows)
    assert n > 0
    # global_pos is a dense permutation of 0..n-1
    assert sorted(r["global_pos"] for r in rows) == list(range(n))
    # shard/pos are pure arithmetic on global_pos (round-robin)
    for r in rows:
        assert r["shard_id"] == r["global_pos"] % B88_SHARDS
        assert r["pos_in_shard"] == r["global_pos"] // B88_SHARDS
    # exact balance: shard sizes differ by at most 1
    sizes = [0] * B88_SHARDS
    for r in rows:
        sizes[r["shard_id"]] += 1
    assert max(sizes) - min(sizes) <= 1, sizes
    # the order really is the md5 order (not doc_id order)
    by_pos = sorted(rows, key=lambda r: r["global_pos"])
    assert [r["sort_key"] for r in by_pos] == sorted(
        r["sort_key"] for r in rows
    )
    assert [r["doc_id"] for r in by_pos] != sorted(r["doc_id"] for r in rows)


def test_b88_runs_are_identical(spark, sf_dir):
    """Seeded shuffle: two independent runs produce byte-identical
    layouts (no RNG state, no partitioning dependence)."""
    a = sorted(map(tuple, b88_shard_shuffle(spark, sf_dir).collect()))
    b = sorted(map(tuple, b88_shard_shuffle(spark, sf_dir).collect()))
    assert a == b


def test_b88_bucket_width_changes_no_semantics(spark, sf_dir, monkeypatch):
    """Hex-prefix buckets are RANGES of the sort order, so the layout
    must be byte-identical at any prefix width (ADVICE r4 made the
    width a module constant + env knob; this pins that widening it for
    cluster parallelism is semantics-free)."""
    from kafka_streams_sandbox_spark.operators import packing

    narrow = sorted(map(tuple, b88_shard_shuffle(spark, sf_dir).collect()))
    monkeypatch.setattr(packing, "B88_BUCKET_HEX_CHARS", 2)
    wide = sorted(map(tuple, b88_shard_shuffle(spark, sf_dir).collect()))
    assert narrow == wide


def test_b88_no_global_order_window(spark, sf_dir):
    """The oracle's ROW_NUMBER() OVER (ORDER BY key) is a global sort;
    the operator must instead rank within hex-prefix buckets and add
    bounded offsets — exactly one single-partition stage (the 16-row
    offsets cumsum), corpus windows partitioned by bucket, offsets
    reaching the corpus via a broadcast join."""
    df = b88_shard_shuffle(spark, sf_dir)
    plan = plan_string(df)
    assert plan.count("SinglePartition") == 1, plan
    assert "windowspecdefinition(bucket#" in plan, plan
    assert has_operator(df, "BroadcastHashJoin"), plan
    assert not uses_row_python_udf(df), plan


def test_b89_manifest_matches_corpus(spark, sf_dir):
    """The sink's own in-query asserts (read-back count, balance,
    dense pos) ran if this returns; check the manifest agrees with
    the corpus totals."""
    from kafka_streams_sandbox_spark.catalog import table

    rows = b89_shard_write_manifest(spark, sf_dir).collect()
    docs = table(spark, sf_dir, "documents")
    assert sum(r["n_docs"] for r in rows) == docs.count()
    total_chars = docs.groupBy().sum("n_chars").collect()[0][0]
    assert sum(r["total_chars"] for r in rows) == total_chars
    assert len(rows) == min(B88_SHARDS, docs.count())


def test_b90_forward_fill_semantics(spark):
    """Planted stream: hour-boundary event fills its own hour; a NULL
    value travels with its row (struct carry — the fill must not mix
    an older value with a newer ts); equal-ts events resolve to the
    higher event_id; grid points before any event stay NULL."""
    from kafka_streams_sandbox_spark.operators.extended import b90_time_grid_fill
    import datetime as dt

    ts = lambda h, m=0: dt.datetime(2024, 1, 1, h, m)
    rows = [
        # (event_id, ts, user_id, event_type, value, props)
        (1, ts(0, 30), 7, "view", 1.0, "{}"),
        (2, ts(2, 0), 7, "view", 2.0, "{}"),   # exactly at grid point
        (3, ts(2, 0), 7, "view", 3.0, "{}"),   # same-ts tie: id 3 wins
        (4, ts(3, 0), 7, "view", None, "{}"),  # NULL value AT the boundary
    ]
    import pyarrow as pa
    import pyarrow.parquet as pq
    import tempfile, os

    tmp = tempfile.mkdtemp(prefix="b90-")
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array([r[0] for r in rows], pa.int64()),
                "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
                "user_id": pa.array([r[2] for r in rows], pa.int64()),
                "event_type": pa.array([r[3] for r in rows], pa.string()),
                "value": pa.array([r[4] for r in rows], pa.float64()),
                "props": pa.array([r[5] for r in rows], pa.string()),
            }
        ),
        os.path.join(tmp, "events.parquet"),
    )
    out = {
        r["grid_ts"].hour: r
        for r in b90_time_grid_fill(spark, tmp).collect()
    }
    assert set(out) == {0, 1, 2, 3}  # trunc(first)=00:00 .. trunc(last)=03:00
    assert out[0]["filled_value"] is None  # grid point before any event
    assert out[1]["filled_value"] == 1.0 and out[1]["filled_from_id"] == 1
    assert out[2]["filled_value"] == 3.0 and out[2]["filled_from_id"] == 3
    # newest row has NULL value: the whole struct carries (NULL, ts, 4)
    assert out[3]["filled_value"] is None and out[3]["filled_from_id"] == 4


# ---------------------------------------------------------------------------
# b97: span-removal rewrite (keep-first exact-substring dedup)
# ---------------------------------------------------------------------------

# b97's planted corpus = b87's four docs plus a within-doc-repeat doc
# (separate fixture: b87's planted test pins its doc-id set exactly).
#   doc 4 repeats the same 8 tokens twice — its 8-grams recur only
#   WITHIN the doc, so nd < 2 and nothing is removed (within-doc
#   repetition is b63's signal, pinned here as out of scope).
_B97_DOCS = _DOCS + [
    (4, " ".join(f"r{i}" for i in range(1, 9)) + " "
        + " ".join(f"r{i}" for i in range(1, 9))),
]


@pytest.fixture(scope="module")
def b97_dir(tmp_path_factory) -> str:
    tmp = tmp_path_factory.mktemp("b97_corpus")
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([d[0] for d in _B97_DOCS], pa.int64()),
                "text": pa.array([d[1] for d in _B97_DOCS], pa.string()),
                "lang": pa.array(["en"] * len(_B97_DOCS), pa.string()),
                "source": pa.array(["s"] * len(_B97_DOCS), pa.string()),
                "n_chars": pa.array(
                    [len(d[1]) for d in _B97_DOCS], pa.int64()
                ),
            }
        ),
        str(tmp / "documents.parquet"),
    )
    return str(tmp)


def test_b97_planted_keep_first_rewrite(spark, b97_dir):
    from kafka_streams_sandbox_spark.operators.dedup import (
        b97_span_removal_rewrite,
    )

    assert B87_SPAN == 8  # the planted arithmetic below assumes it
    out = {
        r["doc_id"]: r
        for r in b97_span_removal_rewrite(spark, b97_dir).collect()
    }
    assert set(out) == {0, 1, 2, 3, 4}
    # doc 0 is the keeper (min doc_id) of every shared span: untouched
    r0 = out[0]
    assert r0["removed_tokens"] == 0 and r0["kept_tokens"] == 18
    assert r0["clean_text"] == _B97_DOCS[0][1]
    # doc 1 loses exactly the 10 shared tokens (interval UNION of the
    # 3 overlapping duplicated 8-grams — 10, never 24), keeps its tail
    r1 = out[1]
    assert r1["n_tokens"] == 18 and r1["removed_tokens"] == 10
    assert r1["kept_tokens"] == 8
    assert r1["clean_text"] == " ".join(f"b{i}" for i in range(8))
    # clean doc / below-span doc / within-doc-repeat doc: untouched
    for d in (2, 3, 4):
        r = out[d]
        assert r["removed_tokens"] == 0, d
        assert r["clean_text"] == _B97_DOCS[d][1], d


def test_b97_plan_never_pairwise(spark, sf_dir):
    from kafka_streams_sandbox_spark.operators.dedup import (
        b97_span_removal_rewrite,
    )

    df = b97_span_removal_rewrite(spark, sf_dir)
    plan = plan_string(df)
    assert not has_operator(df, "BroadcastNestedLoopJoin"), plan
    assert not uses_row_python_udf(df), plan


def test_temperature_mixture_flattens_skew(spark, tmp_path):
    """b103 on a skewed corpus: the head source's keep-rate must drop
    far below the tail's (that IS temperature flattening), quotas must
    equal the pure-Python ceil(sqrt(n)*3) form, and the kept docs must
    be exactly the quota lowest-Lehmer-hashed ids per source."""
    import math

    import pyarrow as pa
    import pyarrow.parquet as pq

    from kafka_streams_sandbox_spark.operators.pipeline import (
        b103_temperature_mixture,
    )

    sizes = {"head": 400, "mid": 16, "tail": 4}
    rows = []
    i = 0
    for src, n in sizes.items():
        for _ in range(n):
            rows.append((i, f"doc {i} text", "en", src, 10))
            i += 1
    table = pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows], pa.string()),
            "lang": pa.array([r[2] for r in rows], pa.string()),
            "source": pa.array([r[3] for r in rows], pa.string()),
            "n_chars": pa.array([r[4] for r in rows], pa.int64()),
        }
    )
    pq.write_table(table, str(tmp_path / "documents.parquet"))

    out = b103_temperature_mixture(spark, str(tmp_path)).collect()
    by_src = {}
    for r in out:
        by_src.setdefault(r["source"], []).append(r)
    ids_by_src = {}
    start = 0
    for src, n in sizes.items():
        ids_by_src[src] = list(range(start, start + n))
        start += n
    for src, n in sizes.items():
        want_quota = min(n, math.ceil(math.sqrt(n) * 3))
        got = by_src[src]
        assert all(r["quota"] == want_quota for r in got), (src, got[0])
        assert len(got) == want_quota, (src, len(got), want_quota)
        want_ids = sorted(
            ids_by_src[src], key=lambda d: ((d * 48271) % 2147483647, d)
        )[:want_quota]
        assert sorted(r["doc_id"] for r in got) == sorted(want_ids), src
    keep_rate = {s: len(by_src[s]) / n for s, n in sizes.items()}
    assert keep_rate["head"] < 0.2 < keep_rate["mid"] < keep_rate["tail"] == 1.0


@pytest.fixture(scope="module")
def b112_dir(tmp_path_factory) -> str:
    # paragraphs are 20-token blocks (_B112_P); tokens chosen so no
    # accidental block collides except the planted ones
    A = " ".join(f"a{i}" for i in range(20))
    B = " ".join(f"b{i}" for i in range(20))
    C = "c0 c1 c2 c3 c4"
    D = " ".join(f"d{i}" for i in range(20))
    E = "e0 e1 e2 e3 e4"
    FF = " ".join(f"f{i}" for i in range(20))
    G = "g0 g1 g2 g3 g4"
    docs = [
        (10, f"{A} {B} {C}"),      # first owner of A, B, C
        (11, f"{D} {B} {E}"),      # loses B to doc 10
        (12, f"{A} {A}"),          # both copies already owned by 10
        (13, f"{FF} {FF}"),        # intra-doc repeat, first owner
        (14, G),                   # short unique doc (1 paragraph)
    ]
    tmp = tmp_path_factory.mktemp("b112_corpus")
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([d[0] for d in docs], pa.int64()),
                "text": pa.array([d[1] for d in docs], pa.string()),
                "lang": pa.array(["en"] * len(docs), pa.string()),
                "source": pa.array(["s"] * len(docs), pa.string()),
                "n_chars": pa.array([len(d[1]) for d in docs], pa.int64()),
            }
        ),
        str(tmp / "documents.parquet"),
    )
    return str(tmp)


def test_b112_planted_paragraph_keep_first(spark, b112_dir):
    """b112 (r9, VERDICT r8 #3): CCNet keep-first at paragraph
    granularity — a cross-doc duplicate paragraph survives only in
    the lowest (doc_id, pos) owner; a doc whose every paragraph is
    already owned rewrites to ''; an intra-doc repeat keeps only its
    first copy even when the doc IS the corpus-wide first owner."""
    from kafka_streams_sandbox_spark.operators.dedup import (
        _B112_P,
        b112_paragraph_dedup,
    )

    assert _B112_P == 20  # the planted block arithmetic assumes it
    A = " ".join(f"a{i}" for i in range(20))
    B = " ".join(f"b{i}" for i in range(20))
    C = "c0 c1 c2 c3 c4"
    D = " ".join(f"d{i}" for i in range(20))
    E = "e0 e1 e2 e3 e4"
    FF = " ".join(f"f{i}" for i in range(20))
    G = "g0 g1 g2 g3 g4"
    out = {
        r["doc_id"]: r
        for r in b112_paragraph_dedup(spark, b112_dir).collect()
    }
    assert set(out) == {10, 11, 12, 13, 14}
    # first owner keeps everything
    assert out[10]["new_text"] == f"{A} {B} {C}"
    assert (out[10]["n_paras"], out[10]["kept_paras"]) == (3, 3)
    # doc 11 loses exactly the shared paragraph B
    assert out[11]["new_text"] == f"{D} {E}"
    assert (out[11]["n_paras"], out[11]["kept_paras"]) == (3, 2)
    # doc 12: both paragraphs owned by doc 10 -> fully deduped
    assert out[12]["new_text"] == ""
    assert (out[12]["n_paras"], out[12]["kept_paras"]) == (2, 0)
    # doc 13: intra-doc repeat, keeps only the first copy
    assert out[13]["new_text"] == FF
    assert (out[13]["n_paras"], out[13]["kept_paras"]) == (2, 1)
    # short unique doc untouched
    assert out[14]["new_text"] == G
    assert (out[14]["n_paras"], out[14]["kept_paras"]) == (1, 1)


def test_b112_plan_shape(spark, sf_dir):
    """Paragraph dedup must stay relational: no pairwise join, no
    row-Python, and the keep-first shuffle keys on the int64
    paragraph hash (xxhash64), not the paragraph string."""
    from kafka_streams_sandbox_spark.operators.dedup import (
        b112_paragraph_dedup,
    )

    df = b112_paragraph_dedup(spark, sf_dir)
    plan = plan_string(df)
    assert not has_operator(df, "BroadcastNestedLoopJoin"), plan
    assert not uses_row_python_udf(df), plan
    assert "xxhash64" in plan


def _identical_docs_dir(tmp_path, n):
    text = " ".join(f"w{j}" for j in range(30))
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(list(range(1, n + 1)), pa.int64()),
                "text": pa.array([text] * n, pa.string()),
                "lang": pa.array(["en"] * n, pa.string()),
                "source": pa.array(["s"] * n, pa.string()),
                "n_chars": pa.array([len(text)] * n, pa.int64()),
            }
        ),
        str(tmp_path / "documents.parquet"),
    )
    return str(tmp_path)


def test_winnowing_capped_equals_uncapped_under_cap(spark, tmp_path):
    """b115 (r9, VERDICT r8 #4): on any corpus whose live buckets fit
    the partner cap (10 identical docs -> every print bucket has 10
    members <= cap+1), the capped coverage equals b109's uncapped
    coverage row-for-row."""
    from kafka_streams_sandbox_spark.operators.dedup import (
        _WIN_PARTNER_CAP,
        b109_winnowing_coverage,
        b115_winnowing_coverage_capped,
    )

    assert _WIN_PARTNER_CAP >= 4  # the planted bucket fits the cap
    d = _identical_docs_dir(tmp_path, _WIN_PARTNER_CAP + 1)
    capped = {tuple(r) for r in b115_winnowing_coverage_capped(spark, d).collect()}
    full = {tuple(r) for r in b109_winnowing_coverage(spark, d).collect()}
    assert capped == full and capped


def test_winnowing_cap_bites_with_rank_rule(spark, tmp_path):
    """When a bucket exceeds the cap (20 identical docs), each doc
    keeps evidence only toward bucket-mates within _WIN_PARTNER_CAP
    positions in id order: n_partners per doc matches the rank-rule
    formula exactly, every surviving pair still carries the full
    shared-print count (max_shared * n_partners == mass), and the
    uncapped b109 keeps all 19 partners."""
    from kafka_streams_sandbox_spark.operators.dedup import (
        _WIN_PARTNER_CAP as CAP,
        b109_winnowing_coverage,
        b115_winnowing_coverage_capped,
    )

    d = _identical_docs_dir(tmp_path, 20)
    got = {
        r["doc_id"]: r
        for r in b115_winnowing_coverage_capped(spark, d).collect()
    }
    assert set(got) == set(range(1, 21))
    for i in range(1, 21):
        want_partners = min(20 - i, CAP) + min(i - 1, CAP)
        r = got[i]
        assert r["n_partners"] == want_partners, i
        assert r["shared_print_mass"] == r["max_shared"] * want_partners
    full = {
        r["doc_id"]: r["n_partners"]
        for r in b109_winnowing_coverage(spark, d).collect()
    }
    assert all(v == 19 for v in full.values())
