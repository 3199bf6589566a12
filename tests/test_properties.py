"""Property-based invariants (SURVEY §5.2 item 5) — hypothesis
generates small keyed datasets; Spark must uphold the operator
contracts on every one of them.

Example counts are kept low: each example is a full Spark job, so the
value is in odd shapes (empty, single key, all-duplicates, tie
timestamps), which hypothesis finds quickly.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from kafka_streams_sandbox_spark.operators.semantic import latest_per_key
from kafka_streams_sandbox_spark.streaming.ktable import (
    key_eq_value_predicate,
    ktable_filter,
)

KV = st.tuples(
    st.integers(min_value=0, max_value=5),  # key  (few values -> collisions)
    st.integers(min_value=0, max_value=50),  # ts   (ties likely)
    st.text(alphabet="abcAB", min_size=0, max_size=3),  # value
)

SETTINGS = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)


def _df(spark, rows):
    data = [(k, t, i, v) for i, (k, t, v) in enumerate(rows)]
    return spark.createDataFrame(
        data, "user_id long, ts long, event_id long, value string"
    )


@given(rows=st.lists(KV, min_size=0, max_size=30))
@SETTINGS
def test_latest_per_key_contract(spark, rows):
    """latest_per_key: one row per key, each row IS the input row with
    the max (ts, event_id) for that key; idempotent."""
    df = _df(spark, rows)
    out = latest_per_key(df, key="user_id", ts="ts", tiebreak="event_id")
    got = {r.user_id: (r.ts, r.event_id, r.value) for r in out.collect()}
    expected = {}
    for i, (k, t, v) in enumerate(rows):
        cur = expected.get(k)
        if cur is None or (t, i) > (cur[0], cur[1]):
            expected[k] = (t, i, v)
    assert got == expected
    again = latest_per_key(out, key="user_id", ts="ts", tiebreak="event_id")
    assert sorted(map(tuple, again.collect())) == sorted(map(tuple, out.collect()))


@given(rows=st.lists(KV, min_size=0, max_size=30))
@SETTINGS
def test_exact_dedup_partition_property(spark, rows):
    """Hash-groupBy dedup: every input row lands in exactly one group;
    group sizes sum to the input count; keep_id is a real member."""
    df = _df(spark, rows)
    out = (
        df.groupBy("value")
        .agg(
            F.min("event_id").alias("keep_id"),
            F.count(F.lit(1)).alias("dup_count"),
        )
        .collect()
    )
    assert sum(r.dup_count for r in out) == len(rows)
    values = [v for (_, _, v) in rows]
    for r in out:
        assert values[r.keep_id] == r.value  # keep_id indexes an input row


@given(rows=st.lists(KV, min_size=0, max_size=30))
@SETTINGS
def test_ktable_filter_partitions_not_drops(spark, rows):
    """A4 tombstone filter: never drops rows — it labels them; the
    is_delete split is exactly the predicate's complement."""
    df = _df(spark, rows).withColumn("k", F.col("value"))
    flagged = ktable_filter(df, key_eq_value_predicate("k", "value"))
    assert flagged.count() == len(rows)
    # k == value by construction -> survivors are rows with non-null k
    assert flagged.filter(F.col("is_delete")).count() == 0
    mixed = ktable_filter(
        df.withColumn("k", F.upper("value")),
        key_eq_value_predicate("k", "value"),
    )
    # case-insensitive: upper(value) ==ic value always -> no deletes
    assert mixed.filter(F.col("is_delete")).count() == 0
    broken = ktable_filter(
        df.withColumn("k", F.concat(F.col("value"), F.lit("x"))),
        key_eq_value_predicate("k", "value"),
    )
    # appending 'x' breaks equality for every row -> all tombstones
    assert broken.filter(~F.col("is_delete")).count() == 0


def test_stratified_sample_deterministic_under_repartition(spark):
    """b64's sample is a pure function of doc_id — the same rows must
    be picked regardless of input partitioning (the property rand()
    -based sampling lacks)."""
    from kafka_streams_sandbox_spark.operators.pipeline import (
        b64_stratified_sample,
    )

    sf = "/root/testdata/sf0.001"
    base = {
        (r.lang, r.doc_id, r.sample_rank)
        for r in b64_stratified_sample(spark, sf).collect()
    }
    assert base, "sample is empty"
    ranks: dict[str, int] = {}
    for lang, _doc, rnk in base:
        ranks[lang] = max(ranks.get(lang, 0), rnk)
    assert all(k <= 20 for k in ranks.values())
    spark.conf.set("spark.sql.shuffle.partitions", "3")
    try:
        again = {
            (r.lang, r.doc_id, r.sample_rank)
            for r in b64_stratified_sample(spark, sf).collect()
        }
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", "8")
    assert again == base


def test_embedding_quantize_error_bound(spark):
    """Absmax int8 reconstruction error is bounded by scale/2 per
    element by construction — the invariant the audit column exists to
    monitor."""
    from kafka_streams_sandbox_spark.operators.pipeline import (
        b65_embedding_quantize,
    )

    rows = b65_embedding_quantize(spark, "/root/testdata/sf0.001").collect()
    assert rows
    for r in rows:
        assert r.n_dims == 64
        assert r.max_abs_err <= r.scale / 2 + 1e-12, r


def test_incremental_dedup_statuses(spark, tmp_path):
    """All three b68 statuses on a constructed corpus: doc 8 matches
    the corpus (dup_corpus), docs 18/28 share a fresh fingerprint
    (first=unique, second=dup_batch), doc 9 is novel (unique).
    Token-set fingerprinting means reordered copies collapse."""
    from kafka_streams_sandbox_spark.operators.pipeline import (
        b68_incremental_dedup,
    )

    rows = [
        (0, "alpha beta gamma", "en", "src0", 16),   # corpus
        (1, "delta epsilon", "en", "src0", 13),      # corpus
        (8, "gamma beta alpha", "en", "src1", 16),   # new: reorder of 0
        (9, "zeta eta", "en", "src1", 8),            # new: novel
        (18, "theta iota", "en", "src2", 10),        # new: pair first
        (28, "iota theta", "en", "src2", 10),        # new: pair second
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    path = str(tmp_path / "docs")
    df.write.parquet(f"{path}/documents.parquet")
    out = {
        r.doc_id: r.status
        for r in b68_incremental_dedup(spark, path).collect()
    }
    assert out == {8: "dup_corpus", 9: "unique", 18: "unique", 28: "dup_batch"}


def test_scd2_ranges_partition_timeline(spark):
    """b66 invariants: per user, version ranges are disjoint, ordered,
    and contiguous (each eff_to equals the next eff_from), exactly one
    open (is_current) version per user, and adjacent versions never
    repeat the same attr (change detection collapsed them)."""
    from collections import defaultdict

    from kafka_streams_sandbox_spark.operators.pipeline import (
        b66_scd2_history,
    )

    rows = b66_scd2_history(spark, "/root/testdata/sf0.001").collect()
    assert rows
    by_user = defaultdict(list)
    for r in rows:
        by_user[r.user_id].append(r)
    for user, vs in by_user.items():
        vs.sort(key=lambda r: r.eff_from)
        assert sum(1 for r in vs if r.is_current) == 1, user
        for a, b in zip(vs, vs[1:]):
            assert a.eff_to == b.eff_from, (user, a, b)
            assert a.attr != b.attr, (user, a, b)
        assert vs[-1].eff_to is None, user


def test_min_label_components_long_chain_multiround(spark):
    """VERDICT r2 #7: b55's fingerprint components all have diameter
    <= 2, so the multi-round propagation path never ran in anger. Feed
    the SAME loop b26/b27-style chain pairs (a-b, b-c, ... linked by
    overlapping shingles) where the min label must hop the whole path:
    the loop needs >= 3 rounds and must still converge correctly."""
    from kafka_streams_sandbox_spark.operators.extended import (
        min_label_components,
    )

    chain = [(i, i + 1) for i in range(6)]          # path 0-1-...-6
    other = [(100, 101), (101, 102)]                # second component
    pairs = spark.createDataFrame(
        chain + other, "doc_a long, doc_b long"
    )
    labels, rounds = min_label_components(pairs)
    got = {r.node: r.label for r in labels.collect()}
    expected = {i: 0 for i in range(7)}
    expected.update({100: 100, 101: 100, 102: 100})
    assert got == expected
    # a 6-edge path needs 6 label hops + 1 fixpoint-verify round
    assert rounds >= 3


def test_min_label_components_matches_union_find(spark):
    """Cross-check the distributed loop against a driver-side
    union-find on a fixed mixed graph (stars + chains + singleton
    pairs)."""
    from kafka_streams_sandbox_spark.operators.extended import (
        min_label_components,
    )

    edges = [
        (1, 2), (1, 3), (1, 4),          # star
        (10, 11), (11, 12), (12, 13),    # chain
        (20, 21),                        # pair
        (13, 20),                        # chain joined to pair
    ]
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    expected = {n: find(n) for n in parent}
    labels, _ = min_label_components(
        spark.createDataFrame(edges, "doc_a long, doc_b long")
    )
    assert {r.node: r.label for r in labels.collect()} == expected


def test_context_packing_invariants(spark):
    """b82 contract on real data: packs tile the doc_id order — ranges
    are disjoint, ordered, and cover every document exactly once; the
    token totals are preserved; and each pack except the last starts
    because the budget filled (its predecessor's cumulative prior
    crossed a budget boundary, so no pack but the last can end more
    than one document short of the budget)."""
    from kafka_streams_sandbox_spark.operators.packing import (
        PACK_BUDGET,
        b82_context_packing,
    )

    sf = "/root/testdata/sf0.001"
    packs = sorted(
        b82_context_packing(spark, sf).collect(), key=lambda r: r.pack_id
    )
    assert packs
    # doc ranges tile: ordered, disjoint, contiguous over doc ids
    for a, b in zip(packs, packs[1:]):
        assert a.last_doc < b.first_doc
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    n_docs = docs.count()
    assert sum(p.n_docs for p in packs) == n_docs
    # token totals preserved
    total = sum(p.pack_tokens for p in packs)
    from kafka_streams_sandbox_spark.functions.tokens import TOKENS_EXPR

    expected = docs.select(
        F.sum(F.expr(f"size({TOKENS_EXPR})")).alias("t")
    ).collect()[0]["t"]
    assert total == expected
    # budget actually fills: every pack but the last holds >= budget
    # tokens MINUS the straddle allowance (a doc that started inside
    # the pack may overflow into the next), i.e. cumulative boundaries
    # advance at least one budget per pack
    for p in packs[:-1]:
        assert p.pack_tokens > 0
    cum = 0
    for p in packs[:-1]:
        cum += p.pack_tokens
        assert cum >= (p.pack_id + 1) * PACK_BUDGET


# ---------------------------------------------------------------------------
# b87 / b88 cores vs pure-Python re-derivations
# ---------------------------------------------------------------------------

DOC_TEXT = st.lists(
    # tiny vocabulary + short docs: span overlaps and boundary cases
    # (len == SPAN, len == SPAN-1, empty) show up fast
    st.sampled_from(["a", "b", "c"]),
    min_size=0,
    max_size=12,
).map(" ".join)


@given(texts=st.lists(DOC_TEXT, min_size=0, max_size=8))
@SETTINGS
def test_duplicated_spans_matches_python(spark, texts):
    """b87 core == brute-force Python: for every doc, positions whose
    8-gram occurs in >= 2 distinct docs, interval-union coverage."""
    from kafka_streams_sandbox_spark.operators.dedup import (
        B87_SPAN,
        duplicated_spans,
    )

    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(
        [(i, t, "en", "s", len(t)) for i, t in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    got = {r["doc_id"]: r for r in duplicated_spans(df).collect()}

    toks = {i: t.split() for i, t in rows}
    span_docs: dict[tuple, set] = {}
    for i, tk in toks.items():
        for p in range(len(tk) - B87_SPAN + 1):
            span_docs.setdefault(tuple(tk[p : p + B87_SPAN]), set()).add(i)
    assert set(got) == set(toks)
    for i, tk in toks.items():
        dup_pos = [
            p
            for p in range(len(tk) - B87_SPAN + 1)
            if len(span_docs[tuple(tk[p : p + B87_SPAN])]) >= 2
        ]
        covered = set()
        for p in dup_pos:
            covered.update(range(p, p + B87_SPAN))
        r = got[i]
        assert r["n_tokens"] == len(tk)
        assert r["n_spans"] == max(len(tk) - B87_SPAN + 1, 0)
        assert r["dup_spans"] == len(dup_pos)
        assert r["covered_tokens"] == len(covered)
        expect_ratio = (len(covered) / len(tk)) if tk else 0.0
        assert abs(r["dup_token_ratio"] - expect_ratio) < 1e-12


@given(
    ids=st.lists(
        st.integers(min_value=0, max_value=10**9), min_size=0, max_size=40, unique=True
    )
)
@SETTINGS
def test_shard_layout_matches_python(spark, ids):
    """b88 core == Python sort by md5('shard:'+id): identical global
    positions, shards balanced to +/-1 by round-robin construction."""
    import hashlib

    from kafka_streams_sandbox_spark.operators.packing import (
        B88_SHARDS,
        shard_layout,
    )

    df = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    got = {r["doc_id"]: r for r in shard_layout(df).collect()}
    order = sorted(
        ids, key=lambda i: (hashlib.md5(f"shard:{i}".encode()).hexdigest(), i)
    )
    assert set(got) == set(ids)
    for pos, i in enumerate(order):
        r = got[i]
        assert r["global_pos"] == pos
        assert r["shard_id"] == pos % B88_SHARDS
        assert r["pos_in_shard"] == pos // B88_SHARDS


@given(texts=st.lists(DOC_TEXT, min_size=0, max_size=8))
@SETTINGS
def test_span_removal_rewrite_matches_python(spark, texts):
    """b97 core == brute-force Python: keeper doc = min(doc_id) per
    duplicated 8-gram; non-keeper occurrences remove their interval
    union; clean_text is the kept tokens on single spaces."""
    from kafka_streams_sandbox_spark.operators.dedup import (
        B87_SPAN,
        span_removal_rewrite,
    )

    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(
        [(i, t, "en", "s", len(t)) for i, t in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    got = {r["doc_id"]: r for r in span_removal_rewrite(df).collect()}

    toks = {i: t.split() for i, t in rows}
    span_docs: dict[tuple, set] = {}
    for i, tk in toks.items():
        for p in range(len(tk) - B87_SPAN + 1):
            span_docs.setdefault(tuple(tk[p : p + B87_SPAN]), set()).add(i)
    assert set(got) == set(toks)
    for i, tk in toks.items():
        rm: set = set()
        for p in range(len(tk) - B87_SPAN + 1):
            d = span_docs[tuple(tk[p : p + B87_SPAN])]
            if len(d) >= 2 and i != min(d):
                rm.update(range(p, p + B87_SPAN))
        r = got[i]
        assert r["n_tokens"] == len(tk)
        assert r["removed_tokens"] == len(rm)
        assert r["kept_tokens"] == len(tk) - len(rm)
        assert r["clean_text"] == " ".join(
            t for j, t in enumerate(tk) if j not in rm
        )
