"""Context-window packing: deterministic token-budget shard assignment.

The step between a curated corpus and a training run: documents are
laid out in a stable order (doc_id) and cut into fixed token-budget
packs (context windows / output shards). ``pack_id = floor(exclusive
prefix-sum of tokens / budget)`` — the streaming-fill policy where a
document straddling a boundary belongs to the pack it started in.

Reference parity note: the reference sandbox (KStreamsToKTable.java)
has no packing layer; this is part of the mandated "operations a
large-scale training-data pipeline would need".

Scale design — the whole point of this operator: a naive
``SUM() OVER (ORDER BY doc_id)`` global-order window collapses to ONE
partition (Spark warns: "No Partition Defined for Window operation"),
which is a non-starter at 100 TB. Instead the prefix sum is computed
in the classic two-phase distributed form:

1. bucket each doc into a deterministic contiguous doc_id range
   (``doc_id DIV span`` — a constant, no sampling, so every stage
   sees identical bucket boundaries);
2. per-bucket token totals — an aggregate with one row per bucket —
   cumsum'd into exclusive bucket offsets by a window over that
   BOUNDED totals table (work scales with bucket count, not rows);
3. a per-bucket cumulative window (bucket-parallel) plus the
   broadcast bucket offset reconstructs the exact global prefix sum.

Every phase is built-in JVM expressions in ONE action — no driver
collect, no sampling, no corpus-sized single-partition stage.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kafka_streams_sandbox_spark.catalog import table
from kafka_streams_sandbox_spark.functions.tokens import TOKENS_EXPR
from kafka_streams_sandbox_spark.registry import query

PACK_BUDGET = 256  # tokens per pack; docs average ~25 tokens


B82_ORACLE = f"""
    WITH t AS (
        SELECT doc_id,
               len(list_filter(regexp_split_to_array(trim(text), '\\s+'),
                               x -> x != '')) AS n_tokens
        FROM documents
    ),
    c AS (
        SELECT doc_id, n_tokens,
               COALESCE(SUM(n_tokens) OVER (
                   ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
               ), 0) AS prior
        FROM t
    )
    SELECT CAST(prior // {PACK_BUDGET} AS BIGINT) AS pack_id,
           COUNT(*) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS pack_tokens,
           MIN(doc_id) AS first_doc,
           MAX(doc_id) AS last_doc
    FROM c
    GROUP BY pack_id
"""


# Docs per bucket. A tunable span constant, not a data probe: bucket
# count = max_doc_id / span, so the bounded offset-cumsum window sees
# one row per bucket (N/4096 rows — at 1e10 docs that's 2.4M tiny
# rows through one task, still trivial; retune span ~ N/P for a
# specific deployment, it changes no semantics).
BUCKET_SPAN = 4096


@query("b82_context_packing", oracle=B82_ORACLE)
def b82_context_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Assign every document to a fixed token-budget pack and report
    per-pack fill stats (doc count, token total, doc_id range).

    Two-phase distributed prefix sum over doc_id order — see the
    module docstring for why the single-partition global window is
    rejected. Fully declarative single-action form: bucket totals are
    a per-bucket aggregate; their exclusive running sum (the bucket
    offsets) is a window over the BUCKET-COUNT-sized totals table
    (bounded single partition, the b80 discipline — constant work per
    bucket, not per row); offsets broadcast-join back to the corpus.
    No driver-side collect anywhere.
    """
    docs = table(spark, sf_dir, "documents").select(
        "doc_id",
        F.expr(f"size({TOKENS_EXPR})").cast("long").alias("n_tokens"),
    )
    bucketed = docs.withColumn(
        # integer DIV, not double /: identical here, but the double
        # path drifts from DIV semantics past 2^53 doc_ids
        "bucket", F.expr(f"doc_id DIV {BUCKET_SPAN}")
    )

    # Phase 1: per-bucket totals -> exclusive offsets via a cumsum
    # window over the totals table (|buckets| rows, bounded).
    ow = (
        Window.orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets_df = F.broadcast(
        bucketed.groupBy("bucket")
        .agg(F.sum("n_tokens").alias("_tot"))
        .withColumn(
            "bucket_offset", F.coalesce(F.sum("_tot").over(ow), F.lit(0))
        )
        .drop("_tot")
    )

    # Phase 2: per-bucket cumulative window (bucket-parallel) + offset
    # = exact global exclusive prefix sum.
    w = (
        Window.partitionBy("bucket")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prior = (
        bucketed.join(offsets_df, "bucket")
        .withColumn(
            "prior",
            F.col("bucket_offset")
            + F.coalesce(F.sum("n_tokens").over(w), F.lit(0)),
        )
        .withColumn(
            # integer DIV, same rationale as the bucket id above: the
            # double path drifts from exact floor-division once the
            # cumulative token total passes 2^53
            "pack_id",
            F.expr(f"prior DIV {PACK_BUDGET}"),
        )
    )
    return prior.groupBy("pack_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("pack_tokens"),
        F.min("doc_id").alias("first_doc"),
        F.max("doc_id").alias("last_doc"),
    )


# ---------------------------------------------------------------------------
# b88: deterministic training-data global shuffle -> balanced shards
# ---------------------------------------------------------------------------
# The other half of the corpus->training-run layout (b82 packs in
# doc_id order; training additionally needs the ORDER randomized and
# cut into equal shards). Seeded shuffle = total order by
# md5('shard:' || doc_id) — reproducible on any cluster size, stable
# under appends of new doc_ids, no RNG state. Round-robin over the
# global rank makes shard sizes EXACTLY balanced (differ by <= 1),
# which binomial hash-mod sharding cannot guarantee.
B88_SHARDS = 16

# Width of the hex prefix that forms b88's range buckets: W chars =
# 16^W buckets, each ranked by one task. 1 char (16 buckets) matches
# the local[32] test harness; at real scale set KSS_B88_BUCKET_HEX=2
# (256 buckets) or 3-4 to match cluster parallelism — bucket count
# changes NO semantics (hex prefixes are ranges of the sort order, so
# global_pos is identical at any width; tests sweep widths to pin
# that). The env knob exists so deployments/sweeps need no code edit —
# the same fixed-configuration trap class b34 documents.
B88_BUCKET_HEX_CHARS = int(os.environ.get("KSS_B88_BUCKET_HEX", "1"))

B88_ORACLE = f"""
    WITH k AS (
        SELECT doc_id,
               md5('shard:' || CAST(doc_id AS VARCHAR)) AS sort_key
        FROM documents
    )
    SELECT doc_id, sort_key,
           CAST(grank - 1 AS BIGINT) AS global_pos,
           CAST((grank - 1) % {B88_SHARDS} AS BIGINT) AS shard_id,
           CAST((grank - 1) // {B88_SHARDS} AS BIGINT) AS pos_in_shard
    FROM (SELECT doc_id, sort_key,
                 ROW_NUMBER() OVER (ORDER BY sort_key, doc_id) AS grank
          FROM k)
"""


@query("b88_shard_shuffle", oracle=B88_ORACLE)
def b88_shard_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global shuffle + exactly-balanced shard layout:
    every doc gets (global_pos, shard_id, pos_in_shard) under the
    md5-keyed pseudo-random total order.

    The oracle's ROW_NUMBER() OVER (ORDER BY sort_key) is a
    single-partition global sort — a non-starter at 100 TB. The
    distributed form reuses b82's two-phase prefix pattern, keyed by
    the HASH ORDER instead of doc_id:

    1. bucket = first hex nibble of the sort key (16 range buckets of
       the key space — uniform by construction, since md5 output is
       uniform; no sampling needed, unlike RangePartitioner);
    2. per-bucket rank: ROW_NUMBER windows partitioned by bucket,
       ordered by (sort_key, doc_id) — bucket-parallel;
    3. bucket row-counts cumsum'd into exclusive offsets on the
       BOUNDED 16-row totals table, broadcast back:
       global_pos = bucket_offset + bucket_rank - 1.

    Hex-prefix buckets ARE ranges of the sort order (lexicographic on
    lowercase hex), so offset + in-bucket rank is the exact global
    rank. At real scale widen the prefix (2 hex chars = 256 buckets,
    4 = 65536) to match cluster parallelism — changes no semantics.
    Shard assignment is then pure arithmetic on global_pos: shard =
    pos % S (round-robin, sizes exact to +/-1), pos_in_shard =
    pos DIV S — each shard reads back in sort order.
    """
    return shard_layout(table(spark, sf_dir, "documents"))


def shard_layout(docs: DataFrame) -> DataFrame:
    """Core of b88 over any relation with a doc_id column — see
    b88_shard_shuffle for the design notes. Exposed so property tests
    can drive arbitrary in-memory corpora through the production
    lineage."""
    keyed = docs.select(
        "doc_id",
        F.md5(F.concat(F.lit("shard:"), F.col("doc_id").cast("string"))).alias(
            "sort_key"
        ),
    )
    bucketed = keyed.withColumn(
        "bucket", F.substring("sort_key", 1, B88_BUCKET_HEX_CHARS)
    )

    ow = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, -1)
    offsets_df = F.broadcast(
        bucketed.groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("_n"))
        .withColumn(
            "bucket_offset", F.coalesce(F.sum("_n").over(ow), F.lit(0))
        )
        .drop("_n")
    )

    w = Window.partitionBy("bucket").orderBy("sort_key", "doc_id")
    ranked = (
        bucketed.join(offsets_df, "bucket")
        .withColumn(
            "global_pos",
            (F.col("bucket_offset") + F.row_number().over(w) - 1).cast("long"),
        )
    )
    return ranked.select(
        "doc_id",
        "sort_key",
        "global_pos",
        (F.col("global_pos") % B88_SHARDS).cast("long").alias("shard_id"),
        F.expr(f"global_pos DIV {B88_SHARDS}").cast("long").alias("pos_in_shard"),
    )


@query("b89_shard_write_manifest")  # rows-only: a side-effecting sink
def b89_shard_write_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end training-shard SINK: provision a managed dataset
    location (a10's TopicAdmin DDL), write b88's shuffled layout as
    shard_id-partitioned parquet, then re-read the files and verify
    the layout contract before emitting the per-shard manifest.

    In-query contract checks (raised as RuntimeError, never `assert`,
    so `python -O` cannot strip them — a run that returns rows
    certifies them):
      - read-back row count == corpus count (nothing lost in the sink)
      - shard sizes exactly balanced (max - min <= 1, b88's guarantee)
      - pos_in_shard is a dense 0..n-1 sequence per shard (each shard
        replays in deterministic order)
      - the DDL manifest's declared partition count == shard count

    Scale: `repartition(shard_id) -> partitionBy(shard_id)` gives one
    writer task per shard and one directory per shard; at 100 TB use
    repartition(N, shard_id, pos_in_shard DIV chunk) plus
    maxRecordsPerFile so each shard becomes a bounded file chain. The
    manifest collect is 16 rows (shard count), not data-sized.
    """
    import shutil

    # streaming.ddl precedes this module in the registry's import
    # order, so this import can never reorder driver registration.
    from kafka_streams_sandbox_spark.streaming.ddl import TopicAdmin, TopicSpec

    admin = TopicAdmin()
    try:
        admin.create_topics([TopicSpec("training-shards", partitions=B88_SHARDS)])
        # contract checks raise real exceptions, not `assert`: asserts
        # are stripped under `python -O`, which would silently void the
        # "a run that returns rows certifies the layout" guarantee.
        if admin.describe("training-shards")["partitions"] != B88_SHARDS:
            raise RuntimeError("DDL manifest partition count != shard count")
        loc = admin.location("training-shards") + "/data"

        docs = table(spark, sf_dir, "documents").select(
            "doc_id", "lang", "n_chars"
        )
        layout = b88_shard_shuffle(spark, sf_dir).join(docs, "doc_id")
        (
            layout.repartition("shard_id")
            .write.partitionBy("shard_id")
            .mode("overwrite")
            .parquet(loc)
        )

        n_docs = docs.count()
        rows = []
        if n_docs:  # empty corpus writes no files -> nothing to read back
            rb = spark.read.parquet(loc)
            manifest = (
                rb.groupBy("shard_id")
                .agg(
                    F.count(F.lit(1)).alias("n_docs"),
                    F.sum("n_chars").cast("long").alias("total_chars"),
                    F.max("pos_in_shard").alias("_max_pos"),
                    F.count_distinct("pos_in_shard").alias("_n_pos"),
                )
                .orderBy("shard_id")
            )
            rows = manifest.collect()  # bounded: one row per shard
        if sum(r["n_docs"] for r in rows) != n_docs:
            raise RuntimeError("sink lost rows: read-back count != corpus count")
        sizes = [r["n_docs"] for r in rows] or [0]  # empty corpus: no shards
        if max(sizes) - min(sizes) > 1:
            raise RuntimeError(f"unbalanced shards {sizes}")
        for r in rows:
            if not (r["_n_pos"] == r["n_docs"] == r["_max_pos"] + 1):
                raise RuntimeError(
                    "pos_in_shard not dense in shard %d" % r["shard_id"]
                )
    finally:
        shutil.rmtree(admin.root, ignore_errors=True)
    return spark.createDataFrame(
        [(int(r["shard_id"]), int(r["n_docs"]), int(r["total_chars"])) for r in rows],
        "shard_id long, n_docs long, total_chars long",
    )
