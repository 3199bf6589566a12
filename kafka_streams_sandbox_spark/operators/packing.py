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
