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
   (``doc_id DIV ceil((max_id+1)/P)`` — no sampling, so every job
   over the plan sees identical bucket boundaries);
2. per-bucket token totals — a P-row aggregate collected to the
   driver (bounded by the bucket count, NOT the data: P ~ thousands
   on a real cluster) and turned into exclusive bucket offsets;
3. a per-bucket cumulative window (P-way parallel) plus the broadcast
   bucket offset reconstructs the exact global prefix sum.

Every phase is built-in JVM expressions; the only driver-side data is
the P-row offset table.
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


@query("b82_context_packing", oracle=B82_ORACLE)
def b82_context_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Assign every document to a fixed token-budget pack and report
    per-pack fill stats (doc count, token total, doc_id range).

    Two-phase distributed prefix sum over doc_id order — see the
    module docstring for why the single-partition global window is
    rejected. The bucket count tracks the session's shuffle
    parallelism so the cumulative windows use every core.
    """
    docs = table(spark, sf_dir, "documents").select(
        "doc_id",
        F.expr(f"size({TOKENS_EXPR})").cast("long").alias("n_tokens"),
    )

    n_buckets = int(spark.conf.get("spark.sql.shuffle.partitions"))
    # Deterministic contiguous buckets: DIV by a fixed span derived
    # from max(doc_id). One tiny agg job; at scale this is metadata
    # (or the table's known id range).
    max_id = docs.agg(F.max("doc_id").alias("m")).collect()[0]["m"]
    span = max(1, (int(max_id) + n_buckets) // n_buckets)
    bucketed = docs.withColumn("bucket", (F.col("doc_id") / span).cast("long"))

    # Phase 1: per-bucket totals -> exclusive offsets. Bounded by the
    # bucket count (parallelism, not data size).
    totals = {
        r["bucket"]: r["tot"]
        for r in bucketed.groupBy("bucket")
        .agg(F.sum("n_tokens").alias("tot"))
        .collect()
    }
    offsets, running = [], 0
    for b in sorted(totals):
        offsets.append((b, running))
        running += int(totals[b])
    offsets_df = F.broadcast(
        spark.createDataFrame(offsets, "bucket long, bucket_offset long")
    )

    # Phase 2: per-bucket cumulative window (P-way parallel) + offset
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
            "pack_id",
            F.floor(F.col("prior") / F.lit(PACK_BUDGET)).cast("long"),
        )
    )
    return prior.groupBy("pack_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("pack_tokens"),
        F.min("doc_id").alias("first_doc"),
        F.max("doc_id").alias("last_doc"),
    )
