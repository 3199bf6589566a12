"""Multimodal (binary) column operators.

The driver corpus has no real image/audio bytes, so the binary column
is derived (utf-8 bytes of ``text``) — but everything Spark-side is
the real production shape: opaque ``binary`` payloads + typed
metadata, JVM-side byte ops where possible, and Arrow-batched
``mapInPandas`` for the decode path. The actual codec call is stubbed
(this container ships no PIL/ffmpeg): ``decode_image_batch`` raises
``NotImplementedError`` unless the deterministic fake decoder is
requested — the plumbing (schema, batch iteration, partition-size
independence) is what's tested.

Scale notes: binary payloads dominate row size, so the parquet layout
matters more than the compute — keep payloads in their own column
chunk (columnar pruning skips them when a query touches only
metadata), and bound ``spark.sql.files.maxPartitionBytes`` so a task's
batch of blobs fits executor memory. mapInPandas streams Arrow record
batches — it never materializes a whole partition of blobs at once.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)

from kafka_streams_sandbox_spark.catalog import table
from kafka_streams_sandbox_spark.registry import query


def with_blob(docs: DataFrame) -> DataFrame:
    """documents + synthetic binary payload column (utf-8 of text)."""
    return docs.withColumn("blob", F.encode("text", "utf-8"))


# ---------------------------------------------------------------------------
# Metadata extraction over binary columns (oracle-checked: byte math
# is engine-independent)
# ---------------------------------------------------------------------------
B36_ORACLE = """
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           md5(text) AS content_hash,
           substring(lower(hex(encode(text))), 1, 16) AS magic_prefix,
           CAST(64 + (octet_length(encode(text)) % 64) * 16 AS INTEGER) AS fake_width,
           CAST(64 + (octet_length(encode(text)) % 48) * 16 AS INTEGER) AS fake_height
    FROM documents
"""


@query("b36_multimodal_metadata", oracle=B36_ORACLE)
def b36_multimodal_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed metadata over an opaque blob column: size, content hash,
    magic-byte prefix, and (deterministically fake) decoded
    dimensions. All JVM byte ops — the common 'catalog the corpus
    without decoding it' pass."""
    docs = with_blob(table(spark, sf_dir, "documents"))
    n_bytes = F.length("blob").cast("bigint")
    return docs.select(
        "doc_id",
        n_bytes.alias("n_bytes"),
        F.md5("blob").alias("content_hash"),
        F.substring(F.lower(F.hex("blob")), 1, 16).alias("magic_prefix"),
        (64 + (n_bytes % 64) * 16).cast("int").alias("fake_width"),
        (64 + (n_bytes % 48) * 16).cast("int").alias("fake_height"),
    )


# ---------------------------------------------------------------------------
# Decode / feature-extract via Arrow-batched mapInPandas (rows-only)
# ---------------------------------------------------------------------------
DECODE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_pixels", LongType()),
        StructField("mean_luma", DoubleType()),
    ]
)


def decode_image_batch(blob: bytes, fake: bool = True) -> dict[str, Any]:
    """Decode one image payload.

    A real deployment plugs PIL/turbojpeg in here; this container has
    no codec libs, so only the deterministic fake path is available.
    """
    if not fake:
        raise NotImplementedError(
            "real image decoding needs PIL/libjpeg, not present in this "
            "container; use fake=True (deterministic stub)"
        )
    width = 64 + (len(blob) % 64) * 16
    height = 64 + (len(blob) % 48) * 16
    # "luma" = mean byte value; deterministic and cheap.
    mean = (sum(blob) / len(blob)) if blob else 0.0
    return {
        "width": width,
        "height": height,
        "n_pixels": width * height,
        "mean_luma": mean,
    }


@query("b37_image_decode_stub")  # rows-only: stubbed codec, no SQL twin
def b37_image_decode_stub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInPandas decode pipeline: Arrow batches of (doc_id, blob) in,
    typed feature rows out. Batch-at-a-time so a partition of large
    blobs never lives in memory at once."""
    docs = with_blob(table(spark, sf_dir, "documents")).select("doc_id", "blob")

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):  # empty batch: pd.DataFrame([]) would
                continue  # drop the schema's columns (b86's r4 lesson)
            # NULL blob (e.g. NULL text upstream) decodes as an empty
            # payload rather than crashing the whole partition
            feats = [
                decode_image_batch(b if b is not None else b"")
                for b in pdf["blob"]
            ]
            out = pd.DataFrame(feats)
            out.insert(0, "doc_id", pdf["doc_id"].values)
            yield out

    return docs.mapInPandas(decode, DECODE_SCHEMA)


# ---------------------------------------------------------------------------
# Frame sampling over "video" payloads (rows-only)
# ---------------------------------------------------------------------------
FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("frame_bytes", BinaryType()),
        StructField("frame_hash", LongType()),
    ]
)

_FRAME_SIZE = 64
_FRAME_STRIDE = 4  # sample every 4th frame


@query("b38_frame_sample")  # rows-only: byte-chunk framing, no SQL twin
def b38_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Treat each blob as a frame stream (fixed 64-byte 'frames'),
    sample every 4th frame. One row in -> many rows out via
    mapInPandas — the video-sampling shape (ffmpeg replaces the
    slicing in production; partitioning/batching is identical)."""
    docs = with_blob(table(spark, sf_dir, "documents")).select("doc_id", "blob")

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import zlib

        for pdf in batches:
            if not len(pdf):  # empty batch: see b37
                continue
            rows = []
            for doc_id, blob in zip(pdf["doc_id"], pdf["blob"]):
                blob = blob if blob is not None else b""  # NULL payload
                n_frames = max(len(blob) // _FRAME_SIZE, 1)
                for idx in range(0, n_frames, _FRAME_STRIDE):
                    frame = bytes(blob[idx * _FRAME_SIZE : (idx + 1) * _FRAME_SIZE])
                    rows.append(
                        {
                            "doc_id": doc_id,
                            "frame_idx": idx,
                            "frame_bytes": frame,
                            "frame_hash": zlib.crc32(frame),
                        }
                    )
            yield pd.DataFrame(rows)

    return docs.mapInPandas(sample, FRAME_SCHEMA)


# ---------------------------------------------------------------------------
# Audio feature extraction over "audio" payloads (rows-only)
# ---------------------------------------------------------------------------
AUDIO_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_samples", LongType()),
        StructField("duration_s", DoubleType()),
        StructField("rms", DoubleType()),
        StructField("peak", IntegerType()),
        StructField("n_windows", IntegerType()),
    ]
)

_SAMPLE_RATE = 16_000  # fake PCM interpretation of the blob bytes
_WINDOW = 400  # 25 ms at 16 kHz


@query("b49_audio_features")  # rows-only: stubbed codec, no SQL twin
def b49_audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio feature extraction: interpret each blob as 8-bit PCM and
    compute duration/RMS/peak/window counts per clip via numpy over
    Arrow batches. A real deployment swaps the byte view for an
    ffmpeg/soundfile decode — the Spark plumbing (schema, batching,
    per-clip vectorized math) is exactly this."""
    import numpy as np

    docs = with_blob(table(spark, sf_dir, "documents")).select("doc_id", "blob")

    def features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):  # empty batch: see b37
                continue
            rows = []
            for doc_id, blob in zip(pdf["doc_id"], pdf["blob"]):
                blob = blob if blob is not None else b""  # NULL payload
                pcm = np.frombuffer(bytes(blob), dtype=np.uint8).astype(
                    np.float64
                ) - 128.0
                n = len(pcm)
                rows.append(
                    {
                        "doc_id": doc_id,
                        "n_samples": n,
                        "duration_s": round(n / _SAMPLE_RATE, 6),
                        "rms": round(float(np.sqrt(np.mean(pcm**2))), 6)
                        if n
                        else 0.0,
                        "peak": int(np.abs(pcm).max()) if n else 0,
                        "n_windows": max((n + _WINDOW - 1) // _WINDOW, 0),
                    }
                )
            yield pd.DataFrame(rows)

    return docs.mapInPandas(features, AUDIO_SCHEMA)


# ---------------------------------------------------------------------------
# Perceptual-hash (dHash) image near-dup (rows-only)
# ---------------------------------------------------------------------------
PHASH_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("phash", LongType()),
    ]
)

_PHASH_BANDS = 4  # 4 x 16-bit chunks; Hamming<=k collides on >=1 band
_PHASH_MAX_HAMMING = 6


def phash_batch(blob: bytes) -> int:
    """dHash over the deterministic fake decode: average-pool the byte
    stream into an 8x9 grayscale grid, then emit one bit per adjacent
    horizontal cell comparison (64 bits). A real deployment decodes
    with PIL and resizes to 9x8 — the pooling/bit-packing below is
    byte-for-byte the same after that point.

    Vectorized per payload: cell sums via ``np.add.reduceat`` over
    proportional boundaries (no 72 tiny allocations), bits packed with
    ``np.packbits`` — ~20x the naive array_split/int-loop form, which
    matters because this kernel runs once per corpus row."""
    import numpy as np

    buf = np.frombuffer(bytes(blob), dtype=np.uint8)
    if buf.size < 72:  # tiny payload: tile up to one cell per byte
        buf = np.resize(buf if buf.size else np.zeros(1, np.uint8), 72)
    n = buf.size
    bounds = np.arange(73, dtype=np.int64) * n // 72
    sums = np.add.reduceat(buf.astype(np.int64), bounds[:-1])
    cells = sums / np.diff(bounds)
    grid = cells.reshape(8, 9)
    bits = (grid[:, :8] > grid[:, 1:]).ravel()
    h = int.from_bytes(np.packbits(bits).tobytes(), "big")
    # wrap to signed 64-bit (Spark LongType)
    return h - (1 << 64) if h >= (1 << 63) else h


def phash_hashes(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Batch-vectorized :func:`phash_batch` — b86's mapInPandas kernel.

    All payloads of an Arrow batch concatenate into ONE buffer, every
    doc's 72 proportional cell boundaries offset into it, and a single
    np.add.reduceat + packbits computes every hash — no per-row Python
    loop. The big-endian signed view reproduces phash_batch's
    int.from_bytes(..., "big") + signed wrap bit-for-bit (equality
    pinned by tests/test_multimodal.py). Module-level so tests drive
    it directly with a pandas frame.
    """
    import numpy as np

    for pdf in batches:
        if pdf.empty:  # defensive: direct test callers may pass one
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series([], dtype="int64"),
                    "phash": pd.Series([], dtype="int64"),
                }
            )
            continue
        blobs = [np.frombuffer(bytes(b), np.uint8) for b in pdf["blob"]]
        blobs = [
            np.resize(b if b.size else np.zeros(1, np.uint8), 72)
            if b.size < 72
            else b
            for b in blobs
        ]
        lens = np.array([b.size for b in blobs], np.int64)
        buf = np.concatenate(blobs).astype(np.int64)
        starts = np.concatenate(([0], np.cumsum(lens)))[:-1]
        cell = (np.arange(73, dtype=np.int64)[None, :] * lens[:, None]) // 72
        bounds = cell + starts[:, None]  # (n, 73), strictly increasing
        sums = np.add.reduceat(buf, bounds[:, :-1].ravel())
        widths = np.diff(bounds, axis=1).ravel()
        cells = (sums / widths).reshape(-1, 8, 9)
        bits = (cells[:, :, :8] > cells[:, :, 1:]).reshape(-1, 64)
        packed = np.packbits(bits, axis=1)  # (n, 8) big-endian rows
        ph = np.frombuffer(packed.tobytes(), dtype=">i8").astype(np.int64)
        yield pd.DataFrame({"doc_id": pdf["doc_id"].values, "phash": ph})


@query("b86_phash_neardup")  # rows-only: stubbed codec feeds the hash
def b86_phash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image near-dup via perceptual hash: the multimodal sibling of
    b28 (SimHash/text) and b39_lsh (embeddings). Arrow-batched
    mapInPandas computes one 64-bit dHash per payload; everything
    after is JVM-side: the hash splits into 4 16-bit bands, candidate
    pairs collide on >=1 band (pigeonhole: Hamming<=3 cannot flip a
    bit in all 4 bands, so recall is GUARANTEED there; pairs at
    Hamming 4-6 are best-effort — caught unless their differing bits
    spread across every band — the standard banding recall trade,
    same as b28's text SimHash), and the verify step is
    bit_count(xor) <= 6 — never an all-pairs comparison.

    Scale: candidates are bounded by band-bucket sizes (hash bits are
    balanced by construction), the verify join is band-bucket-local,
    and the blob column never crosses a shuffle — only (doc_id, 64-bit
    hash) rows do.
    """
    docs = with_blob(table(spark, sf_dir, "documents")).select("doc_id", "blob")
    sigs = docs.mapInPandas(phash_hashes, PHASH_SCHEMA)
    bands = sigs.select(
        "doc_id",
        "phash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band"),
                        F.shiftrightunsigned(F.col("phash"), i * 16)
                        .bitwiseAND(F.lit(0xFFFF))
                        .alias("chunk"),
                    )
                    for i in range(_PHASH_BANDS)
                ]
            )
        ).alias("bc"),
    ).select("doc_id", "phash", "bc.band", "bc.chunk")
    a = bands.select(
        F.col("doc_id").alias("doc_a"),
        F.col("phash").alias("ha"),
        "band",
        "chunk",
    )
    b = bands.select(
        F.col("doc_id").alias("doc_b"),
        F.col("phash").alias("hb"),
        "band",
        "chunk",
    )
    pairs = (
        a.join(b, ["band", "chunk"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", "ha", "hb")
        .distinct()  # a pair may collide on several bands
        .withColumn(
            "hamming",
            F.bit_count(
                F.col("ha").bitwiseXOR(F.col("hb"))
            ).cast("int"),
        )
        .filter(F.col("hamming") <= _PHASH_MAX_HAMMING)
    )
    return pairs.select("doc_a", "doc_b", "hamming")
