"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images / audio / video ride through the pipeline as ``binary`` columns
with metadata structs; decode and feature extraction run as Arrow-batched
``mapInPandas`` stages. The decode step itself is STUBBED (no image/audio
codecs in this environment — see ``decode_image``): the Spark-side
plumbing — schema, batch iteration, partitioning — is real and tested,
and a deterministic byte-level feature extractor stands in for a model.

At 100 TB: binary payloads dominate I/O, so (a) keep them in their own
column to let column pruning skip them for metadata-only queries,
(b) size ``spark.sql.files.maxPartitionBytes`` for payload-sized rows,
(c) run extractors as mapInPandas with modest ``maxRecordsPerBatch`` so
Arrow batches fit executor memory.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

N_BYTE_FEATURES = 8

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("features", T.ArrayType(T.DoubleType())),
    ]
)


def attach_binary_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Demo payload builder: utf-8 bytes of the text column as the opaque
    binary payload plus typed metadata (real pipelines read the bytes
    from object storage)."""
    return df.withColumn("payload", F.encode(F.col(text_col), "utf-8")).withColumn(
        "meta",
        F.struct(
            F.length(F.col("payload")).alias("n_bytes"),
            F.lit("text/plain").alias("mime"),
        ),
    )


def decode_image(payload: bytes) -> "object":
    """STUB: image decode requires codec libraries not present in this
    environment. The mapInPandas plumbing around it is real."""
    raise NotImplementedError(
        "image decode requires PIL/libjpeg — not available in this environment"
    )


def _byte_histogram_features(payload: bytes) -> list[float]:
    """Deterministic stand-in for a learned feature extractor: normalized
    8-bucket byte histogram."""
    counts = [0] * N_BYTE_FEATURES
    for b in payload:
        counts[b % N_BYTE_FEATURES] += 1
    total = float(len(payload)) or 1.0
    return [c / total for c in counts]


def resize_image(payload: bytes, width: int, height: int) -> bytes:
    """STUB: image resize requires codec libraries not present in this
    environment; the mapInPandas plumbing that would host it mirrors
    :func:`extract_features`."""
    raise NotImplementedError(
        "image resize requires PIL/libvips — not available in this environment"
    )


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame_sig", T.LongType()),
    ]
)

_SIG_MOD = 1_000_000_007


def attach_video_meta(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Demo video metadata: deterministic frame count derived from the
    payload size (real pipelines carry container metadata alongside the
    bytes)."""
    return df.withColumn(
        "video_meta",
        F.struct(
            (F.length("payload") % 240 + 16).cast("int").alias("n_frames"),
            F.lit(24.0).alias("fps"),
            F.lit("video/fake").alias("mime"),
        ),
    )


def sample_frames(
    df: DataFrame, stride: int = 8, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """Arrow-batched frame sampling: every ``stride``-th frame index of
    each video, one output row per sampled frame.

    The frame *decode* is a deterministic fake (payload-hash x index
    signature — a real decoder slots into the same loop); the Spark
    plumbing is real: mapInPandas fan-out rows-per-input-row, fixed
    output schema, pruned input columns.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, sigs = [], [], []
            for doc_id, payload, n_frames in zip(
                pdf[id_col], pdf[payload_col], pdf["n_frames"]
            ):
                h = 0
                for b in payload:
                    h = (h * 31 + b) % _SIG_MOD
                for i in range(0, int(n_frames), stride):
                    ids.append(doc_id)
                    idxs.append(i)
                    sigs.append((h * 31 + i) % _SIG_MOD)
            yield pd.DataFrame(
                {"doc_id": ids, "frame_idx": pd.array(idxs, dtype="int32"),
                 "frame_sig": pd.array(sigs, dtype="int64")}
            )

    pruned = df.select(id_col, payload_col, F.col("video_meta.n_frames").alias("n_frames"))
    return pruned.mapInPandas(run, FRAME_SCHEMA)


def extract_features(df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload") -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    mapInPandas: each Arrow batch arrives as a pandas DataFrame; the
    extractor runs per-row inside the batch and emits fixed-width
    feature vectors. Swap ``_byte_histogram_features`` for a real model
    without touching the Spark plumbing.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "n_bytes": pdf[payload_col].map(len).astype("int32"),
                    "features": pdf[payload_col].map(_byte_histogram_features),
                }
            )

    return df.select(id_col, payload_col).mapInPandas(run, FEATURE_SCHEMA)
