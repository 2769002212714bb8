"""Multimodal column plumbing: image/audio/video as opaque BINARY
columns with typed metadata, processed by Arrow-batched pandas UDFs.

The decode libraries (PIL/ffmpeg/etc.) are NOT in this container, so
the decode step is STUBBED: ``decode_image`` raises
NotImplementedError unless ``fake=True``, in which case a
deterministic byte-level fake stands in.  Everything Spark-side —
schema, batch shape, partitioning, UDF signatures — is real and
tested; swapping in a real decoder changes only the kernel body.
"""

from __future__ import annotations

import hashlib

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("kind", T.StringType()),        # image | audio | video
    T.StructField("payload", T.BinaryType()),     # opaque encoded bytes
    T.StructField("mime", T.StringType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("duration_ms", T.IntegerType()),
])

FEATURE_SCHEMA = (
    "media_id long, kind string, n_bytes int, sha string, "
    "features array<float>"
)


def decode_image(payload: bytes, *, fake: bool = False):
    """Stub for the real decoder (no image libs in this container)."""
    if not fake:
        raise NotImplementedError(
            "image decode requires PIL/libjpeg — not available in this "
            "container; pass fake=True for the deterministic stand-in"
        )
    # deterministic fake "pixels": repeatable bytes from the payload hash
    return hashlib.sha256(payload).digest()


def documents_as_media(documents: DataFrame) -> DataFrame:
    """Adapter: treat each document's text bytes as an opaque payload —
    gives the multimodal path a real distributed input to exercise."""
    return documents.select(
        F.col("doc_id").alias("media_id"),
        F.when(F.col("doc_id") % 3 == 0, "image")
        .when(F.col("doc_id") % 3 == 1, "audio")
        .otherwise("video").alias("kind"),
        F.encode("text", "utf-8").alias("payload"),
        F.lit("application/octet-stream").alias("mime"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        F.lit(None).cast("int").alias("duration_ms"),
    )


def extract_features(media: DataFrame, n_features: int = 16) -> DataFrame:
    """Feature extraction over binary payloads via mapInPandas.

    The feature kernel is the deterministic fake (normalized byte
    histogram of the decoded bytes); the Spark plumbing — Arrow batch
    iteration, column pruning to (media_id, kind, payload), output
    schema — is exactly what a real embedding extractor uses.
    """

    def run(batches):
        import numpy as np

        cols = ["media_id", "kind", "n_bytes", "sha", "features"]
        for pdf in batches:
            if not len(pdf):
                yield pd.DataFrame(columns=cols)
                continue
            payloads = [bytes(p) for p in pdf["payload"]]
            decoded = [decode_image(p, fake=True) for p in payloads]
            lens = {len(d) for d in decoded}
            if len(lens) == 1:
                # batched histogram (r9): the decoded buffers are
                # fixed-width, so all rows histogram in ONE bincount —
                # bin index (x·n)//256 equals np.histogram's uniform
                # left-closed bins for integer x ≤ 255 (the per-row
                # np.histogram calls dominated this operator)
                arr = np.frombuffer(b"".join(decoded), dtype=np.uint8)
                arr = arr.reshape(len(decoded), -1)
                idx = (arr.astype(np.int64) * n_features) // 256
                idx += np.arange(len(decoded))[:, None] * n_features
                hist = np.bincount(
                    idx.ravel(), minlength=len(decoded) * n_features
                ).reshape(len(decoded), n_features)
            else:  # a real decoder may emit variable-length buffers
                hist = np.stack([
                    np.histogram(np.frombuffer(d, dtype=np.uint8),
                                 bins=n_features, range=(0, 256))[0]
                    for d in decoded
                ])
            totals = hist.sum(axis=1).astype(np.float64)
            totals[totals == 0] = 1.0
            feats = (hist / totals[:, None]).astype("float32")
            yield pd.DataFrame({
                "media_id": pdf["media_id"].to_numpy(),
                "kind": pdf["kind"].to_numpy(),
                "n_bytes": np.fromiter((len(p) for p in payloads),
                                       dtype=np.int64, count=len(payloads)),
                "sha": [hashlib.sha256(p).hexdigest()[:16]
                        for p in payloads],
                "features": list(feats),
            })

    return media.select("media_id", "kind", "payload").mapInPandas(
        run, FEATURE_SCHEMA
    )


def frame_sample(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling plumbing: one output row per sampled frame
    timestamp (the decode itself is the stub).  Demonstrates the
    explode-shaped output contract of a real frame sampler."""
    video = media.filter(F.col("kind") == "video")
    # deterministic fake duration from payload size: 1 ms per byte
    dur = F.coalesce(F.col("duration_ms"), F.length("payload"))
    return video.select(
        "media_id",
        F.explode(F.sequence(F.lit(0), dur, F.lit(every_ms))).alias("frame_ts_ms"),
    )
