"""Multimodal binary-column operators: decode / feature-extract / resize /
frame-sample plumbing over opaque ``binary`` media columns.

Image/audio/video libraries are not available in this container (SURVEY.md
build constraints), so the *decode* step is a pluggable backend: the real one
raises NotImplementedError with the exact production recipe, while
``DeterministicMediaBackend`` produces seeded fake outputs of the right shape
so the Spark-side plumbing — schema, partitioning, mapInPandas signature,
Arrow batch shape — is fully real and tested.

Media tables at scale: (media_ref string, mime string, content binary, meta
struct). content is stored inline for small media / as object-store refs for
large; either way the decode UDF sees Arrow batches of bytes. Partitioning:
hash by media_ref (never by mime — mime is low-cardinality and would skew)."""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA = T.StructType(
    [
        T.StructField("media_ref", T.StringType(), False),
        T.StructField("mime", T.StringType(), False),
        T.StructField("content", T.BinaryType(), True),
        T.StructField("n_bytes", T.LongType(), False),
    ]
)

FEATURES_SCHEMA = (
    "media_ref string, mime string, width int, height int, n_frames int, "
    "feature array<float>"
)


class DeterministicMediaBackend:
    """Seeded fake decoder: dimensions and a feature vector derived from
    md5(content) — deterministic, library-free, same batch shape as a real
    PIL/ffmpeg backend."""

    def __init__(self, feature_dim: int = 16):
        self.feature_dim = feature_dim

    def decode_batches(self, it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {
                "media_ref": [], "mime": [], "width": [], "height": [],
                "n_frames": [], "feature": [],
            }
            for ref, mime, content in zip(
                pdf["media_ref"], pdf["mime"], pdf["content"]
            ):
                digest = hashlib.md5(bytes(content or b"")).digest()
                rng = np.frombuffer(digest, dtype=np.uint8).astype(np.float32)
                out["media_ref"].append(ref)
                out["mime"].append(mime)
                out["width"].append(int(64 + digest[0]))
                out["height"].append(int(64 + digest[1]))
                out["n_frames"].append(
                    int(1 + digest[2] % 32) if str(mime).startswith("video") else 1
                )
                feat = np.resize(rng, self.feature_dim) / 255.0
                out["feature"].append(feat.tolist())
            yield pd.DataFrame(out)


class PillowFfmpegBackend:
    """Production decode backend (image via PIL, audio/video via ffmpeg).

    Not runnable here: the container ships neither Pillow nor ffmpeg. The
    production recipe: PIL.Image.open(BytesIO(content)) -> size/resize;
    ffmpeg -i pipe: -vf fps=1 for frame sampling; embedding model for
    features. Batch shape identical to DeterministicMediaBackend."""

    def decode_batches(self, it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        raise NotImplementedError(
            "PillowFfmpegBackend requires Pillow/ffmpeg; use "
            "DeterministicMediaBackend in this environment"
        )


def media_features(media: DataFrame, backend=None) -> DataFrame:
    """media table -> decoded metadata + feature vector via Arrow-batched
    mapInPandas. Column pruning matters at scale: select only
    (media_ref, mime, content) before the UDF so parquet never reads extras."""
    backend = backend or DeterministicMediaBackend()
    return media.select("media_ref", "mime", "content").mapInPandas(
        backend.decode_batches, FEATURES_SCHEMA
    )


def sample_frames(features: DataFrame, every_n: int = 4) -> DataFrame:
    """Frame-sampling plan: one row per sampled frame index (JVM-side explode
    of a sequence — the real decoder would attach frame bytes here)."""
    return features.select(
        "media_ref",
        F.explode(
            F.sequence(F.lit(0), F.greatest(F.col("n_frames") - 1, F.lit(0)), F.lit(every_n))
        ).alias("frame_index"),
    )


def synth_media_table(spark, documents: DataFrame) -> DataFrame:
    """Build a deterministic media table from the interleaved documents'
    media spans: content = utf-8 bytes of the media_ref (a stable fake
    payload), mime alternating image/video by ref hash."""
    spans = documents.select(F.explode("spans").alias("s")).filter(
        F.col("s.kind") != "text"
    )
    return spans.select(
        F.col("s.media_ref").alias("media_ref"),
        F.when(
            F.crc32(F.col("s.media_ref")) % 4 == 0, F.lit("video/mp4")
        ).otherwise(F.lit("image/jpeg")).alias("mime"),
        F.encode(F.col("s.media_ref"), "utf-8").alias("content"),
        F.length(F.col("s.media_ref")).cast("long").alias("n_bytes"),
    ).distinct()
