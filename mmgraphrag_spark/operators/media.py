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


def recompress_to_size(
    encode_fn,
    target_size_bytes: int = 5 * 1024 * 1024,
    initial_quality: int = 85,
    step: int = 5,
    min_quality: int = 10,
):
    """P23 (reference preprocessing.py:265-297 compress_image_to_size): step
    the encode quality down until the output fits ``target_size_bytes``.

    ``encode_fn(quality) -> bytes`` is the codec seam — PIL JPEG in
    production (``pil_jpeg_encoder``), any deterministic encoder in tests.
    Returns (bytes, quality, fits) where ``fits`` is False when even
    ``min_quality`` could not reach the target (the reference logs a warning
    and keeps the smallest output; so do we)."""
    q = initial_quality
    data = encode_fn(q)
    while len(data) > target_size_bytes and q - step >= min_quality:
        q -= step
        data = encode_fn(q)
    return data, q, len(data) <= target_size_bytes


def pil_jpeg_encoder(content: bytes):
    """PIL-backed ``encode_fn`` factory for recompress_to_size: decodes
    ``content``, converts to RGB (the reference's JPG pipeline) and re-encodes
    at the requested quality. Raises ImportError when Pillow is absent (this
    container) — callers fall back to passing media through unchanged."""
    import io

    from PIL import Image  # gated import

    img = Image.open(io.BytesIO(content)).convert("RGB")

    def encode(quality: int) -> bytes:
        buf = io.BytesIO()
        img.save(buf, format="JPEG", quality=quality)
        return buf.getvalue()

    return encode


def recompress_media(
    media: DataFrame, target_size_bytes: int = 5 * 1024 * 1024
) -> DataFrame:
    """P23 over a media table: rows above the target re-encode through the
    quality loop (PIL when available; pass-through otherwise — the loop logic
    itself is tested against a fake codec). Only over-sized rows cross into
    Python; the common case stays a JVM filter."""
    # null-safe split: F.length(NULL) is NULL and would fail BOTH branches,
    # silently dropping rows with missing content — keep them on the
    # pass-through side instead
    small = media.filter(
        F.col("content").isNull() | (F.length("content") <= target_size_bytes)
    )
    big = media.filter(F.length("content") > target_size_bytes)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_content = []
            for content in pdf["content"]:
                try:
                    enc = pil_jpeg_encoder(bytes(content))
                    data, _, _ = recompress_to_size(enc, target_size_bytes)
                    out_content.append(data)
                except Exception:
                    # no PIL, OR an undecodable/corrupt blob (PDF XObjects are
                    # not always valid images): keep the original bytes — the
                    # reference logs a warning and keeps the file; one bad
                    # blob must never fail the whole job
                    out_content.append(bytes(content))
            pdf = pdf.copy()
            pdf["content"] = out_content
            yield pdf

    n_parts = media.sparkSession.sparkContext.defaultParallelism
    schema = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in media.schema)
    return small.unionByName(
        big.repartition(n_parts, "media_ref").mapInPandas(run, schema)
    )


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
    payload), mime alternating image/video by the first md5 byte of the ref
    (md5 rather than crc32 so an ANSI-SQL oracle can reproduce the rule)."""
    spans = documents.select(F.explode("spans").alias("s")).filter(
        F.col("s.kind") != "text"
    )
    first_md5_byte = F.conv(
        F.substring(F.md5(F.col("s.media_ref")), 1, 2), 16, 10
    ).cast("int")
    return spans.select(
        F.col("s.media_ref").alias("media_ref"),
        F.when(first_md5_byte % 4 == 0, F.lit("video/mp4"))
        .otherwise(F.lit("image/jpeg")).alias("mime"),
        F.encode(F.col("s.media_ref"), "utf-8").alias("content"),
        F.length(F.col("s.media_ref")).cast("long").alias("n_bytes"),
    ).distinct()
