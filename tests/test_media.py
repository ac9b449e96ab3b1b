"""Multimodal binary-column plumbing tests (decode stub, features, frames)."""

from __future__ import annotations

import pytest

from mmgraphrag_spark.operators import media as MD


def test_media_features_deterministic(spark, documents_df):
    media = MD.synth_media_table(spark, documents_df)
    assert media.count() > 0
    feats = MD.media_features(media)
    rows = feats.collect()
    assert all(len(r.feature) == 16 for r in rows)
    assert all(r.width >= 64 and r.height >= 64 for r in rows)
    # deterministic: same input -> same features
    again = {r.media_ref: r.feature for r in MD.media_features(media).collect()}
    assert all(again[r.media_ref] == r.feature for r in rows)
    # videos get multiple frames, images exactly one
    mimes = {r.media_ref: r.mime for r in rows}
    frames = {r.media_ref: r.n_frames for r in rows}
    for ref, mime in mimes.items():
        if mime == "image/jpeg":
            assert frames[ref] == 1
        else:
            assert frames[ref] >= 1


def test_sample_frames(spark, documents_df):
    media = MD.synth_media_table(spark, documents_df)
    feats = MD.media_features(media)
    sampled = MD.sample_frames(feats, every_n=4)
    per_ref = sampled.groupBy("media_ref").count().collect()
    assert all(r["count"] >= 1 for r in per_ref)


def test_production_backend_is_stubbed(spark, documents_df):
    media = MD.synth_media_table(spark, documents_df)
    with pytest.raises(Exception):
        MD.media_features(media, backend=MD.PillowFfmpegBackend()).collect()


def test_recompress_loop_quality_steps():
    """P23: the quality loop steps down until the target fits; the call
    sequence and the give-up path are deterministic."""
    from mmgraphrag_spark.operators.media import recompress_to_size

    calls = []

    def encode(q):
        calls.append(q)
        return b"x" * (q * 100)  # size proportional to quality

    data, q, fits = recompress_to_size(
        encode, target_size_bytes=5000, initial_quality=85, step=5
    )
    assert fits and q == 50 and len(data) == 5000
    assert calls == [85, 80, 75, 70, 65, 60, 55, 50]

    # even min quality can't fit -> keep smallest, report not-fitting
    data, q, fits = recompress_to_size(
        lambda q: b"y" * 10_000, target_size_bytes=100, initial_quality=20, step=5
    )
    assert not fits and q == 10 and len(data) == 10_000


def test_recompress_media_passthrough_without_pil(spark):
    """Without PIL the oversized row passes through unchanged; small rows
    never enter the python stage at all."""
    from mmgraphrag_spark.operators.media import recompress_media

    rows = [
        ("m1", "image/jpeg", b"a" * 10, 10),
        ("m2", "image/jpeg", b"b" * 500, 500),
    ]
    df = spark.createDataFrame(rows, ["media_ref", "mime", "content", "n_bytes"])
    out = {r.media_ref: bytes(r.content) for r in recompress_media(df, 100).collect()}
    assert out["m1"] == b"a" * 10
    try:
        import PIL  # noqa: F401

        has_pil = True
    except ImportError:
        has_pil = False
    if not has_pil:
        assert out["m2"] == b"b" * 500  # pass-through, not dropped
