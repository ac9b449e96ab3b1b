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
