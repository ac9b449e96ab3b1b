"""Degenerate-input hardening: empty corpus, text-only corpus, empty spans."""

from __future__ import annotations

from mmgraphrag_spark import schema
from mmgraphrag_spark.pipeline import run_pipeline


def test_text_only_corpus(spark):
    """No media spans -> no aliases, no IMG entities, text KG intact."""
    docs = spark.createDataFrame(
        [
            ("d1", [("text", "ENTITY_1 is a PERSON associated with topic_0. "
                              "ENTITY_1 RELATES_TO ENTITY_2 (w=4) regarding topic_0.",
                     "", 0)]),
        ],
        schema.DOCUMENTS,
    )
    out = run_pipeline(spark, docs)
    assert out["aliases"].count() == 0
    triples = {(r.subj, r.obj, r.weight) for r in out["triples"].collect()}
    assert triples == {('"ENTITY_1"', '"ENTITY_2"', 4.0)}
    ents = {r.entity_name: r.entity_type for r in out["entities"].collect()}
    assert ents == {'"ENTITY_1"': '"PERSON"', '"ENTITY_2"': '"UNKNOWN"'}


def test_empty_corpus(spark):
    docs = spark.createDataFrame([], schema.DOCUMENTS)
    out = run_pipeline(spark, docs)
    assert out["triples"].count() == 0
    assert out["entities"].count() == 0
    assert out["aliases"].count() == 0


def test_no_extractable_text(spark):
    """Text with no grammar patterns -> chunks exist, zero mentions."""
    docs = spark.createDataFrame(
        [("d1", [("text", "just ordinary words here", "", 0)])], schema.DOCUMENTS
    )
    out = run_pipeline(spark, docs)
    assert out["chunks"].count() == 1
    assert out["entities"].count() == 0
    assert out["triples"].count() == 0


def test_media_only_corpus(spark):
    """Docs with ONLY media spans: no chunks, no text mentions — the media
    path must not crash on an empty chunk-candidate join, and the scene
    entities still materialize."""
    docs = spark.createDataFrame(
        [("d1", [("image", "Figure: ENTITY_3.", "img://d1/0", 0)])],
        schema.DOCUMENTS,
    )
    out = run_pipeline(spark, docs)
    assert out["chunks"].count() == 0
    names = {r.entity_name for r in out["entities"].collect()}
    assert any("IMG_" in n for n in names)  # ORI_IMG node exists
    assert out["media_spans"].count() == 1
    # no chunk to associate -> chunk_id null, not a dropped row
    assert out["media_spans"].first().chunk_id is None


def test_pipeline_idempotent_rerun_same_triples(spark):
    """Same input twice -> identical triple sets (determinism at the output
    level, not just per-operator)."""
    docs = spark.createDataFrame(
        [
            ("d1", [("text", "ENTITY_1 is a PERSON associated with topic_0. "
                              "ENTITY_1 RELATES_TO ENTITY_2 (w=4) regarding topic_0.",
                     "", 0)]),
            ("d2", [("text", "ENTITY_2 is a GEO associated with topic_1. "
                              "ENTITY_2 RELATES_TO ENTITY_3 (w=2) regarding topic_1.",
                     "", 0)]),
        ],
        schema.DOCUMENTS,
    )
    t1 = {(r.subj, r.pred, r.obj, r.weight) for r in run_pipeline(spark, docs)["triples"].collect()}
    t2 = {(r.subj, r.pred, r.obj, r.weight) for r in run_pipeline(spark, docs)["triples"].collect()}
    assert t1 == t2 and len(t1) > 0
