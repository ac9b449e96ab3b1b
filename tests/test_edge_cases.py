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
