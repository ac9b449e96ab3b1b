"""Markdown ingestion -> interleaved documents table (S1-S3 equivalent)."""

from __future__ import annotations

import os

from mmgraphrag_spark.sources.ingest import markdown_to_documents, read_markdown_dir


MD = """Intro paragraph about things.

![figure one](img://a/0)

Second paragraph with an inline ![inline cap](img://a/1) image tag.

Final text."""


def test_markdown_to_documents(spark):
    raw = spark.createDataFrame([("f.md", MD)], ["file", "text"])
    docs = markdown_to_documents(raw).collect()
    assert len(docs) == 1
    spans = docs[0].spans
    seq = [(s.kind, s.media_ref, s.offset) for s in spans]
    assert [o for (_, _, o) in seq] == list(range(len(spans)))
    kinds = [k for (k, _, _) in seq]
    assert kinds == ["text", "image", "text", "image", "text"]
    # pure-image paragraph keeps its caption; inline tag is scrubbed from text
    assert spans[1].text == "figure one"
    assert spans[1].media_ref == "img://a/0"
    assert "![inline" not in spans[2].text
    assert spans[3].media_ref == "img://a/1"
    assert docs[0].doc_id.startswith("doc-")


def test_read_markdown_dir_feeds_pipeline(spark, tmp_path):
    p = tmp_path / "corpus"
    os.makedirs(p)
    (p / "a.md").write_text(
        "ENTITY_1 is a PERSON associated with topic_0.\n\n"
        "![Figure: ENTITY_1.](img://a/0)\n\n"
        "ENTITY_1 RELATES_TO ENTITY_2 (w=3) regarding topic_0."
    )
    docs = read_markdown_dir(spark, str(p))
    from mmgraphrag_spark.pipeline import run_pipeline

    out = run_pipeline(spark, docs)
    triples = {(r.subj, r.obj) for r in out["triples"].collect()}
    assert ('"ENTITY_1"', '"ENTITY_2"') in triples
    # image aligned and contained
    assert any(s.startswith('"IMG_') or o.startswith('"IMG_') for s, o in triples)
