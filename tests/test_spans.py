"""Span pipeline tests: W1 ordinals, C1 chunk window math, J1 dedup, C3/J2."""

from __future__ import annotations

from pyspark.sql import functions as F

from mmgraphrag_spark import schema
from mmgraphrag_spark.operators import spans as S


def _docs(spark, rows):
    return spark.createDataFrame(rows, schema.DOCUMENTS)


def test_span_sequence_roundtrip(spark, documents_df, corpus):
    """Per-row span-sequence invariant (kind, text, media_ref, order) — the
    input_hint parity check: explode preserves every span in order."""
    got = (
        S.explode_spans(documents_df)
        .orderBy("doc_id", "span_pos")
        .select("doc_id", "kind", "text", "media_ref", "offset")
        .collect()
    )
    expected = [
        (d.doc_id, k, t, m, o) for d in corpus.docs for (k, t, m, o) in d.spans
    ]
    assert [(r.doc_id, r.kind, r.text, r.media_ref, r.offset) for r in got] == expected


def test_chunk_window_math(spark):
    """C1: sliding window size/step/ordinals (preprocessing.py:30-69).
    25 tokens, max=10, overlap=2 -> step 8 -> starts 0,8,16,24 -> sizes 10,10,9,1."""
    text = " ".join(f"w{i}" for i in range(25))
    docs = _docs(spark, [("d1", [("text", text, "", 0)])])
    chunks = (
        S.chunk_text_spans(S.explode_spans(docs), max_tokens=10, overlap=2)
        .orderBy("content")
        .collect()
    )
    sizes = sorted(c.tokens for c in chunks)
    assert sizes == [1, 9, 10, 10]
    contents = {c.content for c in chunks}
    assert " ".join(f"w{i}" for i in range(10)) in contents
    assert "w24" in contents
    assert all(c.chunk_id.startswith("chunk-") for c in chunks)


def test_chunk_dedup_across_docs(spark):
    """J1: identical span text in two docs -> one chunk row (md5 key)."""
    docs = _docs(
        spark,
        [
            ("d1", [("text", "same words here", "", 0)]),
            ("d2", [("text", "same words here", "", 0)]),
        ],
    )
    chunks = S.chunk_text_spans(S.explode_spans(docs)).collect()
    assert len(chunks) == 1
    # occurrences keeps both positions for the fusion neighborhood join
    occ = S.chunk_occurrences(S.explode_spans(docs)).collect()
    assert len(occ) == 2


def test_filter_new_keys(spark):
    batch = spark.createDataFrame([("a", 1), ("b", 2)], ["id", "v"])
    existing = spark.createDataFrame([("a",)], ["id"])
    got = S.filter_new_keys(batch, existing, "id").collect()
    assert [r.id for r in got] == ["b"]


def test_media_context_window(spark):
    """C3: media span context = text of spans within ±1 offset."""
    docs = _docs(
        spark,
        [
            (
                "d1",
                [
                    ("text", "alpha beta", "", 0),
                    ("image", "Figure: cap.", "img://d1/0", 1),
                    ("text", "gamma delta", "", 2),
                    ("text", "far away", "", 3),
                ],
            )
        ],
    )
    media = S.media_spans_with_context(S.explode_spans(docs)).collect()
    assert len(media) == 1
    m = media[0]
    assert m.caption == "Figure: cap."
    assert "alpha beta" in m.context and "gamma delta" in m.context
    assert "far away" not in m.context
    assert m.chunk_order_index == 1


def test_associate_media_with_cross_doc_chunk_dedup(spark):
    """Regression: a chunk shared by two docs is attributed to the FIRST doc
    after dedup; media in the SECOND doc must still associate to it — the J2
    join must use per-doc occurrences, not deduped chunks."""
    shared = "unique tokens alpha beta gamma delta"
    docs = _docs(
        spark,
        [
            ("doc-a", [("text", shared, "", 0)]),
            ("doc-b", [
                ("text", shared, "", 0),
                ("image", "cap", "img://doc-b/0", 1),
            ]),
        ],
    )
    spans = S.explode_spans(docs)
    occurrences = S.chunk_occurrences(spans)
    media = S.media_spans_with_context(spans)
    out = S.associate_media_to_chunks(media, occurrences).collect()
    assert len(out) == 1
    import hashlib

    assert out[0].chunk_id == "chunk-" + hashlib.md5(shared.encode()).hexdigest()


def test_associate_media_to_chunks(spark):
    """J2: argmax word-overlap picks the right chunk."""
    docs = _docs(
        spark,
        [
            (
                "d1",
                [
                    ("text", "apples oranges pears", "", 0),
                    ("image", "caption", "img://d1/0", 1),
                    ("text", "cars trucks buses", "", 2),
                ],
            )
        ],
    )
    spans = S.explode_spans(docs)
    chunks = S.chunk_text_spans(spans)
    media = S.media_spans_with_context(spans, context_spans=1)
    # context covers both neighbors; nudge the overlap to favor the fruit chunk
    media = media.withColumn("context", F.lit("apples pears snacks"))
    out = S.associate_media_to_chunks(media, chunks).collect()
    assert len(out) == 1
    fruit_chunk = [c for c in chunks.collect() if "apples" in c.content][0]
    assert out[0].chunk_id == fruit_chunk.chunk_id
