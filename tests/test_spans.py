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


def test_bpe_chunking_paths_agree(spark, documents_df):
    """P9 plumbing proof: the python tokenizer-backend chunker with the regex
    backend must produce EXACTLY the chunks of the pure-JVM BPE-ish chunker —
    same ids, contents, token counts, positions. A real tiktoken backend then
    changes only token boundaries, not the Spark plumbing."""
    from mmgraphrag_spark.backends.tokenizer import RegexTokenizerBackend

    spans = S.explode_spans(documents_df)
    jvm = S.chunk_text_spans_bpe(spans, max_tokens=40, overlap=10)
    py = S.chunk_text_spans_tokenized(
        spans, RegexTokenizerBackend(), max_tokens=40, overlap=10
    )
    key = lambda r: (r.chunk_id, r.doc_id, r.content, r.tokens, r.chunk_order_index)
    assert sorted(map(key, jvm.collect())) == sorted(map(key, py.collect()))


def test_bpe_chunk_content_roundtrip(spark):
    """A window wide enough for the whole text reproduces the cleaned text
    EXACTLY (decode round-trip: every char belongs to exactly one token —
    whitespace rides as token prefixes, nothing is lost or reordered)."""
    import re

    from mmgraphrag_spark.backends.tokenizer import TOKEN_PATTERN

    text = "Hello, world!  Nums 123 + 45; symbols #@& end."
    docs = _docs(spark, [("d1", [("text", text, "", 0)])])
    spans = S.explode_spans(docs)
    rows = S.chunk_text_spans_bpe(spans, max_tokens=1000, overlap=0).collect()
    assert len(rows) == 1
    assert rows[0].content == text
    assert rows[0].tokens == len(re.findall(TOKEN_PATTERN, text))


def test_tiktoken_backend_gated():
    """TiktokenBackend raises ImportError in this container (no tiktoken);
    default_backend falls back to the regex tokenizer."""
    import pytest as _pytest

    from mmgraphrag_spark.backends import tokenizer as T

    try:
        import tiktoken  # noqa: F401

        has = True
    except ImportError:
        has = False
    if not has:
        with _pytest.raises(ImportError):
            T.TiktokenBackend()
        assert isinstance(T.default_backend(), T.RegexTokenizerBackend)
    else:
        assert isinstance(T.default_backend(), T.TiktokenBackend)
