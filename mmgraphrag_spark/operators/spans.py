"""Span pipeline: documents -> exploded spans -> chunks + media spans.

SURVEY.md operators: W1 (ordinal via posexplode), C1 (token-window chunking),
C2 (md5 ids + anti-join dedup), C3 (media context window), J2 (image->chunk
association by word-overlap argmax), J1 (new-key anti join).

Scale notes: documents are hash-partitioned by doc_id upstream (pipeline.py);
everything here is narrow per-doc work except the J2 score join, which is
doc-local (join key doc_id) so it shuffles once on doc_id and AQE handles skew.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from mmgraphrag_spark.functions import mdhash_id, clean_str_col

def explode_spans(documents: DataFrame) -> DataFrame:
    """documents(doc_id, spans) -> one row per span.

    ``offset`` is carried from the input (the reference's chunk_order_index);
    ``span_pos`` is the physical array position — span-sequence parity checks
    compare (kind, text, media_ref, offset) in span_pos order.
    """
    return documents.select(
        "doc_id",
        F.posexplode("spans").alias("span_pos", "span"),
    ).select(
        "doc_id",
        "span_pos",
        F.col("span.kind").alias("kind"),
        F.col("span.text").alias("text"),
        F.col("span.media_ref").alias("media_ref"),
        F.col("span.offset").alias("offset"),
    )

def chunk_occurrences(
    spans: DataFrame,
    max_tokens: int = 1200,
    overlap: int = 100,
    tokenizer=None,
) -> DataFrame:
    """Pre-dedup chunk rows: one row per (chunk occurrence in a doc).

    Needed by the fusion neighborhood join: a deduplicated chunk (same content
    in many docs) still occurs at a (doc_id, chunk_order_index) per doc, and
    "nearby entities" are defined per occurrence (fusion.py:156-202).

    ``tokenizer=None`` (default) takes the pure-JVM whitespace-token window;
    a backends.tokenizer backend (tiktoken in production, P9) routes through
    the reference-exact encode/window/decode python path instead.
    """
    if tokenizer is None:
        return _chunk_rows(spans, max_tokens, overlap)
    return _chunk_rows_tokenized(spans, tokenizer, max_tokens, overlap)

def chunk_text_spans(
    spans: DataFrame,
    max_tokens: int = 1200,
    overlap: int = 100,
) -> DataFrame:
    """Text spans -> chunk rows (schema.CHUNKS).

    Sliding token window mirroring chunking_by_token_size
    (preprocessing.py:30-69): window starts at 0, step = max_tokens - overlap,
    i.e. ceil(n/step) chunks including the tail. Tokens are whitespace words
    (deterministic test-mode tokenizer; a tiktoken pandas-UDF backend plugs in
    for real corpora, SURVEY P9). All JVM-side: split + sequence + posexplode +
    slice, no Python.

    chunk_id = "chunk-" + md5(content) (preprocessing.py:127-137); duplicate
    span content collapses to one chunk row (J1 semantics within the batch),
    keeping min(doc_id)/min(offset) for determinism.
    """
    return dedup_chunk_occurrences(_chunk_rows(spans, max_tokens, overlap))


def dedup_chunk_occurrences(
    occurrences: DataFrame, n_parts: int | None = None
) -> DataFrame:
    """Occurrence rows -> deduplicated chunk rows (one per chunk_id, keeping
    min (doc_id, chunk_order_index) for determinism). Split out so the
    pipeline can reuse the already-checkpointed occurrences instead of
    re-chunking every span a second time.

    ``n_parts`` pins the window's own exchange to an explicit
    hash(chunk_id, n_parts) repartition. Two effects, both measured on the
    2M-doc profile (scripts/profile_mentions.py): AQE cannot coalesce an
    explicit repartition, so the downstream python stage keeps its width
    without extract_mentions adding a SECOND full-content round-robin
    exchange on top of this one — the extra exchange was the worst-scaling
    term of the whole mentions stage (eff 0.28 at 1->4 cores vs 0.81 for the
    extraction UDF itself: shuffling chunk content twice is pure memory-
    bandwidth burn that contends with itself at wider parallelism)."""
    if n_parts is not None:
        occurrences = occurrences.repartition(n_parts, "chunk_id")
    w = Window.partitionBy("chunk_id").orderBy("doc_id", "chunk_order_index")
    return (
        occurrences.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )

def _windowed_chunk_rows(
    spans: DataFrame, toks, joiner: str, max_tokens: int, overlap: int
) -> DataFrame:
    """Shared sliding-window chunker body: ``toks`` is the token-array
    expression, ``joiner`` the string that reassembles a window (" " for
    whitespace tokens, "" for BPE-ish tokens that carry their own leading
    whitespace). Both chunking paths and their SQL oracles are this one
    pipeline with those two knobs — keep them in lockstep.

    NOTE (measured): a "fast path" that normalizes whitespace with
    regexp_replace + regexp_count instead of building the token array was
    tried and is ~60% SLOWER on the JVM — split + slice + join beats two
    full regex passes. Keep the array formulation."""
    if overlap >= max_tokens:
        raise ValueError(
            f"chunk overlap ({overlap}) must be smaller than the window "
            f"({max_tokens}) — a non-positive step would loop or emit nothing"
        )
    step = max_tokens - overlap
    t = (
        spans.filter(F.col("kind") == "text")
        .withColumn("_toks", toks)
        .withColumn("_n", F.size("_toks"))
        .withColumn(
            "_starts",
            F.sequence(F.lit(0), F.greatest(F.col("_n") - 1, F.lit(0)), F.lit(step)),
        )
        .select(
            "doc_id",
            "offset",
            F.col("_toks"),
            F.posexplode("_starts").alias("_w", "_start"),
        )
        .withColumn("_window", F.slice("_toks", F.col("_start") + 1, max_tokens))
        .select(
            "doc_id",
            "offset",
            F.array_join("_window", joiner).alias("content"),
            F.size("_window").alias("tokens"),
        )
        .filter(F.col("tokens") > 0)
    )
    return t.select(
        mdhash_id(F.col("content"), "chunk-").alias("chunk_id"),
        "doc_id",
        "content",
        "tokens",
        F.col("offset").alias("chunk_order_index"),
    )


def _chunk_rows(spans: DataFrame, max_tokens: int, overlap: int) -> DataFrame:
    toks = F.split(F.trim(clean_str_col(F.col("text"))), r"\s+")
    return _windowed_chunk_rows(spans, toks, " ", max_tokens, overlap)

def chunk_text_spans_bpe(
    spans: DataFrame,
    max_tokens: int = 1200,
    overlap: int = 100,
) -> DataFrame:
    """C1 over BPE-ish tokens (P9 offline path): one token = optional leading
    whitespace + (letter run | digit run | single symbol), extracted with ONE
    JVM regex pass; window content re-joins tokens with no separator, so text
    round-trips exactly (mid-text windows start with the leading whitespace of
    their first token — the same shape tiktoken's decode produces,
    preprocessing.py:30-69). Fully SQL-expressible: the driver oracle
    reproduces it with DuckDB regexp_extract_all + list slicing.

    The python-backend variant (``chunk_text_spans_tokenized``) produces
    IDENTICAL output when given ``RegexTokenizerBackend`` — asserted in tests
    — so swapping in real tiktoken changes only token boundaries, not
    plumbing."""
    from mmgraphrag_spark.backends.tokenizer import TOKEN_PATTERN

    toks = F.regexp_extract_all(
        F.trim(clean_str_col(F.col("text"))), F.lit(TOKEN_PATTERN), 0
    )
    return dedup_chunk_occurrences(
        _windowed_chunk_rows(spans, toks, "", max_tokens, overlap)
    )


def chunk_text_spans_tokenized(
    spans: DataFrame,
    tokenizer,
    max_tokens: int = 1200,
    overlap: int = 100,
) -> DataFrame:
    """C1 with a real tokenizer backend (P9 production path): encode -> token
    windows -> decode, exactly the reference's chunking_by_token_size
    (preprocessing.py:30-69) with tiktoken-denominated windows.

    ``tokenizer`` implements encode/decode (see backends.tokenizer). Cleaning
    and trimming stay JVM-side; only encode/window/decode crosses into Python
    (Arrow batches, partitions pinned before the UDF stage so AQE cannot
    coalesce it down to one task)."""
    return dedup_chunk_occurrences(
        _chunk_rows_tokenized(spans, tokenizer, max_tokens, overlap)
    )


def _chunk_rows_tokenized(
    spans: DataFrame,
    tokenizer,
    max_tokens: int = 1200,
    overlap: int = 100,
) -> DataFrame:
    import pandas as pd

    if overlap >= max_tokens:
        raise ValueError(
            f"chunk overlap ({overlap}) must be smaller than the window "
            f"({max_tokens}) — a non-positive step would loop or emit nothing"
        )
    step = max_tokens - overlap
    cleaned = (
        spans.filter(F.col("kind") == "text")
        .select(
            F.col("doc_id").cast("string").alias("doc_id"),
            F.col("offset").cast("long").alias("offset"),
            F.trim(clean_str_col(F.col("text"))).alias("_text"),
        )
    )

    def run(batches):
        for pdf in batches:
            doc_ids, offsets, contents, counts = [], [], [], []
            for doc_id, offset, text in zip(pdf["doc_id"], pdf["offset"], pdf["_text"]):
                ids = tokenizer.encode(text)
                n = len(ids)
                for start in range(0, max(n, 1), step):
                    window = ids[start : start + max_tokens]
                    if not window:
                        continue
                    doc_ids.append(doc_id)
                    offsets.append(offset)
                    contents.append(tokenizer.decode(window))
                    counts.append(len(window))
            yield pd.DataFrame(
                {
                    "doc_id": doc_ids,
                    "offset": offsets,
                    "content": contents,
                    "tokens": counts,
                }
            )

    n_parts = spans.sparkSession.sparkContext.defaultParallelism
    out = cleaned.repartition(n_parts, "doc_id").mapInPandas(
        run, "doc_id string, offset long, content string, tokens int"
    )
    return out.select(
        mdhash_id(F.col("content"), "chunk-").alias("chunk_id"),
        "doc_id",
        "content",
        "tokens",
        F.col("offset").alias("chunk_order_index"),
    )


def filter_new_keys(batch: DataFrame, existing: DataFrame, key: str) -> DataFrame:
    """J1: keep only rows whose key is absent from the existing store
    (storage.py:223-224 filter_keys -> left anti join)."""
    return batch.join(existing.select(key), key, "left_anti")

def media_spans_with_context(
    spans: DataFrame,
    context_spans: int = 1,
    prefiltered: bool = False,
) -> DataFrame:
    """Media spans + surrounding text context (C3) -> schema.MEDIA_SPANS
    minus chunk_id (filled by associate_media_to_chunks).

    Context = text of spans within +-context_spans offsets, gathered with a
    range-frame window over the per-doc span order — no self-join, one shuffle
    on doc_id (reference gathers ~100 words around the image position,
    preprocessing.py:208-263).
    """
    w = (
        Window.partitionBy("doc_id")
        .orderBy("offset")
        .rangeBetween(-context_spans, context_spans)
    )
    ctx = F.concat_ws(
        " ",
        F.flatten(
            F.collect_list(
                F.when(F.col("kind") == "text", F.array(F.col("text"))).otherwise(
                    F.array().cast("array<string>")
                )
            ).over(w)
        ),
    )
    # docs without media contribute nothing — restrict the window input to
    # docs that HAVE a media span before shuffling/sorting every span of the
    # corpus (typically a small fraction of docs carry media). The id set is
    # broadcast so the big span side is filtered map-side without a shuffle.
    # ``prefiltered=True`` skips this pass entirely — the pipeline prunes at
    # the DOCUMENT level with a native array predicate before exploding,
    # which costs one derivation pass instead of two.
    if not prefiltered:
        media_docs = (
            spans.filter(F.col("kind") != "text").select("doc_id").distinct()
        )
        spans = spans.join(F.broadcast(media_docs), "doc_id", "left_semi")
    return (
        spans.withColumn("context", ctx)
        .filter(F.col("kind") != "text")
        .select(
            "media_ref",
            "doc_id",
            F.col("text").alias("caption"),
            "context",
            F.col("offset").alias("chunk_order_index"),
            F.lit(True).alias("segmentation"),
        )
    )

def associate_media_to_chunks(media: DataFrame, chunks: DataFrame) -> DataFrame:
    """J2: similarity theta-join + arg-max.

    Score = |distinct context words ∩ distinct chunk words| (set semantics of
    the reference's per-word membership count, preprocessing.py:178-206);
    best chunk per media OCCURRENCE via row_number. The argmax window is keyed
    by (doc_id, media_ref, chunk_order_index) — the reference associates each
    image occurrence per document (preprocessing.py find_chunk_for_image), so
    a media_ref shared across docs (or repeated within one doc) keeps one
    best-chunk association per occurrence, not one globally. Join is doc-local
    (equi on doc_id) so it never goes cartesian across documents.
    """
    m = media.withColumn(
        "_ctx_words", F.array_distinct(F.split(F.lower(F.col("context")), r"\s+"))
    )
    # tokenize ONLY candidate chunks from docs that have media: the semi-join
    # runs before the (expensive) per-chunk word-set build, so corpora where
    # few docs carry media never tokenize the other docs' chunks
    cand = chunks.join(
        F.broadcast(media.select("doc_id").distinct()), "doc_id", "left_semi"
    )
    c = cand.select(
        F.col("doc_id").alias("c_doc_id"),
        F.col("chunk_id").alias("cand_chunk_id"),
        F.array_distinct(F.split(F.lower(F.col("content")), r"\s+")).alias("_chunk_words"),
    )
    scored = m.join(c, m.doc_id == c.c_doc_id, "left").withColumn(
        "_score", F.size(F.array_intersect("_ctx_words", "_chunk_words"))
    )
    w = Window.partitionBy("doc_id", "media_ref", "chunk_order_index").orderBy(
        F.desc("_score"), F.asc("cand_chunk_id")
    )
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(
            "media_ref",
            "doc_id",
            "caption",
            "context",
            "chunk_order_index",
            F.col("cand_chunk_id").alias("chunk_id"),
            "segmentation",
        )
    )
