"""Builders for the interleaved ``documents(doc_id, spans)`` input table.

Two producers of the BASELINE input_hint shape
``(doc_id string, spans array<struct<kind,text,media_ref,offset>>)``:

1. ``interleave_from_flat`` — derives an interleaved corpus DETERMINISTICALLY
   from a flat text corpus ``(doc_id int, text string, ...)`` (the driver's
   testdata ``documents`` table). Span 0 is the original text; span 1 is a
   closed-form record-grammar sentence block derived from doc_id; every
   ``media_every``-th doc gets an image span whose caption references the same
   entity. Because every derived value is a pure function of doc_id, the whole
   KG construction pipeline over this corpus has an exact ANSI-SQL oracle
   (see __spark_entry__.oracle_sql) — entities, edges, triples, aliases.

2. ``datagen.generate_documents`` (mmgraphrag_spark/datagen.py) — the richer
   seeded corpus used by pytest (hub skew, type conflicts, duplicate spans).

Derivation (single source of truth; mirrored in the SQL oracle):
    k = doc_id % 50            mentioned entity
    t = doc_id % 7             topic
    w = doc_id % 9 + 1         relation weight
    b = (3*k + 1) % 50         relation target (mentioned elsewhere)
    u = 50 + k % 5             dangling target (never mentioned -> '"UNKNOWN"')
    grammar = "ENTITY_k is a TYPES[k%4] associated with topic_t.
               ENTITY_k RELATES_TO ENTITY_b (w=w) regarding topic_t.
               ENTITY_b RELATES_TO ENTITY_u (w=1) regarding topic_t."
    image span iff doc_id % media_every == 0, caption "Figure: ENTITY_k.",
    media_ref "img://doc-<doc_id>/0"
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from mmgraphrag_spark import DEFAULT_ENTITY_TYPES

MEDIA_EVERY = 40


def _typ(k: Column) -> Column:
    return F.element_at(
        F.array(*[F.lit(t) for t in DEFAULT_ENTITY_TYPES]), (k % 4 + 1).cast("int")
    )


def derived_grammar(doc_id: Column) -> Column:
    """The span-1 record-grammar text, a pure function of doc_id."""
    k = doc_id % 50
    t = doc_id % 7
    w = doc_id % 9 + 1
    b = (3 * k + 1) % 50
    u = 50 + k % 5
    return F.concat(
        F.lit("ENTITY_"), k, F.lit(" is a "), _typ(k),
        F.lit(" associated with topic_"), t, F.lit("."),
        F.lit(" ENTITY_"), k, F.lit(" RELATES_TO ENTITY_"), b,
        F.lit(" (w="), w, F.lit(") regarding topic_"), t, F.lit("."),
        F.lit(" ENTITY_"), b, F.lit(" RELATES_TO ENTITY_"), u,
        F.lit(" (w=1) regarding topic_"), t, F.lit("."),
    )


def interleave_from_flat(
    flat: DataFrame, media_every: int = MEDIA_EVERY
) -> DataFrame:
    """flat documents(doc_id int64, text, ...) -> interleaved DOCUMENTS table."""
    d = F.col("doc_id")
    k = d % 50
    media_ref = F.concat(F.lit("img://doc-"), d, F.lit("/0"))
    caption = F.concat(F.lit("Figure: ENTITY_"), k, F.lit("."))
    text_span = F.struct(
        F.lit("text").alias("kind"),
        F.col("text").alias("text"),
        F.lit("").alias("media_ref"),
        F.lit(0).alias("offset"),
    )
    grammar_span = F.struct(
        F.lit("text").alias("kind"),
        derived_grammar(d).alias("text"),
        F.lit("").alias("media_ref"),
        F.lit(1).alias("offset"),
    )
    image_span = F.struct(
        F.lit("image").alias("kind"),
        caption.alias("text"),
        media_ref.alias("media_ref"),
        F.lit(2).alias("offset"),
    )
    spans = F.when(
        d % media_every == 0, F.array(text_span, grammar_span, image_span)
    ).otherwise(F.array(text_span, grammar_span))
    return flat.select(
        F.concat(F.lit("doc-"), d).alias("doc_id"), spans.alias("spans")
    )


def read_flat_documents(spark, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def read_interleaved(spark, sf_dir: str, media_every: int = MEDIA_EVERY) -> DataFrame:
    return interleave_from_flat(read_flat_documents(spark, sf_dir), media_every)
