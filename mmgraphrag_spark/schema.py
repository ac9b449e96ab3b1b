"""Fixed StructTypes for every table in the pipeline.

The reference is schema-on-read JSON/dict (SURVEY.md §1.1); every record type it uses
has a closed field set in practice, so we declare them as columnar schemas up front.
Reference shapes cited per table.
"""

from __future__ import annotations

from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# Input: interleaved documents (authoritative shape from BASELINE.json input_hint)
# ---------------------------------------------------------------------------
SPAN = T.StructType(
    [
        T.StructField("kind", T.StringType(), False),       # "text" | "image" | "table"
        T.StructField("text", T.StringType(), True),        # chunk text / caption+context
        T.StructField("media_ref", T.StringType(), True),   # "" for text spans
        T.StructField("offset", T.IntegerType(), False),    # span ordinal (= reference chunk_order_index, storage.py:18-21)
    ]
)

DOCUMENTS = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("spans", T.ArrayType(SPAN), False),
    ]
)

# ---------------------------------------------------------------------------
# Stage tables
# ---------------------------------------------------------------------------

# reference TextChunkSchema (storage.py:18-21) + doc/chunk ids (preprocessing.py:127-137)
CHUNKS = T.StructType(
    [
        T.StructField("chunk_id", T.StringType(), False),   # "chunk-" + md5(content)
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("content", T.StringType(), False),
        T.StructField("tokens", T.IntegerType(), False),
        T.StructField("chunk_order_index", T.IntegerType(), False),
    ]
)

# media span records (pdf2md_preprocessing.py:446-456)
MEDIA_SPANS = T.StructType(
    [
        T.StructField("media_ref", T.StringType(), False),
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("caption", T.StringType(), True),
        T.StructField("context", T.StringType(), True),
        T.StructField("chunk_order_index", T.IntegerType(), False),
        T.StructField("chunk_id", T.StringType(), True),    # best-matching chunk (J2)
        T.StructField("segmentation", T.BooleanType(), False),
    ]
)

# raw extraction output: one record-grammar string per chunk (text2graph.py:346-369)
MENTIONS = T.StructType(
    [
        T.StructField("chunk_id", T.StringType(), False),
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("records", T.StringType(), False),    # "(..)##(..)<|COMPLETE|>"
    ]
)

# entity node (text2graph.py:66-71, 196-199); source_ids is a real array
# (the reference's "<SEP>"-joined string, SURVEY §1.3)
ENTITIES = T.StructType(
    [
        T.StructField("entity_name", T.StringType(), False),
        T.StructField("entity_type", T.StringType(), False),
        T.StructField("description", T.StringType(), False),
        T.StructField("source_ids", T.ArrayType(T.StringType()), False),
    ]
)

# edge / triple (text2graph.py:132-138, 272-279); src <= tgt lexicographically
# (undirected canonicalization, text2graph.py:442-443)
EDGES = T.StructType(
    [
        T.StructField("src", T.StringType(), False),
        T.StructField("tgt", T.StringType(), False),
        T.StructField("weight", T.DoubleType(), False),
        T.StructField("description", T.StringType(), False),
        T.StructField("source_ids", T.ArrayType(T.StringType()), False),
        T.StructField("order", T.IntegerType(), False),
    ]
)

TRIPLES = T.StructType(
    [
        T.StructField("subj", T.StringType(), False),
        T.StructField("pred", T.StringType(), False),
        T.StructField("obj", T.StringType(), False),
        T.StructField("weight", T.DoubleType(), False),
    ]
)

# deterministic scene-object rows (stand-in for YOLO+MLLM, img2graph.py:279-385)
SCENE_OBJECTS = T.StructType(
    [
        T.StructField("media_ref", T.StringType(), False),
        T.StructField("object_id", T.IntegerType(), False),
        T.StructField("label", T.StringType(), False),
        T.StructField("description", T.StringType(), False),
        T.StructField("width", T.IntegerType(), False),
        T.StructField("height", T.IntegerType(), False),
    ]
)

# embedding rows (storage.py:271-293)
EMBEDDINGS = T.StructType(
    [
        T.StructField("id", T.StringType(), False),
        T.StructField("entity_name", T.StringType(), False),
        T.StructField("vec", T.ArrayType(T.FloatType()), False),
    ]
)

# fusion alias map (fusion.py:936-991; canonical = lexicographic min, SURVEY §4)
ALIAS = T.StructType(
    [
        T.StructField("alias", T.StringType(), False),
        T.StructField("canonical", T.StringType(), False),
    ]
)

EMBED_DIM = 64  # deterministic test-mode embedding dim (reference uses 384, parameter.py:29-31)
