"""Mention detection + triple extraction (SURVEY.md §2.9 L1, §7.1 step 3).

The extractor is a pluggable backend behind one seam:
    chunks(chunk_id, content) -> mentions(chunk_id, records)
where ``records`` is the reference record-grammar wire format
(prompt.py:190-192): '("entity"<|>name<|>type<|>desc)##...<|COMPLETE|>'.

Backends:
  - DeterministicExtractor — regex/gazetteer over the datagen grammar; used by
    tests and bench (the load-bearing seam of SURVEY §7.4: P/R is only testable
    against a deterministic oracle).
  - LLMExtractor — batched API client with cache-table join (J17) and bounded
    in-UDF concurrency; network calls are stubbed in this sandbox.

Both are Arrow-batched pandas UDFs (no per-row Python): one Python call per
~4096-row batch, regex work vectorized via pandas str ops where possible.
"""

from __future__ import annotations

import re
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mmgraphrag_spark import COMPLETE_TAG, RECORD_SEP
from mmgraphrag_spark.functions import args_hash
from mmgraphrag_spark.functions.records import (
    explode_records,
    parse_entity_records,
    parse_relationship_records,
)

_MENTION_RE = re.compile(r"ENTITY_(\d+) is a ([A-Z]+) associated with (topic_\d+)\.")
_RELATION_RE = re.compile(
    r"ENTITY_(\d+) RELATES_TO ENTITY_(\d+) \(w=(\d+)\) regarding (topic_\d+)\."
)

def _extract_records_text(text: str) -> str:
    """One chunk's text -> record-grammar string (deterministic backend)."""
    recs = []
    for m in _MENTION_RE.finditer(text):
        k, typ, topic = m.group(1), m.group(2), m.group(3)
        desc = f"ENTITY_{k} is a {typ} associated with {topic}."
        recs.append(f'("entity"<|>"ENTITY_{k}"<|>"{typ}"<|>{desc})')
    for m in _RELATION_RE.finditer(text):
        a, b, w, topic = m.group(1), m.group(2), m.group(3), m.group(4)
        recs.append(
            f'("relationship"<|>"ENTITY_{a}"<|>"ENTITY_{b}"<|>relates regarding {topic}<|>{w})'
        )
    return RECORD_SEP.join(recs) + COMPLETE_TAG

class DeterministicExtractor:
    """Gazetteer/regex extraction backend (test + bench mode)."""

    def map_batches(self, it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame(
                {
                    "chunk_id": pdf["chunk_id"],
                    "doc_id": pdf["doc_id"],
                    "records": pdf["content"].map(_extract_records_text),
                }
            )

# API-backed extraction backend (L1 + gleaning loop, cache join J17):
# mmgraphrag_spark.backends.llm.LLMExtractor — same map_batches interface.

def extract_mentions(
    chunks: DataFrame,
    backend=None,
    llm_cache: DataFrame | None = None,
    cache_namespace: str = "text",
    pre_partitioned: bool = False,
) -> DataFrame:
    """chunks -> mentions(chunk_id, doc_id, records) via mapInPandas.

    When ``llm_cache`` is given, a left join on the args hash (J17,
    llm.py:81-96) routes hits around the backend; only misses run the UDF.
    If the cache table carries a ``namespace`` column, only rows of
    ``cache_namespace`` participate — mirroring the reference's SEPARATE
    text vs multimodal response caches (img2graph.py:603-608): a text-model
    reply must never satisfy a multimodal probe for the same content hash.

    ``pre_partitioned=True`` promises the caller already pinned the input's
    width with an EXPLICIT repartition (see dedup_chunk_occurrences n_parts),
    so no exchange is added here. Leave it False for inputs whose layout came
    out of an AQE-coalescible shuffle: a size-coalesced 1-2 partition input
    would serialize the UDF. Measured (profile_mentions.py, 2M docs): the
    unconditional round-robin exchange re-shuffled every chunk's content a
    second time and was the stage's worst anti-scaling term (eff 0.28 1->4
    cores — absolute cost GREW with cores while the UDF itself scaled 0.81).
    """
    backend = backend or DeterministicExtractor()
    if llm_cache is not None and "namespace" in llm_cache.columns:
        llm_cache = llm_cache.filter(F.col("namespace") == cache_namespace).drop(
            "namespace"
        )
    # explicit width for the python stage: upstream AQE-coalesced shuffles may
    # arrive as 1-2 partitions (size-based), which would serialize the UDF
    n_parts = chunks.sparkSession.sparkContext.defaultParallelism
    src = chunks.select("chunk_id", "doc_id", "content")
    if not pre_partitioned:
        src = src.repartition(n_parts)
    schema = "chunk_id string, doc_id string, records string"
    if llm_cache is not None:
        keyed = src.withColumn("_h", args_hash(F.col("content")))
        hits = keyed.join(llm_cache, keyed._h == llm_cache.args_hash, "inner").select(
            "chunk_id", "doc_id", F.col("payload").alias("records")
        )
        misses = keyed.join(
            llm_cache, keyed._h == llm_cache.args_hash, "left_anti"
        ).select("chunk_id", "doc_id", "content")
        # re-pin AFTER the anti-join: the join exchange destroys src's
        # repartition and AQE may coalesce the (small) miss side to 1-2
        # partitions — serializing the expensive LLM-calling stage
        return hits.unionByName(
            misses.repartition(n_parts).mapInPandas(backend.map_batches, schema)
        )
    return src.mapInPandas(backend.map_batches, schema)

def parse_mentions(mentions: DataFrame) -> tuple[DataFrame, DataFrame]:
    """mentions -> (entity mention rows, relationship mention rows).

    Record parsing is pure DataFrame expressions (P3-P6) so it stays inside
    WholeStageCodegen downstream of the UDF.
    """
    recs = explode_records(mentions, "records")
    ents = parse_entity_records(recs).select(
        "entity_name", "entity_type", "description", F.col("chunk_id").alias("source_id")
    )
    rels = parse_relationship_records(recs).select(
        "src", "tgt", "description", "weight", F.col("chunk_id").alias("source_id")
    )
    return ents, rels
