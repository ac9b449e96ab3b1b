"""Coverage for U6 LCC, S4 KV import/export, J17 cache join, W7 mm branch."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from mmgraphrag_spark.operators.fusion import largest_connected_component
from mmgraphrag_spark.sources.kv import read_kv_json, write_kv_json


def test_largest_connected_component(spark):
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("x", "y")], ["src", "tgt"]
    )
    got = {r.entity_name for r in largest_connected_component(edges).collect()}
    assert got == {"a", "b", "c"}


def test_kv_json_roundtrip(spark, tmp_path):
    store = {
        "chunk-1": {"tokens": 10, "content": "hello", "full_doc_id": "doc-1",
                     "chunk_order_index": 0},
        "chunk-2": {"tokens": 5, "content": "world", "full_doc_id": "doc-1",
                     "chunk_order_index": 1},
    }
    p = str(tmp_path / "kv_store_text_chunks.json")
    with open(p, "w") as f:
        json.dump(store, f)
    df = read_kv_json(spark, p)
    assert df.count() == 2
    rows = {r.id: r for r in df.collect()}
    assert rows["chunk-1"].content == "hello"
    out = str(tmp_path / "out.json")
    write_kv_json(df, out)
    with open(out) as f:
        back = json.load(f)
    assert back["chunk-2"]["tokens"] == 5


def test_llm_cache_join_routes_hits(spark):
    """J17 (llm.py:81-96): cached chunks skip the backend; misses run it."""
    from mmgraphrag_spark.functions import args_hash
    from mmgraphrag_spark.operators.extract import extract_mentions

    chunks = spark.createDataFrame(
        [("c1", "d1", "ENTITY_1 is a PERSON associated with topic_0."),
         ("c2", "d1", "ENTITY_2 is a GEO associated with topic_1.")],
        ["chunk_id", "doc_id", "content"],
    )
    # pre-populate the cache with a SENTINEL payload for c1's content hash
    cache = chunks.filter("chunk_id = 'c1'").select(
        args_hash(F.col("content")).alias("args_hash"),
        F.lit("(CACHED)<|COMPLETE|>").alias("payload"),
    )
    out = {r.chunk_id: r.records for r in
           extract_mentions(chunks, llm_cache=cache).collect()}
    assert out["c1"] == "(CACHED)<|COMPLETE|>"      # hit: backend bypassed
    assert "ENTITY_2" in out["c2"]                   # miss: backend ran


def test_multimodal_branch(spark, pipeline_out):
    from mmgraphrag_spark import query as Q

    # query for an image entity by name so an ORI_IMG lands in the seeds
    img_name = pipeline_out["entities"].filter(
        F.col("entity_type") == '"ORI_IMG"'
    ).first().entity_name
    out = Q.local_query(spark, pipeline_out, f"what does {img_name} show?",
                        threshold=0.0)
    assert len(out["mm_entities"]) <= 3
    if out["mm_entities"]:
        assert "[image " in out["answer"]
