"""A1/A2 merge-semantics tests (text2graph.py:140-279) + J5 + A3."""

from __future__ import annotations

from pyspark.sql import functions as F

from mmgraphrag_spark import GRAPH_FIELD_SEP
from mmgraphrag_spark.operators import merge as M


def _ents(spark, rows):
    return spark.createDataFrame(
        rows, ["entity_name", "entity_type", "description", "source_id"]
    )


def _rels(spark, rows):
    return spark.createDataFrame(
        rows, ["src", "tgt", "description", "weight", "source_id"]
    )


def test_entity_merge_mode_and_sets(spark):
    """type = mode; description = <SEP>-join of sorted set; source_ids = set."""
    df = _ents(
        spark,
        [
            ('"A"', '"PERSON"', "desc b", "c1"),
            ('"A"', '"PERSON"', "desc a", "c2"),
            ('"A"', '"ORG"', "desc a", "c1"),
        ],
    )
    r = M.merge_entities(df).collect()
    assert len(r) == 1
    row = r[0]
    assert row.entity_type == '"PERSON"'  # 2 vs 1
    assert row.description == "desc a" + GRAPH_FIELD_SEP + "desc b"
    assert sorted(row.source_ids) == ["c1", "c2"]


def test_entity_merge_mode_tiebreak(spark):
    """Documented deviation: ties broken by (count desc, type asc)."""
    df = _ents(spark, [('"A"', '"Z_TYPE"', "d", "c1"), ('"A"', '"A_TYPE"', "d", "c2")])
    assert M.merge_entities(df).first().entity_type == '"A_TYPE"'


def test_edge_merge_weight_sum_min_order(spark):
    """A2: undirected canonical key, weight sum, min order, sorted desc set."""
    df = _rels(
        spark,
        [
            ('"B"', '"A"', "z rel", 2.0, "c1"),
            ('"A"', '"B"', "a rel", 3.0, "c2"),
            ('"A"', '"B"', "a rel", 1.0, "c1"),
        ],
    )
    r = M.merge_edges(df).collect()
    assert len(r) == 1
    row = r[0]
    assert (row.src, row.tgt) == ('"A"', '"B"')
    assert row.weight == 6.0
    assert row.description == "a rel" + GRAPH_FIELD_SEP + "z rel"
    assert row.order == 1
    assert sorted(row.source_ids) == ["c1", "c2"]


def test_dangling_entities(spark):
    """J5: edge endpoints absent from nodes appear as '"UNKNOWN"'."""
    ents = M.merge_entities(_ents(spark, [('"A"', '"PERSON"', "d", "c1")]))
    edges = M.merge_edges(_rels(spark, [('"A"', '"GHOST"', "r", 1.0, "c1")]))
    out = {r.entity_name: r.entity_type for r in M.add_dangling_entities(ents, edges).collect()}
    assert out == {'"A"': '"PERSON"', '"GHOST"': '"UNKNOWN"'}


def test_summarize_long_descriptions(spark):
    long_desc = " ".join(f"t{i}" for i in range(600))
    df = spark.createDataFrame(
        [('"A"', '"T"', long_desc, ["c"]), ('"B"', '"T"', "short", ["c"])],
        ["entity_name", "entity_type", "description", "source_ids"],
    )
    out = {r.entity_name: r.description for r in M.summarize_long_descriptions(df).collect()}
    assert out['"B"'] == "short"
    assert out['"A"'].endswith("...") and len(out['"A"'].split()) == 121


def test_merge_is_input_order_insensitive(spark):
    """Property: A1/A2 results are identical under input permutation."""
    rows = [
        ('"A"', '"P"', "d1", "c1"),
        ('"A"', '"Q"', "d2", "c2"),
        ('"A"', '"P"', "d3", "c3"),
    ]
    a = M.merge_entities(_ents(spark, rows)).collect()
    b = M.merge_entities(_ents(spark, rows[::-1])).collect()
    assert a == b


def test_summarize_llm_backend(spark):
    """LLM summarize path (L2/A3 with backend): only rows over the token
    threshold go through the chat call; short rows pass through untouched."""
    from mmgraphrag_spark.backends.llm import (
        ChatClient,
        LLMSummarizer,
        ScriptedTransport,
    )

    ents = spark.createDataFrame(
        [
            ('"E1"', "T", " ".join(["w"] * 600), ["s1"]),
            ('"E2"', "T", "short desc", ["s2"]),
        ],
        ["entity_name", "entity_type", "description", "source_ids"],
    )
    client = ChatClient(
        "http://fake", transport=ScriptedTransport(["a concise summary"])
    )
    out = M.summarize_long_descriptions(
        ents, max_tokens=500, backend=LLMSummarizer(client)
    )
    got = {r.entity_name: r.description for r in out.collect()}
    assert got['"E1"'] == "a concise summary"
    assert got['"E2"'] == "short desc"
