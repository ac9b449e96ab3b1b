"""Graph-RAG query path tests (SURVEY.md §3.2 re-expression)."""

from __future__ import annotations

from mmgraphrag_spark import query as Q


def test_hash_embed_deterministic_unit():
    a = Q.hash_embed_text("ENTITY_1 is a PERSON")
    b = Q.hash_embed_text("ENTITY_1 is a PERSON")
    assert a == b
    assert abs(sum(x * x for x in a) - 1.0) < 1e-9


def test_ann_finds_named_entity(spark, pipeline_out):
    vdb = Q.build_entity_vdb(pipeline_out["entities"])
    qv = Q.hash_embed_text('"ENTITY_1" ENTITY_1')
    hits = Q.ann_entities(vdb, qv, top_k=5, threshold=0.0).collect()
    assert len(hits) == 5
    assert hits[0].rnk == 1


def test_local_query_end_to_end(spark, pipeline_out):
    out = Q.local_query(spark, pipeline_out, "What is ENTITY_1 related to?")
    assert out["seeds"].count() > 0
    assert out["edges"].count() > 0
    assert "-----Entities-----" in out["context"]
    assert "-----Relationships-----" in out["context"]
    assert "-----Sources-----" in out["context"]
    assert out["answer"].startswith("Q: What is ENTITY_1")


def test_query_log_appends(spark, pipeline_out, tmp_path):
    log_dir = str(tmp_path / "qlog")
    Q.local_query(spark, pipeline_out, "first?", log_dir=log_dir)
    Q.local_query(spark, pipeline_out, "second?", log_dir=log_dir)
    log = spark.read.parquet(log_dir)
    assert log.count() == 2
    assert {r.question for r in log.collect()} == {"first?", "second?"}


def test_related_text_units_budget(spark, pipeline_out):
    vdb = Q.build_entity_vdb(pipeline_out["entities"]).localCheckpoint()
    qv = Q.hash_embed_text("ENTITY_2")
    ann = Q.ann_entities(vdb, qv, top_k=3, threshold=0.0)
    seeds = Q.seed_entities(pipeline_out["entities"], pipeline_out["edges"], ann)
    tu = Q.related_text_units(
        seeds, pipeline_out["entities"], pipeline_out["edges"],
        pipeline_out["chunks"], budget_tokens=50,
    )
    rows = tu.collect()
    # budget respected: total tokens of kept chunks <= 50
    total = sum(len(r.content.split()) for r in rows)
    assert total <= 50


def test_embed_backend_seam(spark):
    """M1 seam: a custom backend drives both the VDB and the query vector;
    the gated SentenceTransformer backend raises cleanly when absent."""
    import pytest as _pytest

    from mmgraphrag_spark.backends import embeddings as E

    class TwoHotBackend:
        def embed(self, texts):
            return [[1.0, 0.0] if "ENTITY_A" in t else [0.0, 1.0] for t in texts]

    ents = spark.createDataFrame(
        [('"ENTITY_A"', "T", "about a", ["c1"]), ('"ENTITY_B"', "T", "about b", ["c2"])],
        ["entity_name", "entity_type", "description", "source_ids"],
    )
    from mmgraphrag_spark.query import ann_entities, build_entity_vdb

    vdb = build_entity_vdb(ents, backend=TwoHotBackend())
    got = ann_entities(vdb, [1.0, 0.0], top_k=1).collect()
    assert got[0].entity_name == '"ENTITY_A"'

    try:
        import sentence_transformers  # noqa: F401

        has = True
    except ImportError:
        has = False
    if not has:
        with _pytest.raises(ImportError):
            E.SentenceTransformerBackend()
        assert isinstance(E.default_embed_backend(), E.HashEmbedBackend)
