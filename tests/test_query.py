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
