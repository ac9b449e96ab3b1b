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


def test_ann_entities_plan_is_distributed_topk(spark, pipeline_out):
    """The per-query hot path must plan as TakeOrderedAndProject (per-
    partition top-k + k-row merge), NOT a global row_number window over the
    full VDB — the round-2 scale-killer (storage.py:298-323)."""
    vdb = Q.build_entity_vdb(pipeline_out["entities"])
    out = Q.ann_entities(vdb, Q.hash_embed_text("ENTITY_1"), top_k=5, threshold=0.0)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    # results unchanged vs the semantics: dense ranks 1..5, sim descending
    rows = out.orderBy("rnk").collect()
    assert [r.rnk for r in rows] == [1, 2, 3, 4, 5]
    assert all(rows[i].sim >= rows[i + 1].sim for i in range(4))


def test_related_edges_plans_hash_joins_only(spark, pipeline_out):
    """The seed-touch filter must plan as broadcast HASH joins: the naive
    disjunctive (src==s)|(tgt==s) semi-join has no equi-part and degrades to
    a BroadcastNestedLoopJoin — O(|edges| * k) comparisons per query.
    Semantics pinned against the disjunctive reference computed inline."""
    import pyspark.sql.functions as F

    edges = pipeline_out["edges"]
    seeds = (
        pipeline_out["entities"].select("entity_name").orderBy("entity_name").limit(3)
    )
    out = Q.related_edges(seeds, edges, budget_tokens=10**9)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BroadcastHashJoin" in plan
    got = {(r.src, r.tgt) for r in out.collect()}
    s = {r.entity_name for r in seeds.collect()}
    want = {
        (r.src, r.tgt)
        for r in edges.collect()
        if r.src in s or r.tgt in s
    }
    assert got == want


def test_ann_modes_agree_on_planted_target(spark):
    """ann_mode wiring: a scripted embedding backend plants one entity whose
    vector matches the question exactly — all three modes must rank it #1,
    and approximate-mode recall vs exact is 1.0 on this construction."""

    class PlantedBackend:
        """Vector = one-hot-ish by entity index; the question maps to the
        TARGET's vector, sharing its sign-bit bucket and IVF cell exactly."""

        def embed(self, texts):
            out = []
            for t in texts:
                v = [0.0] * 16
                if "TARGET" in t:
                    v[0] = 1.0
                    v[8] = 1.0
                else:
                    idx = sum(ord(c) for c in t) % 7
                    v[1 + idx] = -1.0
                    v[9] = 1.0
                out.append(v)
            return out

    ents = spark.createDataFrame(
        [(f'"E_{i}"', "T", f"entity {i}", ["c1"]) for i in range(20)]
        + [('"TARGET"', "T", "the one", ["c2"])],
        ["entity_name", "entity_type", "description", "source_ids"],
    )
    vdb = Q.build_entity_vdb(ents, backend=PlantedBackend()).localCheckpoint()
    qv = PlantedBackend().embed(["find TARGET"])[0]
    exact = Q.ann_entities(vdb, qv, top_k=3, threshold=0.0).collect()
    assert exact[0].entity_name == '"TARGET"'
    for mode in ("lsh", "ivf"):
        got = Q.ann_entities_approx(
            vdb, qv, top_k=3, threshold=0.0, mode=mode, n_centroids=4
        ).orderBy("rnk").collect()
        assert got and got[0].entity_name == '"TARGET"', mode


def test_local_query_ann_modes_smoke(spark, pipeline_out):
    """local_query(ann_mode=...) end-to-end under each plan; lsh/ivf recall
    vs the exact seed set is reported and bounded below (hash embeddings are
    sign-random, so Hamming-1 multi-probe keeps a real fraction)."""
    exact = Q.local_query(spark, pipeline_out, "What is ENTITY_1 related to?",
                          threshold=0.0)
    exact_names = {r.entity_name for r in exact["seeds"].collect()}
    assert exact_names
    for mode in ("lsh", "ivf"):
        out = Q.local_query(spark, pipeline_out, "What is ENTITY_1 related to?",
                            threshold=0.0, ann_mode=mode)
        names = {r.entity_name for r in out["seeds"].collect()}
        assert names, mode  # bucketed probe still seeds the query
        assert names <= {r.entity_name for r in
                         pipeline_out["entities"].select("entity_name").collect()}
        assert "-----Entities-----" in out["context"]


def test_local_query_prebuilt_ivf_skips_vdb_build(spark, pipeline_out, monkeypatch):
    """Index-once-query-many: with a prebuilt IVF index, local_query must
    not rebuild (and eagerly materialize) the entity VDB per query — the
    inverted file already holds every corpus vector. Asserted by poisoning
    build_entity_vdb: the query must answer without ever calling it."""
    from pyspark.sql import functions as F

    from mmgraphrag_spark.operators.similarity import build_ivf_index

    vdb = Q.build_entity_vdb(pipeline_out["entities"]).localCheckpoint()
    idx = build_ivf_index(
        vdb.select(F.col("entity_name").alias("vec_id"), F.col("vec").alias("embedding")),
        n_centroids=4,
    )
    with_vdb = Q.local_query(spark, pipeline_out, "What is ENTITY_1 related to?",
                             threshold=0.0, ann_mode="ivf", ann_index=idx)
    expected = sorted(r.entity_name for r in with_vdb["seeds"].collect())

    def poisoned(*a, **k):
        raise AssertionError("build_entity_vdb must not run with a prebuilt index")

    monkeypatch.setattr(Q, "build_entity_vdb", poisoned)
    out = Q.local_query(spark, pipeline_out, "What is ENTITY_1 related to?",
                        threshold=0.0, ann_mode="ivf", ann_index=idx)
    assert sorted(r.entity_name for r in out["seeds"].collect()) == expected
    assert expected  # the probe actually seeded the query


def test_legacy_three_arg_answerer_still_works(spark, pipeline_out):
    """Answerers written to the pre-round-3 protocol (answer_image without
    image_b64) keep working — local_query inspects the signature before
    passing bytes."""

    class LegacyAnswerer:
        def answer(self, question, context):
            return "text answer"

        def answer_image(self, question, media_ref, context):
            return f"[legacy {media_ref}]"

        def merge(self, question, answers):
            return " | ".join(answers)

    from pyspark.sql import functions as F

    img = pipeline_out["entities"].filter(
        F.col("entity_type") == '"ORI_IMG"'
    ).first()
    refs = [s for s in img.source_ids if not s.startswith("chunk-")]
    media = spark.createDataFrame(
        [(refs[0], bytearray(b"JPEGBYTES"))], ["media_ref", "content"]
    )
    out = Q.local_query(
        spark, pipeline_out, f"what does {img.entity_name} show?",
        threshold=0.0, media=media, answerer=LegacyAnswerer(),
    )
    assert "[legacy " in out["answer"]


def test_multimodal_answer_carries_image_bytes(spark, pipeline_out):
    """The multimodal branch joins ranked ORI_IMG seeds to the media table
    and hands base64 bytes to answer_image (reference query.py:434-436)."""
    from pyspark.sql import functions as F

    img = pipeline_out["entities"].filter(
        F.col("entity_type") == '"ORI_IMG"'
    ).first()
    refs = [s for s in img.source_ids if not s.startswith("chunk-")]
    assert refs, "ORI_IMG entity should carry a media_ref source id"
    media = spark.createDataFrame(
        [(refs[0], bytearray(b"JPEGBYTES"))], ["media_ref", "content"]
    )
    out = Q.local_query(
        spark, pipeline_out, f"what does {img.entity_name} show?",
        threshold=0.0, media=media,
    )
    assert img.entity_name in out["mm_entities"]
    assert "+bytes" in out["answer"]  # TemplateAnswerer tags b64-bearing calls
    # without a media table the same query still answers, bytes-free
    out2 = Q.local_query(
        spark, pipeline_out, f"what does {img.entity_name} show?", threshold=0.0
    )
    assert "+bytes" not in out2["answer"]


def test_j13_media_rewrite_in_text_unit_scoring(spark):
    """J13 (reference query.py:44-61): with a media table, one-hop media refs
    rewrite to their associated chunk (raising its relation count); without
    one they contribute nothing; a neighbor citing both a chunk and an image
    associated with the SAME chunk counts once (set semantics)."""
    seeds = spark.createDataFrame(
        [('"A"', 1, ["chunk-1"])], ["entity_name", "rnk", "source_ids"]
    )
    entities = spark.createDataFrame(
        [
            ('"A"', ["chunk-1"]),
            # neighbor cites chunk-1 AND an image associated with chunk-1:
            # must count once, not twice
            ('"B"', ["chunk-1", "img://m1"]),
            # neighbor cites only an image associated with chunk-1
            ('"C"', ["img://m1"]),
            # neighbor with an unmapped media ref: contributes nothing
            ('"D"', ["img://orphan"]),
        ],
        ["entity_name", "source_ids"],
    )
    edges = spark.createDataFrame(
        [('"A"', '"B"'), ('"A"', '"C"'), ('"A"', '"D"')], ["src", "tgt"]
    )
    chunks = spark.createDataFrame(
        [("chunk-1", "some content here", 3)], ["chunk_id", "content", "tokens"]
    )
    media = spark.createDataFrame(
        [("img://m1", "d1", "chunk-1")], ["media_ref", "doc_id", "chunk_id"]
    )

    with_media = Q.related_text_units(
        seeds, entities, edges, chunks, media=media
    ).collect()
    assert len(with_media) == 1
    # B once (set-dedup) + C once via the rewrite; D's orphan ref dropped
    assert with_media[0].relation_counts == 2

    without = Q.related_text_units(seeds, entities, edges, chunks).collect()
    # no rewrite: only B's literal chunk-1 citation counts
    assert without[0].relation_counts == 1
