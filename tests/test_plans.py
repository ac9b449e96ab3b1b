"""Physical-plan regression tests: the plans we shipped are the plans we
meant (broadcasts where intended, pushdown reaching the scan, partial
aggregation, no accidental nested-loop joins). A perf property that only
lives in a wall-clock number regresses silently; a plan assertion fails
loudly in CI."""

from __future__ import annotations

from pyspark.sql import functions as F


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_parquet_filter_pushdown(spark):
    """A doc_id filter must reach the parquet scan as a pushed filter, and
    the scan must prune to the selected columns only."""
    df = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .filter(F.col("doc_id") < 100)
        .select("doc_id", "text")
    )
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    assert "PushedFilters" in plan and "LessThan(doc_id,100)" in plan
    assert "ReadSchema" in plan
    # pruned read schema: no lang/source/n_chars columns
    read_schema = [l for l in plan.splitlines() if "ReadSchema" in l][0]
    assert "lang" not in read_schema and "n_chars" not in read_schema


def test_exact_dedup_partial_aggregation(spark):
    """Hash-groupBy dedup must plan map-side partial aggregation (two
    HashAggregate levels around one Exchange)."""
    from mmgraphrag_spark.operators.dedup import exact_dedup_groups

    df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    plan = _plan(exact_dedup_groups(df, "doc_id", "text"))
    assert plan.count("HashAggregate") >= 2
    assert "partial_" in plan  # map-side combine before the shuffle


def test_textstats_shuffle_free(spark):
    """Per-row text statistics are pure projections — zero Exchange nodes."""
    from mmgraphrag_spark.operators.textstats import (
        fingerprint,
        language_id,
        quality_features,
        token_counts,
    )

    df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    for op in (language_id, quality_features, token_counts):
        assert "Exchange" not in _plan(op(df, "doc_id", "text")), op.__name__
    assert "Exchange" not in _plan(fingerprint(df, "doc_id", "text"))


def test_simhash_fingerprint_shuffle_free(spark):
    from mmgraphrag_spark.operators.dedup import simhash

    df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    assert "Exchange" not in _plan(simhash(df, "doc_id", "text"))


def test_contract_broadcasts_alias_map(spark):
    """Graph contraction joins the (tiny) alias map via broadcast — a
    shuffle join here would reshuffle the whole edge set twice."""
    from mmgraphrag_spark.operators.fusion import contract

    entities = spark.createDataFrame(
        [('"A"', '"PERSON"', "d", ["c"]), ('"B"', '"GEO"', "d", ["c"])],
        ["entity_name", "entity_type", "description", "source_ids"],
    )
    edges = spark.createDataFrame(
        [('"A"', '"B"', 1.0, "r", ["c"], 1)],
        ["src", "tgt", "weight", "description", "source_ids", "order"],
    )
    aliases = spark.createDataFrame([('"X"', '"A"')], ["alias", "canonical"])
    ents, edgs = contract(entities, edges, aliases)
    for plan in (_plan(ents), _plan(edgs)):
        assert "BroadcastHashJoin" in plan
        assert "CartesianProduct" not in plan


def test_apply_cluster_fusion_broadcasts_small_side(spark):
    """L9 application: every join against the merged-record derivatives
    (pairs / overrides / rename map) broadcasts the SMALL side; the entities
    table itself must never be a broadcast build side (at scale it is
    millions of rows with source_ids arrays), and nothing plans a nested
    loop. The source_ids lookup reaches entities only through a left-semi
    key prune."""
    from mmgraphrag_spark.operators.fusion import apply_cluster_fusion

    entities = spark.createDataFrame(
        [
            ('"I1"', '"IMG_ENTITY"', "d", ["m1"]),
            ('"T1"', '"PERSON"', "d", ["c1"]),
            ('"B"', '"GEO"', "d", ["c2"]),
        ],
        ["entity_name", "entity_type", "description", "source_ids"],
    )
    edges = spark.createDataFrame(
        [('"I1"', '"B"', 1.0, "r", ["c1"], 1)],
        ["src", "tgt", "weight", "description", "source_ids", "order"],
    )
    merged = spark.createDataFrame(
        [("P One", '"PERSON"', "d", ['"I1"'], ['"T1"'])],
        ["entity_name", "entity_type", "description",
         "source_image_entities", "source_text_entities"],
    )
    ents, edgs, aliases = apply_cluster_fusion(entities, edges, merged)
    for plan in (_plan(ents), _plan(edgs), _plan(aliases)):
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan
    # the contracted-entity plan joins its overrides via broadcast
    assert "BroadcastHashJoin" in _plan(ents)


def test_lsh_pairs_equi_join_only(spark):
    """MinHash LSH candidate generation must be a pure equi-join on the
    (band, sig) bucket key — no nested loop anywhere."""
    from mmgraphrag_spark.operators.dedup import lsh_candidate_pairs, minhash_signatures

    df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    sigs = minhash_signatures(df.limit(50), "doc_id", "text")
    plan = _plan(lsh_candidate_pairs(sigs))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_media_features_column_pruned(spark):
    """The media decode UDF must see only (media_ref, mime, content): extra
    columns must be pruned before Arrow serialization."""
    from mmgraphrag_spark.operators.media import media_features

    media = spark.createDataFrame(
        [("m1", "image/png", bytearray(b"xx"), 2, "extra-wide-column")],
        ["media_ref", "mime", "content", "n_bytes", "junk"],
    )
    plan = _plan(media_features(media))
    # the python stage input projection excludes the junk column
    assert "junk" not in plan.split("MapInPandas")[-1].split("\n")[0]


def test_bucketed_join_is_shuffle_free(spark, tmp_path):
    """Two tables bucketed+sorted on the same key and count join with ZERO
    Exchange — the co-located join layout the 100 TB deployment relies on."""
    from mmgraphrag_spark.plans.bucketing import write_bucketed

    docs = spark.range(0, 1000).select(
        F.col("id").alias("doc_id"), (F.col("id") % 7).alias("grp")
    )
    stats = spark.range(0, 1000).select(
        F.col("id").alias("doc_id"), (F.col("id") * 2).alias("score")
    )
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        write_bucketed(docs, "t_docs_b", "doc_id", 8, path=str(tmp_path / "d"))
        write_bucketed(stats, "t_stats_b", "doc_id", 8, path=str(tmp_path / "s"))
        # these test tables are tiny enough to broadcast, which would hide the
        # layout property; at real scale neither side broadcasts, so disable
        # it to expose the bucketed SortMergeJoin the layout guarantees
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = spark.table("t_docs_b").join(spark.table("t_stats_b"), "doc_id")
        plan = _plan(joined)
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan  # co-located: no shuffle on either side
        assert joined.count() == 1000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS t_docs_b")
        spark.sql("DROP TABLE IF EXISTS t_stats_b")


def test_pipeline_stages_never_plan_nested_loops(spark, documents_df):
    """Whole-pipeline audit: capture the physical plan of EVERY stage as it
    commits and assert none of them degenerates into a cartesian/nested-loop
    join — the class of plan that silently turns a 100 TB run quadratic."""
    from mmgraphrag_spark.pipeline import run_pipeline
    from mmgraphrag_spark.plans import LocalCheckpointer

    class RecordingCheckpointer(LocalCheckpointer):
        def __init__(self):
            super().__init__()
            self.plans = {}

        def stage(self, name, df):
            self.plans[name] = _plan(df)
            return super().stage(name, df)

        stage_light = stage

    cp = RecordingCheckpointer()
    run_pipeline(spark, documents_df, checkpointer=cp)
    assert len(cp.plans) >= 10
    for name, plan in cp.plans.items():
        assert "CartesianProduct" not in plan, name
        assert "BroadcastNestedLoopJoin" not in plan, name


def test_mentions_stage_single_exchange(spark, documents_df):
    """The dedup+extraction chain must plan exactly ONE exchange: the dedup
    window's explicit hash(chunk_id, n) repartition, consumed directly by
    MapInPandas. A second (round-robin) exchange re-shuffles every chunk's
    content and was measured as the pipeline's worst 1->4-core anti-scaling
    term (BENCH.md round-4 decomposition) — this pins the fixed plan."""
    from mmgraphrag_spark.operators import extract as X
    from mmgraphrag_spark.operators import spans as S

    chunk_rows = S.chunk_occurrences(S.explode_spans(documents_df)).localCheckpoint()
    chunks = S.dedup_chunk_occurrences(chunk_rows, n_parts=4)
    plan = _plan(X.extract_mentions(chunks, pre_partitioned=True))
    assert plan.count("Exchange") == 1, plan
    assert "REPARTITION_BY_NUM" in plan  # explicit -> AQE cannot coalesce it
    assert "hashpartitioning(chunk_id" in plan
    # round_robin would mean the redundant second exchange came back
    assert "roundrobinpartitioning" not in plan.lower(), plan
