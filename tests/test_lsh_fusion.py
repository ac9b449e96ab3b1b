"""Scale-path fusion blocking (MinHash/LSH on normalized-name char n-grams)
must recover the same alias map as the neighborhood parity path."""

from __future__ import annotations

from mmgraphrag_spark import datagen
from mmgraphrag_spark.pipeline import run_pipeline


def test_lsh_blocking_alias_pr(spark, documents_df, corpus):
    out = run_pipeline(spark, documents_df, blocking="lsh")
    expected = datagen.oracle_alias(corpus)
    got = {
        r.alias: r.canonical
        for r in out["aliases"].collect()
        if r.alias.endswith('(IMAGE)"')
    }
    tp = sum(1 for a, c in got.items() if expected.get(a) == c)
    precision = tp / max(len(got), 1)
    recall = tp / max(len(expected), 1)
    assert precision >= 0.95, f"precision {precision:.3f}"
    assert recall >= 0.95, f"recall {recall:.3f}"


def test_lsh_blocking_triples_pr(spark, documents_df, corpus):
    out = run_pipeline(spark, documents_df, blocking="lsh")
    expected = datagen.oracle_triples(corpus)
    got = {(r.subj, r.obj, r.weight) for r in out["triples"].collect()}
    tp = len(got & expected)
    assert tp / max(len(got), 1) >= 0.95
    assert tp / max(len(expected), 1) >= 0.95


def test_embedding_blocks_group_similar_text(spark):
    """Embedding blocking: an image/text pair with IDENTICAL name+description
    text embeds identically -> same sign-bit bucket -> shared block; the img
    side multi-probes Hamming-1 so near-identical embeddings still collide."""
    from mmgraphrag_spark.operators import fusion as FU

    ents = spark.createDataFrame(
        [
            ('"SOLAR PANEL"', "text", "a photovoltaic module on a roof"),
            ('"SOLAR PANEL"', "img", "a photovoltaic module on a roof"),
            ('"UNRELATED"', "text", "completely different topic entirely"),
        ],
        ["entity_name", "kind", "description"],
    )
    blocks = FU.embedding_blocks(ents)
    by_block = {}
    for r in blocks.collect():
        by_block.setdefault(r.block_id, set()).add((r.entity_name, r.kind))
    assert any(
        {('"SOLAR PANEL"', "text"), ('"SOLAR PANEL"', "img")} <= m
        for m in by_block.values()
    )


def test_pipeline_embedding_blocking_end_to_end(spark, corpus, documents_df, pipeline_out):
    """blocking='embedding' resolves the derived corpus's image aliases the
    same way the neighborhood path does (scene crops carry their text
    entity's name+description text, so embeddings collide)."""
    from mmgraphrag_spark.pipeline import run_pipeline

    out = run_pipeline(spark, documents_df, blocking="embedding")
    got = {(r.alias, r.canonical) for r in out["aliases"].collect()}
    exp = {(r.alias, r.canonical) for r in pipeline_out["aliases"].collect()}
    # embedding blocking must find (nearly) all the neighborhood path's
    # aliases; on this corpus crops mirror text entities, and multi-table
    # sign-bit LSH holds >=0.9 recall even with non-semantic hash embeddings
    assert len(got & exp) >= len(exp) * 0.9, (got, exp)
