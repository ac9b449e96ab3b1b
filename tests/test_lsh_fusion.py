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
