"""Checkpoint/resume tests: commit markers, lineage counters, resume-equals-
fresh-run, and stage skip after a simulated kill."""

from __future__ import annotations

import pytest

from mmgraphrag_spark.pipeline import run_pipeline
from mmgraphrag_spark.plans import ParquetCheckpointer


class ExplodingExtractor:
    """Backend that fails if invoked — proves resumed runs skip the stage."""

    def map_batches(self, it):
        raise AssertionError("extractor re-ran on a committed stage")
        yield  # pragma: no cover


def _triples_set(out):
    return {(r.subj, r.pred, r.obj, r.weight) for r in out["triples"].collect()}


def test_parquet_checkpoint_commit_and_resume(spark, documents_df, tmp_path):
    root = str(tmp_path / "ckpt")
    cp1 = ParquetCheckpointer(spark, root)
    out1 = run_pipeline(spark, documents_df, checkpointer=cp1)
    t1 = _triples_set(out1)
    manifest = cp1.manifest()
    names = {m["stage"] for m in manifest}
    # tiny alias stages are light commits and chunk dedup is lazy (runs
    # inside the mentions stage) — neither is in the durable manifest
    assert {"chunk_rows", "mentions", "entities", "edges"} <= names
    assert not {"aliases", "alias_pairs", "chunks"} & names
    # lineage counters: per-partition rows sum to the stage rowcount
    for m in manifest:
        assert m["rows"] == sum(n for _, n in m["partitions"])

    # resume: same root, an extractor that would fail if the mentions stage
    # re-ran -> committed stages must be loaded, not recomputed
    cp2 = ParquetCheckpointer(spark, root)
    out2 = run_pipeline(
        spark, documents_df, extractor=ExplodingExtractor(), checkpointer=cp2
    )
    assert _triples_set(out2) == t1


def test_partial_checkpoint_resumes_midway(spark, documents_df, tmp_path):
    """Simulated kill: only early stages committed -> rerun recomputes the
    rest and lands the same result as a fresh run."""
    root = str(tmp_path / "ckpt2")
    full = run_pipeline(spark, documents_df)
    expected = _triples_set(full)

    cp = ParquetCheckpointer(spark, root)
    from mmgraphrag_spark.operators import spans as S

    spans = S.explode_spans(documents_df)
    cp.stage("occurrences", S.chunk_occurrences(spans))
    cp.stage("chunks", S.chunk_text_spans(spans))
    # "killed" here: no marker for mentions onward
    assert cp.committed("chunks") and not cp.committed("mentions")

    out = run_pipeline(spark, documents_df, checkpointer=ParquetCheckpointer(spark, root))
    assert _triples_set(out) == expected
