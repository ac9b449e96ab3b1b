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


def test_llm_judged_alias_pairs_are_durable(spark, documents_df, tmp_path):
    """With an LLM judge plugged in, the judged alias_pairs stage must
    durable-commit (paid + nondeterministic calls): a crash-resume reads the
    verdicts back instead of re-spending them and possibly emitting a
    different alias set. Without a judge the stage stays a light commit
    (asserted in test_parquet_checkpoint_commit_and_resume).

    Judge classes are defined in-function so cloudpickle ships them by value
    to the Python workers (the test module is not importable there)."""

    class FirstCandidateJudge:
        """Stand-in for a paid LLM judge: picks the first offered candidate."""

        def judge(self, image_name, image_description, candidates):
            return candidates[0] if candidates else None

    class ExplodingJudge:
        """Fails if invoked — proves resume re-reads judged verdicts."""

        def judge(self, *a, **k):
            raise AssertionError("judge re-ran on a committed alias_pairs stage")

    root = str(tmp_path / "ckpt3")
    cp1 = ParquetCheckpointer(spark, root)
    out1 = run_pipeline(
        spark, documents_df, judge_backend=FirstCandidateJudge(), checkpointer=cp1
    )
    t1 = _triples_set(out1)
    marks = {m["stage"]: m for m in cp1.manifest()}
    assert "alias_pairs" in marks and marks["alias_pairs"]["rows"] > 0

    out2 = run_pipeline(
        spark,
        documents_df,
        extractor=ExplodingExtractor(),
        judge_backend=ExplodingJudge(),
        checkpointer=ParquetCheckpointer(spark, root),
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
