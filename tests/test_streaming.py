"""Structured Streaming incremental indexing: two micro-batches must land the
exact same pre-fusion entities/edges as one batch run over all docs."""

from __future__ import annotations

import os

from mmgraphrag_spark import datagen, schema
from mmgraphrag_spark.streaming import incremental_index_stream


def test_incremental_equals_batch(spark, corpus, documents_df, pipeline_out, tmp_path):
    input_dir = str(tmp_path / "docs_in")
    state_dir = str(tmp_path / "state")
    rows = datagen.corpus_rows(corpus)
    half = len(rows) // 2
    # two parquet files = two micro-batches (availableNow may fold them; the
    # state merge is exercised either way, and maxFilesPerTrigger forces 2)
    spark.createDataFrame(rows[:half], schema.DOCUMENTS).write.mode("overwrite").parquet(
        os.path.join(input_dir, "b0")
    )
    spark.createDataFrame(rows[half:], schema.DOCUMENTS).write.mode("append").parquet(
        os.path.join(input_dir, "b1")
    )

    stream = (
        spark.readStream.schema(schema.DOCUMENTS)
        .option("maxFilesPerTrigger", "1")
        .parquet(input_dir + "/*")
    )
    from mmgraphrag_spark.streaming.incremental import IncrementalIndexer

    indexer = IncrementalIndexer(spark, state_dir)
    q = (
        stream.writeStream.foreachBatch(indexer.process_batch)
        .option("checkpointLocation", os.path.join(state_dir, "_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)

    ents, edges = indexer.finalize()
    got_e = {
        r.entity_name: (r.entity_type, r.description, frozenset(r.source_ids))
        for r in ents.collect()
    }
    exp_e = {
        r.entity_name: (r.entity_type, r.description, frozenset(r.source_ids))
        for r in pipeline_out["entities_prefusion"].collect()
    }
    assert got_e == exp_e

    got_g = {
        (r.src, r.tgt): (r.weight, r.description, frozenset(r.source_ids), r["order"])
        for r in edges.collect()
    }
    exp_g = {
        (r.src, r.tgt): (r.weight, r.description, frozenset(r.source_ids), r["order"])
        for r in pipeline_out["edges_prefusion"].collect()
    }
    assert got_g == exp_g
    # state actually advanced across micro-batches
    assert indexer._latest() >= 1

    # at-least-once replay: foreachBatch re-delivering an already-committed
    # batch_id (crash between state commit and stream-checkpoint advance) must
    # be a no-op — the additive cnt/weight aggregates would otherwise
    # double-count even though seen_chunks guards extraction.
    last = indexer._latest_marker()
    replay_docs = spark.createDataFrame(rows[half:], schema.DOCUMENTS)
    indexer.process_batch(replay_docs, last["batch_id"])
    assert indexer._latest_marker() == last  # no new state version
    ents2, edges2 = indexer.finalize()
    got_e2 = {
        r.entity_name: (r.entity_type, r.description, frozenset(r.source_ids))
        for r in ents2.collect()
    }
    assert got_e2 == exp_e
