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


def _write_stream_files(spark, input_dir, batches):
    """Write one parquet file per micro-batch with increasing mtimes so the
    file source (oldest-first) replays them in order."""
    import time as _time

    from pyspark.sql.types import (
        LongType,
        StringType,
        StructField,
        StructType,
        TimestampType,
    )

    schema_ = StructType(
        [
            StructField("ts", TimestampType()),
            StructField("source", StringType()),
            StructField("n_chars", LongType()),
        ]
    )
    for i, rows in enumerate(batches):
        p = os.path.join(input_dir, f"b{i}")
        spark.createDataFrame(rows, schema_).coalesce(1).write.mode(
            "overwrite"
        ).parquet(p)
        base = 1_700_000_000 + i * 100
        for root, _, files in os.walk(p):
            for f in files:
                os.utime(os.path.join(root, f), (base, base))
    return schema_


def test_watermark_drops_late_rows(spark, tmp_path):
    """Watermarked windowed agg: a row arriving after the watermark passed
    its window is DROPPED — the finalized window's count excludes it."""
    from datetime import datetime

    from mmgraphrag_spark.streaming.windows import windowed_ingest_stats

    d = lambda m, s=0: datetime(2026, 1, 1, 10, m, s)
    input_dir = str(tmp_path / "in")
    os.makedirs(input_dir)
    schema_ = _write_stream_files(
        spark,
        input_dir,
        [
            # batch 0: window 10:00 gets one row; max event time 10:05
            [(d(0, 30), "web", 100), (d(5), "web", 10)],
            # batch 1: watermark (10:03) now evicts + emits the 10:00 window
            [(d(6), "web", 20)],
            # batch 2: row for the ALREADY-FINALIZED 10:00 window -> dropped
            # (a late row arriving before eviction would still merge — Spark
            # finalizes state one batch after the watermark passes it)
            [(d(0, 45), "web", 999), (d(7), "web", 30)],
        ],
    )
    stream = (
        spark.readStream.schema(schema_)
        .option("maxFilesPerTrigger", "1")
        .parquet(input_dir + "/*")
    )
    out = windowed_ingest_stats(
        stream, window_duration="1 minute", watermark_delay="2 minutes"
    )
    q = (
        out.writeStream.format("memory")
        .queryName("wm_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    rows = {
        (r.window_start.minute, r.n_docs, r.total_value)
        for r in spark.sql("select * from wm_test").collect()
    }
    # the 10:00 window finalized with ONE row; the 999-char row never lands
    assert (0, 1, 100) in rows
    assert not any(v >= 999 for (_, _, v) in rows)
    assert len([m for (m, _, _) in rows if m == 0]) == 1  # emitted exactly once


def test_running_source_totals_stateful(spark, tmp_path):
    """applyInPandasWithState: per-key totals persist across micro-batches."""
    from datetime import datetime

    from mmgraphrag_spark.streaming.windows import running_source_totals

    d = lambda m: datetime(2026, 1, 1, 10, m)
    input_dir = str(tmp_path / "in2")
    os.makedirs(input_dir)
    schema_ = _write_stream_files(
        spark,
        input_dir,
        [
            [(d(0), "web", 1), (d(0), "web", 1), (d(0), "pdf", 1)],
            [(d(1), "web", 1)],
        ],
    )
    stream = (
        spark.readStream.schema(schema_)
        .option("maxFilesPerTrigger", "1")
        .parquet(input_dir + "/*")
    )
    q = (
        running_source_totals(stream)
        .writeStream.format("memory")
        .queryName("totals_test")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    q.stop()  # belt and braces: never leak a running query into the session
    rows = [
        (r.source, r.total, r.batch_rows)
        for r in spark.sql("select * from totals_test").collect()
    ]
    assert ("web", 2, 2) in rows   # batch 0
    assert ("web", 3, 1) in rows   # batch 1 accumulates prior state
    assert ("pdf", 1, 1) in rows


def test_redelivered_media_not_double_counted(spark, tmp_path):
    """A document re-delivered in a LATER batch (new batch_id, so the replay
    guard passes): text chunks are anti-joined by seen_chunks AND media spans
    by seen_media — scene entities/containment weights must not double."""
    from mmgraphrag_spark.streaming.incremental import IncrementalIndexer

    docs = spark.createDataFrame(
        [
            ("d1", [
                ("text", "ENTITY_1 is a PERSON associated with topic_0.", "", 0),
                ("image", "Figure: ENTITY_1.", "img://d1/0", 1),
            ]),
        ],
        schema.DOCUMENTS,
    )
    once = IncrementalIndexer(spark, str(tmp_path / "s1"))
    once.process_batch(docs, 0)
    e1, g1 = once.finalize()
    base_e = {r.entity_name: r.description for r in e1.collect()}
    base_w = {(r.src, r.tgt): r.weight for r in g1.collect()}

    twice = IncrementalIndexer(spark, str(tmp_path / "s2"))
    twice.process_batch(docs, 0)
    twice.process_batch(docs, 1)  # re-delivery under a NEW batch id
    e2, g2 = twice.finalize()
    got_e = {r.entity_name: r.description for r in e2.collect()}
    got_w = {(r.src, r.tgt): r.weight for r in g2.collect()}
    assert got_e == base_e
    assert got_w == base_w  # weight-10 containment edge NOT summed to 20


def test_pre_upgrade_state_poisons_finalize_fused(spark, tmp_path):
    """State committed by a version WITHOUT the fusion tables: a later batch
    must not let finalize_fused silently fuse over that batch's mentions
    only — it raises, while the A1/A2 stream keeps working."""
    import os
    import shutil

    import pytest

    from mmgraphrag_spark.streaming.incremental import IncrementalIndexer

    docs = spark.createDataFrame(
        [("d1", [("text", "ENTITY_1 is a PERSON associated with topic_0.", "", 0)])],
        schema.DOCUMENTS,
    )
    docs2 = spark.createDataFrame(
        [("d2", [("text", "ENTITY_2 is a GEO associated with topic_1.", "", 0)])],
        schema.DOCUMENTS,
    )
    state = str(tmp_path / "state_old")
    ix = IncrementalIndexer(spark, state)
    ix.process_batch(docs, 0)
    # simulate the pre-round-3 layout: drop the fusion tables from v0
    for t in ("text_ment", "img_ment", "chunk_occ"):
        shutil.rmtree(os.path.join(state, "state_v0", t))
    ix.process_batch(docs2, 1)
    with pytest.raises(ValueError, match="fusion tables"):
        ix.finalize_fused()
    ents, _ = ix.finalize()  # plain A1/A2 finalize still works
    assert {r.entity_name for r in ents.collect()} >= {'"ENTITY_1"', '"ENTITY_2"'}


def test_incremental_fused_equals_batch(spark, corpus, pipeline_out, tmp_path):
    """§2.10 end-to-end: three interleaved micro-batches (media spans
    included), then finalize_fused runs blocking -> judge -> CC ->
    contraction over the accumulated state — canonical TRIPLES and the alias
    map must equal a fresh batch run over the full corpus."""
    from mmgraphrag_spark.streaming.incremental import IncrementalIndexer

    rows = datagen.corpus_rows(corpus)
    third = max(1, len(rows) // 3)
    batches = [rows[:third], rows[third: 2 * third], rows[2 * third:]]
    assert all(batches), "need three non-empty batches"
    # the corpus must actually exercise the media path
    assert any(
        s[0] != "text" for rows_ in batches for r in rows_ for s in r[1]
    )

    indexer = IncrementalIndexer(spark, str(tmp_path / "state_fused"))
    for i, b in enumerate(batches):
        indexer.process_batch(spark.createDataFrame(b, schema.DOCUMENTS), i)

    fused = indexer.finalize_fused()

    got_t = {(r.subj, r.pred, r.obj, r.weight) for r in fused["triples"].collect()}
    exp_t = {
        (r.subj, r.pred, r.obj, r.weight)
        for r in pipeline_out["triples"].collect()
    }
    assert got_t == exp_t

    got_a = {(r.alias, r.canonical) for r in fused["aliases"].collect()}
    exp_a = {(r.alias, r.canonical) for r in pipeline_out["aliases"].collect()}
    assert got_a == exp_a

    # post-contraction entity set matches too (names only: source sets were
    # already asserted exactly by the pre-fusion equivalence test)
    got_e = {r.entity_name for r in fused["entities"].collect()}
    exp_e = {r.entity_name for r in pipeline_out["entities"].collect()}
    assert got_e == exp_e


def test_incremental_fused_cluster_mode_equals_batch(
    spark, corpus, documents_df, tmp_path
):
    """§2.10 x L9: finalize_fused(cluster_fuser=...) must reproduce the batch
    pipeline's cluster-fusion tail — same triples, aliases and entity names
    as run_pipeline(..., cluster_fuser=...) over the full corpus."""
    from mmgraphrag_spark.pipeline import run_pipeline
    from mmgraphrag_spark.streaming.incremental import IncrementalIndexer

    class _PrefixFuser:
        """Deterministic L9 stand-in: merge each image entity with the first
        same-label text entity under an invented FUSED_ name (defined inside
        the test so cloudpickle ships it by value to executors)."""

        def fuse(self, clusters, image_entities):
            by_label = {c["label"]: c["text_entities"] for c in clusters}
            out = []
            for img in image_entities:
                texts = by_label.get(img["label"])
                if texts:
                    tname = texts[0]["entity_name"].strip('"')
                    out.append(
                        {
                            "entity_name": f"FUSED_{tname}",
                            "entity_type": '"PERSON"',
                            "description": "cluster-fused",
                            "source_image_entities": [img["entity_name"]],
                            "source_text_entities": [texts[0]["entity_name"]],
                        }
                    )
            return out

    batch = run_pipeline(spark, documents_df, cluster_fuser=_PrefixFuser())

    rows = datagen.corpus_rows(corpus)
    third = max(1, len(rows) // 3)
    batches = [rows[:third], rows[third: 2 * third], rows[2 * third:]]
    indexer = IncrementalIndexer(spark, str(tmp_path / "state_l9"))
    for i, b in enumerate(batches):
        indexer.process_batch(spark.createDataFrame(b, schema.DOCUMENTS), i)
    fused = indexer.finalize_fused(cluster_fuser=_PrefixFuser())

    got_t = {(r.subj, r.pred, r.obj, r.weight) for r in fused["triples"].collect()}
    exp_t = {(r.subj, r.pred, r.obj, r.weight) for r in batch["triples"].collect()}
    assert got_t == exp_t

    got_a = {(r.alias, r.canonical) for r in fused["aliases"].collect()}
    exp_a = {(r.alias, r.canonical) for r in batch["aliases"].collect()}
    assert got_a == exp_a

    got_e = {r.entity_name for r in fused["entities"].collect()}
    exp_e = {r.entity_name for r in batch["entities"].collect()}
    assert got_e == exp_e
    assert any(n.startswith('"FUSED_') for n in got_e)


def test_incremental_image_extractor_equals_batch(spark, corpus, documents_df, tmp_path):
    """§2.10 x L4-L6: incremental indexing with the MLLM image extractor
    reproduces the batch pipeline's pre-fusion entities/edges. A single
    scripted reply makes every LLM call deterministic regardless of thread
    interleaving (the deterministic ORI_IMG/containment tail carries the
    image-side structure)."""
    from mmgraphrag_spark.backends.llm import (
        ChatClient,
        MllmImageExtractor,
        ScriptedTransport,
    )
    from mmgraphrag_spark.pipeline import run_pipeline
    from mmgraphrag_spark.streaming.incremental import IncrementalIndexer

    def mk_backend():
        return MllmImageExtractor(
            ChatClient("http://fake", transport=ScriptedTransport(["a crop"]))
        )

    batch = run_pipeline(spark, documents_df, image_extractor=mk_backend())

    rows = datagen.corpus_rows(corpus)
    half = max(1, len(rows) // 2)
    indexer = IncrementalIndexer(
        spark, str(tmp_path / "state_img"), image_extractor=mk_backend()
    )
    indexer.process_batch(spark.createDataFrame(rows[:half], schema.DOCUMENTS), 0)
    indexer.process_batch(spark.createDataFrame(rows[half:], schema.DOCUMENTS), 1)
    ents, edges = indexer.finalize()

    got_e = {
        (r.entity_name, r.entity_type) for r in ents.collect()
    }
    exp_e = {
        (r.entity_name, r.entity_type)
        for r in batch["entities_prefusion"].collect()
    }
    assert got_e == exp_e
    assert any(t == '"ORI_IMG"' for _, t in got_e)

    got_g = {(r.src, r.tgt, r.weight) for r in edges.collect()}
    exp_g = {
        (r.src, r.tgt, r.weight) for r in batch["edges_prefusion"].collect()
    }
    assert got_g == exp_g


def test_streamed_image_extractor_receives_media_bytes(spark, documents_df, tmp_path):
    """The IncrementalIndexer(media_bytes=) seam: the streamed L4-L6 path
    must send the SAME whole-image base64 payload a batch run would — a
    transport that tags its scene-extraction reply by whether an image_url
    part arrived proves the bytes cross into the paid call (and a control
    indexer without the table proves the assertion is sharp)."""
    import json as _json

    from pyspark.sql import functions as F

    from mmgraphrag_spark.backends.llm import ChatClient, MllmImageExtractor
    from mmgraphrag_spark.streaming.incremental import IncrementalIndexer

    def transport(url, headers, payload):
        msgs = payload["messages"]

        def text_of(m):
            c = m.get("content")
            if isinstance(c, list):
                return " ".join(
                    p.get("text", "") for p in c if isinstance(p, dict)
                )
            return c or ""

        has_img = any(
            isinstance(m.get("content"), list)
            and any(
                isinstance(p, dict) and p.get("type") == "image_url"
                for p in m["content"]
            )
            for m in msgs
        )
        tag = "SAW_BYTES" if has_img else "NO_BYTES"
        if any("scene graph" in text_of(m) for m in msgs):
            reply = f'("entity"<|>"Mark"<|>"PERSON"<|>"{tag}")<|COMPLETE|>'
        else:
            reply = "a crop"
        return _json.dumps({"choices": [{"message": {"content": reply}}]})

    media_bytes = (
        documents_df.select(F.explode("spans").alias("s"))
        .filter(F.col("s.kind") == "image")
        .select(F.col("s.media_ref").alias("media_ref"))
        .distinct()
        .withColumn("content", F.encode(F.concat(F.lit("IMG-"), "media_ref"), "utf-8"))
    )
    assert media_bytes.count() > 0

    def mark_desc(state_dir, tbl):
        idx = IncrementalIndexer(
            spark, str(tmp_path / state_dir),
            image_extractor=MllmImageExtractor(
                ChatClient("http://fake", transport=transport)
            ),
            media_bytes=tbl,
        )
        idx.process_batch(documents_df, 0)
        ents, _ = idx.finalize()
        rows = ents.filter(F.col("entity_name") == '"MARK"').collect()
        assert rows, "scene-extraction record did not materialize"
        return rows[0].description

    assert "SAW_BYTES" in mark_desc("state_b64", media_bytes)
    assert "NO_BYTES" in mark_desc("state_nob64", None)  # control
