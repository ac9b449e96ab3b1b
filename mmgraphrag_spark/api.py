"""Drop-in facade mirroring the reference's top-level ``MMGraphRAG`` surface.

The reference user writes (mmgraphrag.py:92-141)::

    rag = MMGraphRAG(working_dir=..., input_mode=1)
    rag.index("papers/")
    print(rag.query("What does X relate to?"))

``MMGraphRAGSpark`` keeps those three lines working on Spark: construct with
a working directory and input mode, ``index(path)`` builds the knowledge
graph (tables land under ``working_dir`` the way the reference writes its
``kv_store_*.json`` / GraphML there), ``query(question)`` runs the local
graph-RAG path and returns the answer string. A NEW instance pointed at an
existing working_dir picks the indexed graph up from disk, exactly like the
reference's ``__post_init__`` re-opening existing storage
(mmgraphrag.py:104-124) — index once, query from any process.

Everything here is composition of the library surface (sources/ingest,
pipeline.run_pipeline, query.local_query); the class holds no logic of its
own beyond the reference's mode dispatch (mmgraphrag.py:144-165) and
per-instance caching of the VDB / ANN index across queries.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

#: reference input_mode dispatch (mmgraphrag.py:144-165)
INPUT_MODE_DOCX = 0
INPUT_MODE_PDF = 1
INPUT_MODE_MARKDOWN = 2


class MMGraphRAGSpark:
    """Reference-shaped entry point: ``index(path)`` then ``query(q)``.

    Parameters mirror the knobs a reference user configures on MMGraphRAG /
    its global config: ``input_mode`` (0=docx, 1=pdf, 2=markdown a.k.a.
    MinerU output), the LLM endpoint (offline deterministic backends when
    None — same default split as scripts/submit_job.py), and the query-side
    ``ann_mode``/``top_k``/``threshold`` (storage.py:298-323 defaults).
    Extra ``pipeline_kwargs`` pass straight through to
    :func:`mmgraphrag_spark.pipeline.run_pipeline`.
    """

    _TABLES = ("entities", "edges", "triples", "chunks", "media_spans")

    def __init__(
        self,
        working_dir: str,
        input_mode: int = INPUT_MODE_MARKDOWN,
        spark: SparkSession | None = None,
        llm_base_url: str | None = None,
        llm_api_key: str = "",
        llm_model: str = "gpt-4o-mini",
        ann_mode: str = "exact",
        top_k: int = 10,
        threshold: float = 0.2,
        **pipeline_kwargs,
    ) -> None:
        if input_mode not in (INPUT_MODE_DOCX, INPUT_MODE_PDF, INPUT_MODE_MARKDOWN):
            raise ValueError(f"unknown input_mode: {input_mode!r}")
        self.working_dir = working_dir
        self.input_mode = input_mode
        if spark is None:
            from mmgraphrag_spark.session import build_session

            spark = build_session("mmgraphrag_spark_api")
        self.spark = spark
        self.llm_base_url = llm_base_url
        self.llm_api_key = llm_api_key
        self.llm_model = llm_model
        self.ann_mode = ann_mode
        self.top_k = top_k
        self.threshold = threshold
        self.pipeline_kwargs = pipeline_kwargs
        os.makedirs(working_dir, exist_ok=True)
        self._kg: dict | None = None
        self._media = None
        self._vdb = None
        self._ann_index = None

    # ------------------------------------------------------------------ index

    def _read_input(self, path: str):
        """Mode dispatch (mmgraphrag.py:144-165) -> (documents, media_bytes).

        Every mode surfaces its image bytes as a binary-column table (the
        reference extracts them to ``images/`` on disk): DOCX/PDF from the
        embedded blobs, markdown from the MinerU-layout files the tags
        reference relatively (read_markdown_media). Exotic markdown
        layouts (absolute/external refs) pass ``media_bytes`` through
        ``pipeline_kwargs`` instead."""
        from mmgraphrag_spark.sources import ingest

        if self.input_mode == INPUT_MODE_DOCX:
            return (
                ingest.read_docx_dir(self.spark, path),
                ingest.read_docx_media(self.spark, path),
            )
        if self.input_mode == INPUT_MODE_PDF:
            return (
                ingest.read_pdf_dir(self.spark, path),
                ingest.read_pdf_media(self.spark, path),
            )
        return (
            ingest.read_markdown_dir(self.spark, path),
            ingest.read_markdown_media(self.spark, path),
        )

    def _llm_backends(self) -> dict:
        """Same endpoint->backend split as scripts/submit_job.py: one chat
        client fans into extractor/judge/summarizer; offline deterministic
        backends when no endpoint is configured."""
        if not self.llm_base_url:
            return {}
        from mmgraphrag_spark.backends.llm import (
            ChatClient,
            LLMExtractor,
            LLMJudge,
            LLMSummarizer,
        )

        client = ChatClient(
            self.llm_base_url, api_key=self.llm_api_key, model=self.llm_model
        )
        return {
            "extractor": LLMExtractor(client),
            "judge_backend": LLMJudge(client),
            "summarizer": LLMSummarizer(client),
        }

    def index(self, path: str) -> dict:
        """Build the KG from ``path`` and persist it under ``working_dir``
        (reference aindex, mmgraphrag.py:141-184). Returns the pipeline's
        output dict of DataFrames; subsequent :meth:`query` calls use the
        freshly built tables without re-reading them from disk.

        index() always reflects ``path``: the facade's default checkpoint
        directory is cleared first, because ParquetCheckpointer otherwise
        resumes committed stages and a re-index over a DIFFERENT corpus
        would silently return the previous graph. Users who want
        crash-resume semantics pass ``checkpointer=`` explicitly (or use
        scripts/submit_job.py, where --checkpoint is a deliberate choice)
        and own the stale-stage trade-off."""
        from mmgraphrag_spark.pipeline import run_pipeline
        from mmgraphrag_spark.plans import ParquetCheckpointer, fs_delete

        docs, media_bytes = self._read_input(path)
        # NO eager emptiness probe here: isEmpty() on the media table forces
        # a full unzip/parse pass over every file before the pipeline even
        # starts (limit(1) only short-circuits when a row EXISTS), just to
        # learn a text-only corpus has no media. An empty media table flows
        # through the pipeline's media stages (cheap empty jobs) and lands
        # as an empty parquet query() handles fine.
        kwargs = {**self._llm_backends(), **self.pipeline_kwargs}
        if "checkpointer" not in kwargs:
            ckpt_dir = os.path.join(self.working_dir, "checkpoint")
            # the cached _kg DataFrames are backed by the checkpoint parquet
            # about to be deleted — drop them FIRST, so a failed re-index
            # leaves query() reloading the intact on-disk tables instead of
            # crashing on dangling snapshots
            self._kg = None
            self._media = None
            self._vdb = None
            self._ann_index = None
            fs_delete(self.spark, ckpt_dir)
            kwargs["checkpointer"] = ParquetCheckpointer(self.spark, ckpt_dir)
        if media_bytes is not None:
            kwargs.setdefault("media_bytes", media_bytes)
        out = run_pipeline(self.spark, docs, **kwargs)
        for name in self._TABLES:
            out[name].write.mode("overwrite").parquet(
                os.path.join(self.working_dir, name)
            )
        media = kwargs.get("media_bytes")
        media_dir = os.path.join(self.working_dir, "media")
        if media is not None:
            media.write.mode("overwrite").parquet(media_dir)
            # serve queries from the written parquet, not the source scan —
            # a binaryFile-backed media plan would re-read every image byte
            # on each query that touches it (CLAUDE.md rule 8 precedent)
            media = self.spark.read.parquet(media_dir)
        else:
            fs_delete(self.spark, media_dir)
        # refreshed graph invalidates every query-side cache, INCLUDING a
        # persisted ann_index built over the previous graph's vectors —
        # leaving it would make _query_state load stale entities
        fs_delete(self.spark, os.path.join(self.working_dir, "ann_index"))
        self._kg = {name: out[name] for name in self._TABLES}
        self._media = media
        self._vdb = None
        self._ann_index = None
        return out

    # ------------------------------------------------------------------ query

    def _load_kg(self) -> None:
        """Re-open an already-indexed working_dir (reference __post_init__
        storage reload, mmgraphrag.py:104-124)."""
        from mmgraphrag_spark.plans import fs_exists

        if self._kg is not None:
            return
        ent_dir = os.path.join(self.working_dir, "entities")
        if not fs_exists(self.spark, ent_dir):
            raise FileNotFoundError(
                f"no indexed graph under {self.working_dir!r}: call index() first"
            )
        self._kg = {
            name: self.spark.read.parquet(os.path.join(self.working_dir, name))
            for name in self._TABLES
            if fs_exists(self.spark, os.path.join(self.working_dir, name))
        }
        media_dir = os.path.join(self.working_dir, "media")
        self._media = (
            self.spark.read.parquet(media_dir)
            if fs_exists(self.spark, media_dir)
            else None
        )

    def _query_state(self):
        """VDB / ANN index built once per instance and shared across
        queries (a persisted submit_job --build-ann-index directory under
        working_dir/ann_index is loaded instead of refit). The
        load-or-build decision itself lives in
        query.load_or_build_query_state (shared with scripts/query_job.py)."""
        from mmgraphrag_spark.query import load_or_build_query_state

        if self._vdb is None and self._ann_index is None:
            self._vdb, self._ann_index = load_or_build_query_state(
                self.spark, self._kg["entities"], self.working_dir, self.ann_mode
            )
        elif self.ann_mode == "ivf" and self._ann_index is None:
            # ann_mode flipped to ivf after a non-ivf query on this
            # instance: fit from the already-built VDB
            from mmgraphrag_spark.operators.similarity import build_ivf_index
            from mmgraphrag_spark.query import vdb_as_corpus

            self._ann_index = build_ivf_index(vdb_as_corpus(self._vdb))
        return self._vdb, self._ann_index

    def query(self, question: str) -> str:
        """Local graph-RAG query (reference aquery -> local_query,
        mmgraphrag.py:126-135); returns the answer string. Context +
        answer are appended to the ``working_dir/query_log`` parquet sink
        (S9)."""
        from mmgraphrag_spark.query import local_query

        self._load_kg()
        vdb, ann_index = self._query_state()
        answerer = None
        if self.llm_base_url:
            from mmgraphrag_spark.backends.llm import ChatClient, LLMAnswerer

            answerer = LLMAnswerer(
                ChatClient(
                    self.llm_base_url, api_key=self.llm_api_key, model=self.llm_model
                )
            )
        out = local_query(
            self.spark,
            self._kg,
            question,
            top_k=self.top_k,
            threshold=self.threshold,
            answerer=answerer,
            vdb=vdb,
            log_dir=os.path.join(self.working_dir, "query_log"),
            ann_mode=self.ann_mode,
            ann_index=ann_index,
            media=self._media,
        )
        return out["answer"]
