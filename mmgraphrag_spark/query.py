"""Local graph-RAG query path (SURVEY.md §3.2; reference query.py:354-469).

Pipeline: embed(question) -> ANN top-k entities (cosine >= threshold, J8/J9/W6)
-> rehydrate node attrs + degree rank (J10, A6) -> most-related text units
(seed chunks + 1-hop co-occurrence scoring, J11/J12, W4) -> most-related edges
(degree+weight rank, W5) -> token-budget truncation (A10) -> three CSV context
sections (P12) -> answer backend (L11; deterministic template offline).

Embedding backend is the M1 seam: a vectorized pandas UDF. Offline mode uses
deterministic feature hashing (token -> signed bucket) of the same shape a
sentence-transformer backend would produce; swap ``embed_fn`` for a real model.

Scale notes: the entity VDB is an embeddings table; ANN is a broadcast of the
(single) query vector against it — one scan, no shuffle until top-k ranking.
Degree is a two-way explode + groupBy (one shuffle). All later joins key on
entity_name / chunk_id with the query-side relation tiny -> broadcast.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mmgraphrag_spark.functions.vectors import cosine_similarity_col
from mmgraphrag_spark.schema import EMBED_DIM


# ---------------------------------------------------------------------------
# M1: embedding backend (deterministic feature hashing; pluggable)
# ---------------------------------------------------------------------------

def hash_embed_text(text: str, dim: int = EMBED_DIM) -> list[float]:
    """Deterministic unit-norm embedding: each token adds +-1 to a hashed
    bucket (sign from the hash's next byte). Same function drives both the
    entity VDB and the query vector, so cosine similarity is meaningful."""
    v = np.zeros(dim, dtype=np.float64)
    for tok in (text or "").lower().split():
        h = hashlib.md5(tok.encode()).digest()
        v[h[0] % dim] += 1.0 if h[1] % 2 else -1.0
    n = np.linalg.norm(v)
    return (v / n if n > 0 else v).tolist()


def build_entity_vdb(entities: DataFrame, backend=None) -> DataFrame:
    """Entity VDB rows (reference create_EntityVDB, fusion.py:100-153):
    embed entity_name + description; returns (entity_name, vec).

    ``backend`` implements ``embed(texts) -> list[vec]`` (see
    backends/embeddings.py: HashEmbedBackend offline default,
    SentenceTransformerBackend in production — gated on the library)."""
    from mmgraphrag_spark.backends.embeddings import HashEmbedBackend

    backend = backend or HashEmbedBackend()

    def run(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame(
                {
                    "entity_name": pdf["entity_name"],
                    "vec": backend.embed(list(pdf["text"])),
                }
            )

    src = entities.select(
        "entity_name",
        F.concat_ws(" ", "entity_name", "description").alias("text"),
    )
    return src.mapInPandas(run, "entity_name string, vec array<double>")


def load_or_build_query_state(
    spark: SparkSession,
    entities: DataFrame,
    base_dir: str,
    ann_mode: str,
    embed_backend=None,
) -> tuple[DataFrame | None, tuple | None]:
    """(vdb, ann_index) for a query service — the ONE home of the
    load-or-build decision (scripts/query_job.py and api.MMGraphRAGSpark
    both route through here so the persisted-index layout/commit-marker
    convention has a single consumer). When ``ann_mode == "ivf"`` and a
    persisted ``<base_dir>/ann_index`` exists (its ``centroids/`` directory
    is the commit marker save_ivf_index writes last), load it — no VDB
    scan, embed, or quantizer refit at query time at all. Otherwise build
    the VDB once (localCheckpoint'ed for reuse across questions) and, for
    ivf, fit the index from it."""
    import os

    from mmgraphrag_spark.plans import fs_exists

    idx_dir = os.path.join(base_dir, "ann_index")
    if ann_mode == "ivf" and fs_exists(spark, os.path.join(idx_dir, "centroids")):
        from mmgraphrag_spark.operators.similarity import load_ivf_index

        return None, load_ivf_index(spark, idx_dir)
    vdb = build_entity_vdb(entities, backend=embed_backend).localCheckpoint()
    ann_index = None
    if ann_mode == "ivf":
        from mmgraphrag_spark.operators.similarity import build_ivf_index

        ann_index = build_ivf_index(vdb_as_corpus(vdb))
    return vdb, ann_index


def vdb_as_corpus(vdb: DataFrame) -> DataFrame:
    """Project the entity VDB into the (vec_id, embedding) corpus shape the
    operators/similarity functions consume — the single home of that schema
    contract (every IVF index builder call site routes through here)."""
    return vdb.select(
        F.col("entity_name").alias("vec_id"), F.col("vec").alias("embedding")
    )


# ---------------------------------------------------------------------------
# retrieval
# ---------------------------------------------------------------------------

def one_partition_key(col: str):
    """Constant window-partition key marking an INTENTIONAL single partition
    (input bounded by construction) without tripping Spark's "No Partition
    Defined" scale warning — which fires only on an EMPTY partition spec.
    NULL-safe: every row lands in the one group even when ``col`` is null.
    ORDER MATTERS: coalesce(length(c) * 0, 0) — the *0 child is nullable so
    Catalyst can't fold the whole thing to a literal (coalesce(length, 0)*0
    IS non-nullable -> folds to 0 -> the foldable key is dropped from the
    spec and the warning fires even on a bounded input)."""
    return F.coalesce(F.length(col) * 0, F.lit(0))


def _rank_bounded(scored: DataFrame, top_k: int) -> DataFrame:
    """Rank <= top_k pre-limited rows (the filter also ENFORCES the bound —
    an unbounded caller gets top_k rows, not a full global ranking)."""
    w = Window.partitionBy(one_partition_key("entity_name")).orderBy(
        F.desc("sim"), F.asc("entity_name")
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= top_k)
        .select("entity_name", F.col("sim"), "rnk")
    )


def ann_entities(
    vdb: DataFrame,
    query_vec: list[float],
    top_k: int = 10,
    threshold: float = 0.2,
) -> DataFrame:
    """J9/W6: cosine >= threshold, top_k by similarity (storage.py:298-323).

    This is THE per-query hot path — at 100x entities a global row_number
    window would move every above-threshold row to one partition. Instead
    orderBy + limit plans as TakeOrderedAndProject (per-partition top-k,
    k-row merge), fully distributed; only the <= top_k survivors are ranked.
    """
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    scored = vdb.withColumn("sim", cosine_similarity_col(F.col("vec"), q)).filter(
        F.col("sim") >= threshold
    )
    top = scored.orderBy(F.desc("sim"), F.asc("entity_name")).limit(top_k)
    return _rank_bounded(top, top_k)


def ann_entities_approx(
    vdb: DataFrame | None,
    query_vec: list[float],
    top_k: int = 10,
    threshold: float = 0.2,
    mode: str = "lsh",
    n_bits: int = 8,
    n_centroids: int = 16,
    n_probe: int = 4,
    ann_index=None,
) -> DataFrame:
    """Scale-path ANN over the entity VDB: route the single query vector
    through similarity.lsh_topk (sign-bit multi-probe buckets) or
    similarity.ivf_topk (k-means inverted file) instead of scanning the full
    VDB. Same output shape as ann_entities; approximate recall (asserted vs
    exact in tests). Raise n_bits / n_centroids as the VDB grows — the plan
    shape is unchanged (bounded bucket equi-join). ``ann_index`` (mode
    "ivf": the result of similarity.build_ivf_index over this VDB) skips the
    per-call quantizer fit — a query service builds the index once; with an
    index, ``vdb`` may be None (the inverted file already holds every
    corpus vector, so no VDB scan or embed happens per query at all)."""
    from mmgraphrag_spark.operators import similarity as SIM

    if vdb is None:
        if mode != "ivf" or ann_index is None:
            raise ValueError("vdb=None requires mode='ivf' with a prebuilt ann_index")
        spark = ann_index[0].sparkSession
        corpus = None
    else:
        spark = vdb.sparkSession
        corpus = vdb_as_corpus(vdb)
    qdf = spark.createDataFrame(
        [("__query__", [float(x) for x in query_vec])],
        "vec_id string, embedding array<double>",
    )
    if mode == "lsh":
        hits = SIM.lsh_topk(corpus, qdf, k=top_k, n_bits=n_bits)
    elif mode == "ivf":
        hits = SIM.ivf_topk(
            corpus, qdf, k=top_k, n_centroids=n_centroids, n_probe=n_probe,
            index=ann_index,
        )
    else:
        raise ValueError(f"unknown ann mode: {mode!r}")
    scored = hits.select(
        F.col("neighbor_id").alias("entity_name"), F.col("cosine").alias("sim")
    ).filter(F.col("sim") >= threshold)
    # hits are already <= top_k per query; re-rank after the threshold cut so
    # rnk stays dense (1..n) like the exact path
    return _rank_bounded(scored, top_k)


def node_degrees(edges: DataFrame) -> DataFrame:
    """A6: degree per node (storage.py:453-460)."""
    nodes = edges.select(F.col("src").alias("entity_name")).unionAll(
        edges.select(F.col("tgt").alias("entity_name"))
    )
    return nodes.groupBy("entity_name").agg(F.count(F.lit(1)).alias("degree"))


def seed_entities(
    entities: DataFrame, edges: DataFrame, ann: DataFrame, degrees: DataFrame | None = None
) -> DataFrame:
    """J10: rehydrate ANN hits with node attrs + degree (query.py:239-253).
    Pass precomputed ``degrees`` when the caller needs them elsewhere too —
    node_degrees is a full edge scan + shuffle."""
    return (
        ann.join(entities, "entity_name")
        .join(degrees if degrees is not None else node_degrees(edges), "entity_name", "left")
        .fillna(0, subset=["degree"])
        .select("entity_name", "entity_type", "description", "source_ids", "sim", "rnk", "degree")
    )


def one_hop_neighbors(edges: DataFrame, seeds: DataFrame) -> DataFrame:
    """J11: union of both edge directions from the seed set (query.py:89-108)."""
    s = F.broadcast(seeds.select("entity_name"))
    fwd = edges.join(s, edges.src == s.entity_name).select(
        F.col("src").alias("seed"), F.col("tgt").alias("neighbor")
    )
    rev = edges.join(s, edges.tgt == s.entity_name).select(
        F.col("tgt").alias("seed"), F.col("src").alias("neighbor")
    )
    return fwd.unionByName(rev).distinct()


def related_text_units(
    seeds: DataFrame,
    entities: DataFrame,
    edges: DataFrame,
    chunks: DataFrame,
    budget_tokens: int = 4000,
    media: DataFrame | None = None,
) -> DataFrame:
    """J12 + W4 + A10 (query.py:63-155): seed source chunks scored by how many
    1-hop neighbors also cite them, ordered (seed rank asc, relation_counts
    desc), kept while the running token sum fits the budget.

    ``media`` (media_spans with the J2 chunk association) enables J13
    (query.py:44-61, 109-116 img_path2chunk_id): media refs in ONE-HOP
    provenance rewrite to the chunk the media span is associated with, so
    image evidence counts toward that chunk's relation score; refs with no
    association drop, and the per-neighbor provenance stays a SET after the
    rewrite (the reference rewrites inside set semantics — a neighbor citing
    both a chunk and an image associated with the same chunk counts once).
    Seed-side source ids keep the plain "chunk-" filter (P21), exactly where
    the reference applies it."""
    seed_chunks = seeds.select(
        "entity_name", F.col("rnk"), F.explode("source_ids").alias("chunk_id")
    ).filter(F.col("chunk_id").startswith("chunk-"))
    nbr_chunks = (
        one_hop_neighbors(edges, seeds)
        .join(
            entities.select(
                F.col("entity_name").alias("neighbor"), "source_ids"
            ),
            "neighbor",
        )
        .select("seed", "neighbor", F.explode("source_ids").alias("chunk_id"))
    )
    if media is not None:
        # ONE chunk per ref: the reference's path->chunk dict holds a single
        # association per image path; media_spans keeps one per OCCURRENCE,
        # so collapse deterministically (min) rather than fanning one ref's
        # evidence out to every associated chunk
        mmap = media.groupBy("media_ref").agg(
            F.min("chunk_id").alias("_mchunk")
        )
        nbr_chunks = (
            nbr_chunks.join(mmap, nbr_chunks.chunk_id == mmap.media_ref, "left")
            .withColumn(
                "chunk_id",
                F.when(
                    F.col("chunk_id").startswith("chunk-"), F.col("chunk_id")
                ).otherwise(F.col("_mchunk")),
            )
            .filter(F.col("chunk_id").isNotNull())
            .select("seed", "neighbor", "chunk_id")
            .distinct()
        )
    nbr_chunks = nbr_chunks.drop("neighbor")
    rel_counts = nbr_chunks.groupBy("chunk_id").agg(
        F.count(F.lit(1)).alias("relation_counts")
    )
    ranked = (
        seed_chunks.join(rel_counts, "chunk_id", "left")
        .fillna(0, subset=["relation_counts"])
        .groupBy("chunk_id")
        .agg(F.min("rnk").alias("order"), F.max("relation_counts").alias("relation_counts"))
        .join(chunks.select("chunk_id", "content", "tokens"), "chunk_id")
    )
    # single-partition window is intentional and safe: the input is bounded
    # by construction (top_k seeds x their cited chunks, not the corpus), and
    # the running token sum is inherently sequential (see one_partition_key).
    w = Window.partitionBy(one_partition_key("chunk_id")).orderBy(
        F.asc("order"), F.desc("relation_counts"), F.asc("chunk_id")
    )
    cum = (
        ranked.withColumn("_rn", F.row_number().over(w))
        .withColumn(
            "_cum",
            F.sum("tokens").over(
                w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
        .filter(F.col("_cum") <= budget_tokens)
    )
    return cum.select("chunk_id", "content", "order", "relation_counts")


def related_edges(
    seeds: DataFrame,
    edges: DataFrame,
    budget_tokens: int = 6000,
    degrees: DataFrame | None = None,
) -> DataFrame:
    """W5 + A10 (query.py:157-209): all seed edges ranked by (edge degree,
    weight) desc, token-truncated."""
    deg = degrees if degrees is not None else node_degrees(edges)
    # "edge touches any seed" as TWO broadcast hash left-joins + an OR filter
    # instead of a disjunctive left-semi: the (src==s)|(tgt==s) condition has
    # no equi-part, so Spark can only plan it as a BroadcastNestedLoopJoin —
    # O(|edges| * k) comparisons. Hash probes are O(|edges|). The seed
    # projection is deduped so the left-joins reproduce left-semi
    # multiplicity exactly.
    sd = seeds.select("entity_name").dropDuplicates(["entity_name"])
    ms = F.broadcast(sd.select(F.col("entity_name").alias("src"), F.lit(True).alias("_ms")))
    mt = F.broadcast(sd.select(F.col("entity_name").alias("tgt"), F.lit(True).alias("_mt")))
    seed_edges = (
        edges.join(ms, "src", "left")
        .join(mt, "tgt", "left")
        .filter(F.col("_ms").isNotNull() | F.col("_mt").isNotNull())
        .drop("_ms", "_mt")
        .join(deg.withColumnRenamed("entity_name", "src").withColumnRenamed("degree", "dsrc"), "src")
        .join(deg.withColumnRenamed("entity_name", "tgt").withColumnRenamed("degree", "dtgt"), "tgt")
        .withColumn("edge_rank", F.col("dsrc") + F.col("dtgt"))
    )
    # bounded input (seed edges only) + sequential budget sum: intentional
    # single partition (see one_partition_key)
    w = Window.partitionBy(one_partition_key("src")).orderBy(
        F.desc("edge_rank"), F.desc("weight"), F.asc("src"), F.asc("tgt")
    )
    toks = F.size(F.split(F.col("description"), r"\s+"))
    return (
        seed_edges.withColumn("_tok", toks)
        .withColumn(
            "_cum",
            F.sum("_tok").over(
                w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
        .filter(F.col("_cum") <= budget_tokens)
        .select("src", "tgt", "description", "weight", "edge_rank")
    )


# ---------------------------------------------------------------------------
# context assembly + answer
# ---------------------------------------------------------------------------

def _csv_section(df: DataFrame, cols: list[str], title: str) -> str:
    """P12: list-of-list -> ',\\t'-joined CSV text (base.py:259-265)."""
    rows = df.select(*cols).collect()
    lines = [",\t".join(cols)]
    for i, r in enumerate(rows):
        lines.append(",\t".join([str(i)] + [str(r[c]) for c in cols]))
    return f"-----{title}-----\n" + "\n".join(lines)


def assemble_context(seeds, text_units, edge_rows) -> str:
    """query.py:264-311: three sections — entities, relationships, sources."""
    return "\n".join(
        [
            _csv_section(seeds, ["entity_name", "entity_type", "description", "degree"], "Entities"),
            _csv_section(edge_rows, ["src", "tgt", "description", "weight", "edge_rank"], "Relationships"),
            _csv_section(text_units, ["content", "order", "relation_counts"], "Sources"),
        ]
    )


class TemplateAnswerer:
    """Deterministic offline stand-in for the RAG answer LLMs (L11-L13)."""

    def answer(self, question: str, context: str) -> str:
        top = context.splitlines()[2] if len(context.splitlines()) > 2 else ""
        return f"Q: {question}\nTop evidence: {top}"

    def answer_image(
        self, question: str, media_ref: str, context: str, image_b64: str | None = None
    ) -> str:
        """L12: per-image multimodal answer (stubbed: an MLLM backend sends
        the base64 image bytes as an image_url content part — see
        backends.llm.LLMAnswerer)."""
        tag = " +bytes" if image_b64 else ""
        return f"[image {media_ref}{tag}] relevant to: {question}"

    def merge(self, question: str, answers: list[str]) -> str:
        """L13: multi-answer merge."""
        return "\n".join(answers)


def multimodal_entities(seeds: DataFrame, limit: int = 3) -> DataFrame:
    """W7 (query.py:414-420): first ``number_of_mmentities`` ORI_IMG seeds."""
    return (
        seeds.filter(F.col("entity_type") == '"ORI_IMG"')
        .orderBy("rnk")
        .limit(limit)
    )


def log_query(spark: SparkSession, log_dir: str, question: str, context: str,
              answer: str) -> None:
    """S9 (query.py:395-397): append-mode query log — parquet table instead of
    the reference's context.csv."""
    spark.createDataFrame(
        [(question, context, answer)], ["question", "context", "answer"]
    ).withColumn("ts", F.current_timestamp()).write.mode("append").parquet(log_dir)


def _mm_image_payloads(
    seeds: DataFrame, media: DataFrame | None, limit: int = 3
) -> list[tuple[str, str | None]]:
    """W7 + the reference's base64 image hand-off (query.py:434-436): the
    ranked ORI_IMG seeds joined to the media table by their non-chunk
    source_ids -> [(entity_name, image_b64 | None)]. The join side is <=
    ``limit`` entities -> broadcast against the media scan."""
    import base64

    base = multimodal_entities(seeds, limit=limit).select(
        "entity_name", "rnk", "source_ids"
    ).localCheckpoint()  # <= limit rows; reused by both branches below
    if media is None:
        return [(r.entity_name, None) for r in base.orderBy("rnk").collect()]
    refs = base.select(
        "entity_name", F.explode("source_ids").alias("media_ref")
    ).filter(~F.col("media_ref").startswith("chunk-"))
    joined = (
        F.broadcast(refs)
        .join(media.select("media_ref", "content"), "media_ref")
        .groupBy("entity_name")
        .agg(F.min("content").alias("content"))
    )
    by_name = {
        r.entity_name: bytes(r.content) for r in joined.collect() if r.content is not None
    }
    return [
        (r.entity_name,
         base64.b64encode(by_name[r.entity_name]).decode()
         if r.entity_name in by_name else None)
        for r in base.orderBy("rnk").collect()
    ]


def local_query(
    spark: SparkSession,
    kg: dict,
    question: str,
    top_k: int = 10,
    threshold: float = 0.2,
    answerer=None,
    vdb: DataFrame | None = None,
    log_dir: str | None = None,
    embed_backend=None,
    ann_mode: str = "exact",
    ann_index=None,
    media: DataFrame | None = None,
) -> dict:
    """End-to-end local query over a run_pipeline() output dict.

    ``embed_backend`` (backends/embeddings.py) embeds BOTH the VDB and the
    question — they must share a space for the cosine ranking to mean
    anything. ``ann_mode`` picks the VDB ranking plan: "exact" (distributed
    top-k full scan — the correctness baseline), "lsh" or "ivf" (bucketed
    approximate scans for VDBs too large to scan per query; pass
    ``ann_index`` from similarity.build_ivf_index to reuse one fitted
    quantizer across calls — refitting per question defeats the purpose).
    ``media`` is an
    optional (media_ref, content binary) table; when given, ranked ORI_IMG
    seeds carry their base64 image bytes into the multimodal answer branch.
    Returns {"seeds", "text_units", "edges", "context", "answer"}."""
    from mmgraphrag_spark.backends.embeddings import HashEmbedBackend

    entities, edges, chunks = kg["entities"], kg["edges"], kg["chunks"]
    embed_backend = embed_backend or HashEmbedBackend()
    # a prebuilt IVF index already holds every corpus vector — building (and
    # eagerly materializing) the VDB per query would re-scan + re-embed the
    # entities table for nothing, defeating index-once-query-many
    if vdb is None and not (ann_mode == "ivf" and ann_index is not None):
        vdb = build_entity_vdb(entities, backend=embed_backend).localCheckpoint()
    qv = embed_backend.embed([question])[0]
    if ann_mode == "exact":
        ann = ann_entities(vdb, qv, top_k=top_k, threshold=threshold)
    else:
        ann = ann_entities_approx(
            vdb, qv, top_k=top_k, threshold=threshold, mode=ann_mode,
            ann_index=ann_index,
        )
    ann = ann.localCheckpoint()
    # degrees are a full edge scan + shuffle consumed by BOTH the seed
    # rehydration and the edge ranking — compute once per query
    degrees = node_degrees(edges).localCheckpoint()
    seeds = seed_entities(entities, edges, ann, degrees=degrees).localCheckpoint()
    # J13: the media_spans table (J2 chunk association) rewrites image refs
    # in one-hop provenance to their associated chunks
    text_units = related_text_units(
        seeds, entities, edges, chunks, media=kg.get("media_spans")
    )
    edge_rows = related_edges(seeds, edges, degrees=degrees)
    context = assemble_context(seeds.orderBy("rnk"), text_units, edge_rows)
    backend = answerer or TemplateAnswerer()
    answer = backend.answer(question, context)
    # multimodal branch (query.py:402-468): if ORI_IMG entities ranked, answer
    # per image (<=3, W7) with the image bytes attached when a media table is
    # available (query.py:434-436 sends base64 content) and merge (L12/L13)
    payloads = _mm_image_payloads(seeds, media)
    mm = [name for name, _ in payloads]
    if mm:
        # third-party answerers written to the pre-round-3 3-arg protocol
        # (no image_b64) keep working — only pass bytes the backend can take
        import inspect

        params = inspect.signature(backend.answer_image).parameters
        takes_b64 = "image_b64" in params or any(
            p.kind == inspect.Parameter.VAR_KEYWORD for p in params.values()
        )
        img_answers = [
            backend.answer_image(question, name, context, image_b64=b64)
            if takes_b64
            else backend.answer_image(question, name, context)
            for name, b64 in payloads
        ]
        answer = backend.merge(question, [answer] + img_answers)
    if log_dir:
        log_query(spark, log_dir, question, context, answer)
    return {
        "seeds": seeds,
        "text_units": text_units,
        "edges": edge_rows,
        "context": context,
        "answer": answer,
        "mm_entities": mm,
    }
