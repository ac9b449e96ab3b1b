"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship KG-construction pipeline end-to-end on
sf0.001. ``queries()`` exposes one entry per implemented operator family from
SURVEY.md §2 plus the training-data-pipeline operators (dedup / similarity /
text analysis); ``oracle_sql()`` gives the DuckDB-equivalent SQL.

The KG queries run the REAL pipeline (extraction UDF -> A1/A2 merge -> scene
graphs -> spectral fusion -> contraction) over an interleaved corpus derived
deterministically from the flat ``documents`` table
(mmgraphrag_spark/sources/documents.py): every derived value is a closed-form
function of doc_id, so even the post-fusion triple set has an exact ANSI-SQL
oracle. Fusion behavior that is NOT closed-form (rich corpora) is covered by
pytest against the pure-Python oracle in mmgraphrag_spark/datagen.py.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mmgraphrag_spark.operators.textstats import (
    PII_EMAIL as _PII_EMAIL,
    PII_IP as _PII_IP,
    PII_PHONE as _PII_PHONE,
)
from mmgraphrag_spark.query import one_partition_key as _one_part

# ---------------------------------------------------------------------------
# inputs
# ---------------------------------------------------------------------------

def _flat(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet").withColumn(
        "embedding", F.col("embedding").cast("array<double>")
    )


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/events.parquet")


def _interleaved(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mmgraphrag_spark.sources.documents import read_interleaved

    return read_interleaved(spark, sf_dir)


_KG_MEMO: dict = {}


def _kg(spark: SparkSession, sf_dir: str) -> dict:
    """One pipeline run shared by every kg_* query: the outputs are stage
    snapshots (localCheckpoint — valid for the session's lifetime), so the
    driver's four kg_* probes read the same materialized run instead of
    re-executing the whole pipeline each time."""
    from mmgraphrag_spark.pipeline import run_pipeline

    # applicationId, not id(spark): a stopped session's address can be reused
    # by a new SparkSession, which would serve DataFrames of a dead context
    key = (spark.sparkContext.applicationId, sf_dir)
    if key not in _KG_MEMO:
        _KG_MEMO[key] = run_pipeline(spark, _interleaved(spark, sf_dir))
    return _KG_MEMO[key]


# ---------------------------------------------------------------------------
# entry: flagship end-to-end KG construction
# ---------------------------------------------------------------------------

def entry(spark: SparkSession) -> DataFrame:
    """documents -> spans -> chunks/media -> extract -> merge -> scene ->
    fusion -> canonical (subj, pred, obj, weight) triples, at sf0.001."""
    return _kg(spark, "/root/testdata/sf0.001")["triples"].orderBy("subj", "obj")


# ---------------------------------------------------------------------------
# queries
# ---------------------------------------------------------------------------

def _q_spans_sequence(spark, sf_dir):
    """Input_hint per-row invariant: span sequence (kind, text, media_ref, offset)."""
    from mmgraphrag_spark.operators.spans import explode_spans

    return explode_spans(_interleaved(spark, sf_dir)).select(
        "doc_id", "span_pos", "kind", "text", "media_ref", "offset"
    )


def _q_kg_triples(spark, sf_dir):
    return _kg(spark, sf_dir)["triples"].select("subj", "pred", "obj", "weight")


def _q_kg_entities(spark, sf_dir):
    ents = _kg(spark, sf_dir)["entities"]
    return ents.select(
        "entity_name",
        "entity_type",
        F.size("source_ids").cast("bigint").alias("n_sources"),
    )


def _q_kg_aliases(spark, sf_dir):
    return _kg(spark, sf_dir)["aliases"].select("alias", "canonical")


def _q_c1_chunking(spark, sf_dir):
    from mmgraphrag_spark.operators.spans import chunk_text_spans

    flat = _flat(spark, sf_dir)
    spans = flat.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        F.lit("text").alias("kind"),
        F.col("text"),
        F.lit("").alias("media_ref"),
        F.lit(0).alias("offset"),
    )
    return chunk_text_spans(spans, max_tokens=32, overlap=8).select(
        "chunk_id", "content", F.col("tokens").cast("bigint").alias("tokens")
    ).distinct()


def _q_c1_chunking_bpe(spark, sf_dir):
    """C1 over BPE-ish tokens (P9): JVM regex-token sliding window. The
    tokenizer-backend python path (chunk_text_spans_tokenized with
    RegexTokenizerBackend) produces identical chunks — asserted in pytest —
    so this exact SQL oracle also vouches for the pandas-UDF plumbing."""
    from mmgraphrag_spark.operators.spans import chunk_text_spans_bpe

    flat = _flat(spark, sf_dir)
    spans = flat.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        F.lit("text").alias("kind"),
        F.col("text"),
        F.lit("").alias("media_ref"),
        F.lit(0).alias("offset"),
    )
    return chunk_text_spans_bpe(spans, max_tokens=32, overlap=8).select(
        "chunk_id", "content", F.col("tokens").cast("bigint").alias("tokens")
    ).distinct()


def _q_exact_dedup(spark, sf_dir):
    from mmgraphrag_spark.operators.dedup import exact_dedup_groups

    return exact_dedup_groups(_flat(spark, sf_dir), "doc_id", "text").select(
        "content_hash", F.col("keep_id").cast("bigint").alias("keep_id"),
        F.col("n_dupes").cast("bigint").alias("n_dupes")
    )


def _q_minhash_bands(spark, sf_dir):
    from mmgraphrag_spark.operators.dedup import minhash_signatures

    return minhash_signatures(
        _flat(spark, sf_dir), "doc_id", "text", bands=4, rows_per_band=2
    ).select(F.col("id").cast("bigint").alias("id"), F.col("band").cast("bigint").alias("band"), "sig")


def _q_lsh_pairs(spark, sf_dir):
    from mmgraphrag_spark.operators.dedup import lsh_candidate_pairs, minhash_signatures

    sigs = minhash_signatures(_flat(spark, sf_dir), "doc_id", "text", bands=4, rows_per_band=2)
    return lsh_candidate_pairs(sigs).select(
        F.col("a").cast("bigint").alias("a"), F.col("b").cast("bigint").alias("b")
    )


def _q_near_dup_groups(spark, sf_dir):
    """The full dedup decision pipeline: MinHash -> LSH candidates -> exact
    Jaccard verify (>= 0.8) -> connected components -> one representative per
    duplicate group. Exact oracle: recursive CTE over the same verified pair
    set."""
    from mmgraphrag_spark.operators.dedup import (
        jaccard_verify,
        lsh_candidate_pairs,
        minhash_signatures,
        near_dup_groups,
    )

    flat = _flat(spark, sf_dir)
    sigs = minhash_signatures(flat, "doc_id", "text", bands=4, rows_per_band=2)
    pairs = lsh_candidate_pairs(sigs)
    verified = jaccard_verify(
        pairs, flat, "doc_id", "text", shingle_len=3, threshold=0.8
    ).select("a", "b")
    out = near_dup_groups(verified, flat, id_col="doc_id")
    return out.select(
        F.col("id").cast("bigint").alias("id"),
        F.col("keep_id").cast("bigint").alias("keep_id"),
        "is_duplicate",
    )


def _q_link_stats(spark, sf_dir):
    """Link/contact density features. URLs/emails are planted deterministically
    (the synthetic corpus has none), so the oracle asserts real counts."""
    from mmgraphrag_spark.operators.textstats import link_stats

    flat = _flat(spark, sf_dir).select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.when(
                F.col("doc_id") % 5 == 0,
                F.concat(
                    F.lit(" see https://example.com/page/"),
                    F.col("doc_id"),
                    F.lit(" or mail team"),
                    F.col("doc_id") % 7,
                    F.lit("@corp.example.org now"),
                ),
            ).otherwise(F.lit("")),
        ).alias("text"),
    )
    return link_stats(flat, "doc_id", "text").select(
        F.col("id").cast("bigint").alias("id"),
        F.col("n_urls").cast("bigint").alias("n_urls"),
        F.col("n_emails").cast("bigint").alias("n_emails"),
        "url_char_ratio",
    )


def _q_simhash(spark, sf_dir):
    from mmgraphrag_spark.operators.dedup import simhash

    return simhash(_flat(spark, sf_dir), "doc_id", "text", bits=32).select(
        F.col("id").cast("bigint").alias("id"), "simhash"
    )


def _q_jaccard_pairs(spark, sf_dir):
    from mmgraphrag_spark.operators.dedup import jaccard_verify

    flat = _flat(spark, sf_dir)
    ids = flat.select("doc_id")
    pairs = (
        flat.filter(F.col("doc_id") % 5 == 0)
        .select(F.col("doc_id").alias("a"), (F.col("doc_id") + 1).alias("b"))
        .join(ids.withColumnRenamed("doc_id", "b"), "b")
    )
    out = jaccard_verify(pairs, flat, "doc_id", "text", shingle_len=3, threshold=0.0)
    return out.select(
        F.col("a").cast("bigint").alias("a"),
        F.col("b").cast("bigint").alias("b"),
        F.round("jaccard", 6).alias("jaccard"),
    )


def _q_lang_id(spark, sf_dir):
    from mmgraphrag_spark.operators.textstats import language_id

    return language_id(_flat(spark, sf_dir), "doc_id", "text").select(
        F.col("id").cast("bigint").alias("id"), "lang", F.col("score").cast("bigint").alias("score")
    )


def _q_quality(spark, sf_dir):
    from mmgraphrag_spark.operators.textstats import quality_features

    q = quality_features(_flat(spark, sf_dir), "doc_id", "text")
    return q.select(
        F.col("id").cast("bigint").alias("id"),
        F.col("n_chars").cast("bigint").alias("n_chars"),
        F.col("n_tokens").cast("bigint").alias("n_tokens"),
        "mean_token_len", "punct_ratio", "stopword_ratio", "quality",
    )


def _q_token_counts(spark, sf_dir):
    from mmgraphrag_spark.operators.textstats import token_counts

    return token_counts(_flat(spark, sf_dir), "doc_id", "text").select(
        F.col("id").cast("bigint").alias("id"),
        F.col("ws_tokens").cast("bigint").alias("ws_tokens"),
        F.col("bpe_tokens").cast("bigint").alias("bpe_tokens"),
    )


def _q_fingerprint(spark, sf_dir):
    from mmgraphrag_spark.operators.textstats import fingerprint

    return fingerprint(_flat(spark, sf_dir), "doc_id", "text", shingle_len=5).select(
        F.col("id").cast("bigint").alias("id"), "fingerprint"
    )


def _q_ann_topk(spark, sf_dir):
    from mmgraphrag_spark.operators.similarity import brute_force_topk

    emb = _emb(spark, sf_dir)
    q = emb.filter(F.col("vec_id") < 5)
    out = brute_force_topk(emb, q, k=10)
    return out.select(
        F.col("query_id").cast("bigint").alias("query_id"),
        F.col("neighbor_id").cast("bigint").alias("neighbor_id"),
        F.col("rank").cast("bigint").alias("rnk"),
    )


def _q_embedding_near_dups(spark, sf_dir):
    from mmgraphrag_spark.operators.dedup import embedding_near_dups

    emb = _emb(spark, sf_dir).filter(F.col("vec_id") < 300)
    out = embedding_near_dups(emb, threshold=0.9)
    return out.select(
        F.col("a").cast("bigint").alias("a"),
        F.col("b").cast("bigint").alias("b"),
        F.round("cosine", 4).alias("cosine"),
    )


def _q_embedding_near_dups_lsh(spark, sf_dir):
    """Scale-path embedding near-dup: sign-bit bucket join (Hamming<=1
    multi-probe) + exact cosine verify. Exact SQL oracle — the candidate
    criterion (bucket Hamming distance <= 1) is SQL-expressible."""
    from mmgraphrag_spark.operators.dedup import embedding_near_dups_lsh

    # threshold 0.35: the synthetic embeddings top out at cosine ~0.51, so a
    # production-style 0.9 threshold would only ever assert on an empty set
    out = embedding_near_dups_lsh(_emb(spark, sf_dir), threshold=0.35, n_bits=8)
    return out.select(
        F.col("a").cast("bigint").alias("a"),
        F.col("b").cast("bigint").alias("b"),
        F.round("cosine", 4).alias("cosine"),
    )


def _q_simhash_pairs(spark, sf_dir):
    """SimHash near-dup pairs. The pigeonhole chunk-bucket candidate pass is
    complete for Hamming <= max_hamming, so the result EQUALS the all-pairs
    Hamming filter — which is the (exact) SQL oracle."""
    from mmgraphrag_spark.operators.dedup import simhash, simhash_near_dups

    # doc_id < 300: the synthetic corpus is near-dup-heavy (>15% of ALL pairs
    # land within Hamming 3), so an unbounded pair set grows quadratically
    # with sf — the bounded slice keeps the oracle comparison exact and the
    # bench runtime sf-independent
    sims = simhash(
        _flat(spark, sf_dir).filter(F.col("doc_id") < 300), "doc_id", "text", bits=32
    )
    return simhash_near_dups(sims, max_hamming=3, bits=32).select(
        F.col("a").cast("bigint").alias("a"),
        F.col("b").cast("bigint").alias("b"),
        F.col("hamming").cast("bigint").alias("hamming"),
    )


def _q_signbit_buckets(spark, sf_dir):
    from mmgraphrag_spark.operators.similarity import signbit_bucket

    return _emb(spark, sf_dir).select(
        F.col("vec_id").cast("bigint").alias("vec_id"),
        signbit_bucket(F.col("embedding"), 8).alias("bucket"),
    )


def _q_centroid_dims(spark, sf_dir):
    emb = _emb(spark, sf_dir)
    return (
        emb.select(
            F.col("label").cast("bigint").alias("label"),
            F.posexplode("embedding").alias("pos", "v"),
        )
        .groupBy("label", "pos")
        # + 0.0 normalizes IEEE -0.0 to +0.0 (the SQL oracle does the same)
        .agg((F.round(F.avg("v"), 4) + F.lit(0.0)).alias("mean"))
        .select("label", F.col("pos").cast("bigint").alias("pos"), "mean")
    )


def _q_a1_entity_merge(spark, sf_dir):
    """A1 merge semantics over mention rows derived from events."""
    from mmgraphrag_spark.operators.merge import merge_entities

    ev = _events(spark, sf_dir)
    mentions = ev.select(
        F.concat(F.lit("ENTITY_"), F.col("user_id")).alias("entity_name"),
        F.upper("event_type").alias("entity_type"),
        F.concat(F.lit("user "), F.col("user_id"), F.lit(" does "), F.col("event_type")).alias("description"),
        F.concat(F.lit("chunk-"), F.col("event_id") % 50).alias("source_id"),
    )
    out = merge_entities(mentions)
    return out.select(
        "entity_name", "entity_type", "description",
        F.concat_ws("<SEP>", F.array_sort("source_ids")).alias("source_ids"),
    )


def _q_a2_edge_merge(spark, sf_dir):
    """A2 merge semantics over relation rows derived from events."""
    from mmgraphrag_spark.operators.merge import merge_edges

    ev = _events(spark, sf_dir)
    rels = ev.select(
        F.concat(F.lit("E"), F.col("user_id")).alias("src"),
        F.concat(F.lit("E"), (F.col("user_id") * 3 + 1) % 25).alias("tgt"),
        F.concat(F.lit("rel "), F.col("event_type")).alias("description"),
        (F.col("event_id") % 7 + 1).cast("double").alias("weight"),
        F.concat(F.lit("chunk-"), F.col("event_id") % 50).alias("source_id"),
    ).filter(F.col("src") != F.col("tgt"))
    out = merge_edges(rels)
    return out.select(
        "src", "tgt", "weight", "description",
        F.concat_ws("<SEP>", F.array_sort("source_ids")).alias("source_ids"),
        F.col("order").cast("bigint").alias("ord"),
    )


def _q_a6_degree(spark, sf_dir):
    ev = _events(spark, sf_dir)
    edges = ev.select(
        F.concat(F.lit("u"), F.col("user_id")).alias("src"),
        F.concat(F.lit("u"), (F.col("user_id") * 3 + 1) % 25).alias("tgt"),
    ).filter(F.col("src") != F.col("tgt")).distinct()
    nodes = edges.select(F.col("src").alias("node")).unionAll(
        edges.select(F.col("tgt").alias("node"))
    )
    return nodes.groupBy("node").agg(F.count(F.lit(1)).cast("bigint").alias("degree"))


def _q_cc_components(spark, sf_dir):
    from mmgraphrag_spark.operators.fusion import connected_components

    ev = _events(spark, sf_dir)
    pairs = ev.select(
        F.concat(F.lit("u"), F.col("user_id")).alias("alias"),
        F.concat(F.lit("u"), F.col("user_id") % 7).alias("canonical"),
    ).distinct().filter(F.col("alias") != F.col("canonical"))
    return connected_components(pairs).select("entity_name", "component")


def _q_j1_anti_join(spark, sf_dir):
    from mmgraphrag_spark.operators.spans import filter_new_keys

    ev = _events(spark, sf_dir)
    existing = ev.filter(F.col("user_id") % 3 == 0).select("user_id").distinct()
    return filter_new_keys(ev, existing, "user_id").select(
        F.col("event_id").cast("bigint").alias("event_id")
    )


def _q_a10_token_budget(spark, sf_dir):
    from pyspark.sql import Window

    ev = _events(spark, sf_dir)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        ev.withColumn("cum", F.sum("value").over(w))
        .filter(F.col("cum") <= 500.0)
        .select(
            F.col("user_id").cast("bigint").alias("user_id"),
            F.col("event_id").cast("bigint").alias("event_id"),
        )
    )


def _q_w4_ranking(spark, sf_dir):
    from pyspark.sql import Window

    ev = _events(spark, sf_dir)
    w = Window.partitionBy("event_type").orderBy(F.desc("value"), F.asc("event_id"))
    return (
        ev.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 5)
        .select(
            F.col("event_id").cast("bigint").alias("event_id"),
            "event_type", "value",
            F.col("rnk").cast("bigint").alias("rnk"),
        )
    )


def _q_j11_one_hop(spark, sf_dir):
    """J11: union of both edge directions from a seed set (query.py:89-108),
    over the events-derived edge graph."""
    from mmgraphrag_spark.query import one_hop_neighbors

    ev = _events(spark, sf_dir)
    edges = (
        ev.select(
            F.concat(F.lit("u"), F.col("user_id")).alias("src"),
            F.concat(F.lit("u"), (F.col("user_id") * 3 + 1) % 25).alias("tgt"),
        )
        .filter(F.col("src") != F.col("tgt"))
        .distinct()
    )
    seeds = (
        ev.filter(F.col("user_id") % 7 == 0)
        .select(F.concat(F.lit("u"), F.col("user_id")).alias("entity_name"))
        .distinct()
    )
    return one_hop_neighbors(edges, seeds).select("seed", "neighbor")


def _q_j10_rehydrate(spark, sf_dir):
    """J10: rehydrate a ranked hit list with node attrs + degree
    (query.py:239-253) — ann rows synthesized deterministically from events
    so the join/degree/fillna path has an exact oracle."""
    from mmgraphrag_spark.query import seed_entities

    ev = _events(spark, sf_dir)
    edges = (
        ev.select(
            F.concat(F.lit("u"), F.col("user_id")).alias("src"),
            F.concat(F.lit("u"), (F.col("user_id") * 3 + 1) % 25).alias("tgt"),
        )
        .filter(F.col("src") != F.col("tgt"))
        .distinct()
        .withColumn("weight", F.lit(1.0))
    )
    entities = ev.groupBy(
        F.concat(F.lit("u"), F.col("user_id")).alias("entity_name")
    ).agg(
        F.lit("USER").alias("entity_type"),
        F.concat(F.lit("user with "), F.count(F.lit(1)), F.lit(" events")).alias(
            "description"
        ),
        F.array_sort(
            F.collect_set(F.concat(F.lit("chunk-"), F.col("event_id") % 50))
        ).alias("source_ids"),
    )
    from pyspark.sql import Window

    ann = (
        ev.filter(F.col("user_id") % 9 == 0)
        .select(F.col("user_id").alias("uid"))
        .distinct()
        .select(
            F.concat(F.lit("u"), F.col("uid")).alias("entity_name"),
            (F.col("uid") % 100 / 100.0).alias("sim"),
        )
        .withColumn(
            # bounded synthetic seed list -> intentional single partition
            # (query.one_partition_key: non-foldable, null-safe constant)
            "rnk",
            F.row_number().over(
                Window.partitionBy(_one_part("entity_name")).orderBy(
                    F.desc("sim"), F.asc("entity_name")
                )
            ),
        )
    )
    out = seed_entities(entities, edges, ann)
    return out.select(
        "entity_name", "entity_type", "description",
        F.concat_ws("<SEP>", "source_ids").alias("source_ids"),
        F.round("sim", 6).alias("sim"),
        F.col("rnk").cast("bigint").alias("rnk"),
        F.col("degree").cast("bigint").alias("degree"),
    )


def _q_w5_edge_ranking(spark, sf_dir):
    """W5 + A10: seed edges ranked by (endpoint-degree sum, weight) desc,
    kept while the running description-token sum fits the budget — the
    query-path related_edges operator over an events-derived edge set."""
    from mmgraphrag_spark.query import related_edges

    ev = _events(spark, sf_dir)
    edges = (
        ev.select(
            F.concat(F.lit("u"), F.col("user_id")).alias("src"),
            F.concat(F.lit("u"), (F.col("user_id") * 3 + 1) % 25).alias("tgt"),
            (F.col("event_id") % 7 + 1).cast("double").alias("weight"),
            F.concat(F.lit("rel "), F.col("event_type")).alias("description"),
        )
        .filter(F.col("src") != F.col("tgt"))
        .groupBy("src", "tgt")
        .agg(F.sum("weight").alias("weight"), F.min("description").alias("description"))
    )
    seeds = (
        ev.filter(F.col("user_id") % 5 == 0)
        .select(F.concat(F.lit("u"), F.col("user_id")).alias("entity_name"))
        .distinct()
    )
    out = related_edges(seeds, edges, budget_tokens=30)
    return out.select(
        "src", "tgt", "description", "weight",
        F.col("edge_rank").cast("bigint").alias("edge_rank"),
    )


def _q_w2_neighbor_window(spark, sf_dir):
    from pyspark.sql import Window

    ev = _events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # ts is TIMESTAMP_NTZ; session tz is UTC, so NTZ->TS->double epoch seconds
    # (with micro fraction) matches DuckDB's epoch(ts)
    sec = F.col("ts").cast("timestamp").cast("double")
    gap = sec - F.lag(sec).over(w)
    return (
        ev.withColumn("gap", gap)
        .filter(F.col("gap") <= 60.0)
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_quick"))
        .select(F.col("user_id").cast("bigint").alias("user_id"), "n_quick")
    )


def _q_u6_lcc(spark, sf_dir):
    """U6: largest connected component of the events-derived edge graph."""
    from mmgraphrag_spark.operators.fusion import largest_connected_component

    ev = _events(spark, sf_dir)
    edges = ev.select(
        F.concat(F.lit("u"), F.col("user_id")).alias("src"),
        F.concat(F.lit("u"), (F.col("user_id") * 3 + 1) % 25).alias("tgt"),
    ).filter(F.col("src") != F.col("tgt")).distinct()
    return largest_connected_component(edges)


def _q_a3_summarize(spark, sf_dir):
    """A3: token-threshold description summarization (deterministic backend)."""
    from mmgraphrag_spark.operators.merge import summarize_long_descriptions

    flat = _flat(spark, sf_dir).select(
        F.col("doc_id").alias("entity_name"),
        F.lit("T").alias("entity_type"),
        F.col("text").alias("description"),
        F.array().cast("array<string>").alias("source_ids"),
    )
    out = summarize_long_descriptions(flat, max_tokens=60, keep_tokens=20)
    return out.select(
        F.col("entity_name").cast("bigint").alias("id"),
        F.col("description").alias("summary"),
    )


def _q_kg_media_assoc(spark, sf_dir):
    """J2: media span -> best chunk by word-overlap argmax (exact: the
    grammar chunk always wins for the derived corpus)."""
    return _kg(spark, sf_dir)["media_spans"].select("media_ref", "chunk_id")


def _q_j13_media_rewrite(spark, sf_dir):
    """J13 (reference query.py:44-61 img_path2chunk_id): media refs in entity
    provenance rewrite to the chunk the media span is associated with (J2);
    refs with no association drop. Exercised here over the canonical
    entities' non-chunk source ids — post-fusion '"ENTITY_k"' carries the
    media refs its image twin contributed."""
    kg = _kg(spark, sf_dir)
    prov = (
        kg["entities"]
        .select("entity_name", F.explode("source_ids").alias("sid"))
        .filter(~F.col("sid").startswith("chunk-"))
    )
    media = (
        kg["media_spans"]
        .select("media_ref", F.col("chunk_id").alias("mchunk"))
        .distinct()
    )
    return (
        prov.join(media, prov.sid == media.media_ref)
        .select("entity_name", F.col("mchunk").alias("chunk_id"))
        .distinct()
    )


def _q_media_features(spark, sf_dir):
    """Multimodal binary-column decode plumbing — EXACT oracle: the
    deterministic decode backend derives every output from md5(content) raw
    bytes, and DuckDB parses the same bytes from the md5 hex ('0x'||pair
    casts). ``feat_bytes`` recovers the integer byte sum from the float32
    feature vector (round(x*255) is exact at this magnitude), sidestepping
    float32-vs-double drift a rounded float sum would have."""
    from mmgraphrag_spark.operators.media import media_features, synth_media_table

    media = synth_media_table(spark, _interleaved(spark, sf_dir))
    feats = media_features(media)
    return feats.select(
        "media_ref", "mime",
        F.col("width").cast("bigint").alias("width"),
        F.col("height").cast("bigint").alias("height"),
        F.col("n_frames").cast("bigint").alias("n_frames"),
        F.aggregate(
            "feature",
            F.lit(0).cast("bigint"),
            lambda a, x: a + F.round(x * 255).cast("bigint"),
        ).alias("feat_bytes"),
    )


def _q_lsh_ann_topk(spark, sf_dir):
    """Sign-bit LSH approximate top-k — EXACT oracle: the candidate set is
    closed-form (buckets within Hamming distance 1 of the query's bucket,
    i.e. the multi-probe flip set) and the within-probe ranking is plain
    cosine, so DuckDB reproduces the whole operator. Recall vs brute force
    is additionally asserted in pytest."""
    from mmgraphrag_spark.operators.similarity import lsh_topk

    emb = _emb(spark, sf_dir)
    q = emb.filter(F.col("vec_id") < 5)
    return lsh_topk(emb, q, k=10, n_bits=8).select(
        F.col("query_id").cast("bigint").alias("query_id"),
        F.col("neighbor_id").cast("bigint").alias("neighbor_id"),
        F.col("rank").cast("bigint").alias("rnk"),
    )


def _q_ivf_topk(spark, sf_dir):
    """IVF approximate top-k (k-means coarse quantizer + probed-cell search)
    — EXACT oracle: the fit is deterministic (lowest-id init, ties to the
    smallest label, per-dim means rounded each round), so the fixed 3
    Lloyd iterations unroll into closed-form SQL. Recall vs brute force is
    additionally asserted in pytest."""
    from mmgraphrag_spark.operators.similarity import ivf_topk

    emb = _emb(spark, sf_dir)
    q = emb.filter(F.col("vec_id") < 5)
    return ivf_topk(emb, q, k=10, n_centroids=8, n_probe=3, max_iter=3).select(
        F.col("query_id").cast("bigint").alias("query_id"),
        F.col("neighbor_id").cast("bigint").alias("neighbor_id"),
        F.col("rank").cast("bigint").alias("rnk"),
    )


def _q_w7_mm_limit(spark, sf_dir):
    """W7 (reference query.py:414-420): keep the first number_of_mmentities
    (=3) ORI_IMG seeds by rank — the multimodal-answer gate, over a seed set
    synthesized deterministically from events."""
    from pyspark.sql import Window

    from mmgraphrag_spark.query import multimodal_entities

    ev = _events(spark, sf_dir)
    seeds = (
        ev.select(F.col("user_id").alias("uid"))
        .distinct()
        .select(
            F.concat(F.lit("u"), F.col("uid")).alias("entity_name"),
            F.when(F.col("uid") % 3 == 0, F.lit('"ORI_IMG"'))
            .otherwise(F.lit('"PERSON"'))
            .alias("entity_type"),
        )
        .withColumn(
            # global seed ranking over a bounded distinct-user list ->
            # intentional single partition (query.one_partition_key)
            "rnk",
            F.row_number().over(
                Window.partitionBy(_one_part("entity_name")).orderBy(
                    F.asc("entity_name")
                )
            ),
        )
    )
    return multimodal_entities(seeds, limit=3).select(
        "entity_name", F.col("rnk").cast("bigint").alias("rnk")
    )


def _q_p8_cache_hits(spark, sf_dir):
    """P8 + J17: md5-of-serialized-args cache key (base.py:100-101) and the
    hit/miss routing join — a cache holding every third document's hash is
    probed by the full corpus."""
    from mmgraphrag_spark.functions import args_hash

    flat = _flat(spark, sf_dir)
    keyed = flat.select(
        F.col("doc_id").cast("bigint").alias("id"),
        args_hash(F.col("text")).alias("args_hash"),
    )
    cache = (
        flat.filter(F.col("doc_id") % 3 == 0)
        .select(args_hash(F.col("text")).alias("args_hash"))
        .distinct()
        .withColumn("hit", F.lit(True))
    )
    return (
        keyed.join(F.broadcast(cache), "args_hash", "left")
        .select("id", "args_hash", F.coalesce("hit", F.lit(False)).alias("hit"))
    )


def _q_decontaminate(spark, sf_dir):
    """Benchmark decontamination: every 97th doc plays the eval set; training
    docs sharing >=3 distinct word 5-grams with it are flagged. The grammar
    skeleton ('is a ... associated with topic_...') produces genuine partial
    overlaps beyond the exact self-matches."""
    from mmgraphrag_spark.operators.dedup import decontaminate

    flat = _flat(spark, sf_dir).select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.when(
                F.col("doc_id") % 9 == 0,
                F.lit(
                    " the famous benchmark question asks what the quick fox"
                    " does at dawn"
                ),
            ).otherwise(F.lit("")),
        ).alias("text"),
    )
    # materialize the tiny bench side before the broadcast join: the
    # broadcast build otherwise re-executes the full corpus scan + concat
    # just to keep 1/97 of the rows (CLAUDE.md rule 8)
    bench = (
        flat.filter(F.col("doc_id") % 97 == 0)
        .select(F.col("doc_id").alias("bid"), "text")
        .localCheckpoint()
    )
    out = decontaminate(
        flat, "doc_id", "text", bench, "bid", "text", shingle_len=5, min_overlap=3
    )
    return out.select(
        F.col("id").cast("bigint").alias("id"),
        F.col("bench_id").cast("bigint").alias("bench_id"),
        F.col("n_shared").cast("bigint").alias("n_shared"),
    )


# 12-word phrase planted TWICE on every fifth doc: a phrase of length L
# repeated consecutively duplicates every n-gram with n <= L, so all of
# Gopher's dup_{5..10}gram fractions go nonzero on those docs
_REP_PHRASE = (
    "orchard river castle lantern marble falcon timber harbor meadow"
    " copper anchor willow"
)


# 14-word canary planted on every ninth doc; two of its internal 13-grams
# collide with the benchmark side (the %97 docs — doc 0 carries the canary)
_SPAN_CANARY = (
    "every benchmark suite hides one canary sentence that must never appear"
    " in training corpora"
)


def _q_decontaminate_spans(spark, sf_dir):
    """GPT-3 appendix C production decontamination: 13-gram collisions cut a
    padded TOKEN window around each hit, merged into maximal spans per doc —
    the cut list a splitter consumes instead of dropping whole documents.
    The 14-word canary on every ninth doc shares its internal 13-grams with
    benchmark doc 0, so real multi-hit merged spans exist at every sf."""
    from mmgraphrag_spark.operators.dedup import decontaminate_spans

    flat = _flat(spark, sf_dir).select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.when(F.col("doc_id") % 9 == 0, F.lit(f" {_SPAN_CANARY}"))
            .otherwise(F.lit("")),
        ).alias("text"),
    )
    # materialize the tiny bench side before the broadcast join (CLAUDE.md
    # rule 8: the broadcast build would re-run the corpus scan otherwise)
    bench = flat.filter(F.col("doc_id") % 97 == 0).select("text").localCheckpoint()
    out = decontaminate_spans(
        flat, "doc_id", "text", bench, "text", shingle_len=13, pad_tokens=5
    )
    return out.select(
        F.col("id").cast("bigint").alias("id"),
        F.col("span_start").cast("bigint").alias("span_start"),
        F.col("span_end").cast("bigint").alias("span_end"),
    )


def _q_repetition(spark, sf_dir):
    """Full Gopher repetition suite (Rae et al. Table A1): dup-line fractions,
    top-2/3/4-gram char fractions, dup-5..10-gram char fractions. Duplicate
    lines are planted on every third doc and a twice-repeated 12-word phrase
    on every fifth (the synthetic corpus is single-line and non-repetitive),
    so the oracle asserts real nonzero values for every output column."""
    from mmgraphrag_spark.operators.textstats import repetition_features

    flat = _flat(spark, sf_dir).select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.when(
                F.col("doc_id") % 3 == 0,
                F.concat(
                    F.lit("\nrepeated line alpha\nrepeated line alpha\nunique tail "),
                    F.col("doc_id") % 11,
                ),
            ).otherwise(F.lit("")),
            F.when(
                F.col("doc_id") % 5 == 0,
                F.lit(f" {_REP_PHRASE} {_REP_PHRASE}"),
            ).otherwise(F.lit("")),
        ).alias("text"),
    )
    out = repetition_features(flat, "doc_id", "text")
    return out.select(
        F.col("id").cast("bigint").alias("id"),
        F.col("n_lines").cast("bigint").alias("n_lines"),
        "dup_line_frac",
        "dup_line_char_frac",
        "top_bigram_char_frac",
        "top_3gram_char_frac",
        "top_4gram_char_frac",
        *[f"dup_{n}gram_char_frac" for n in range(5, 11)],
    )


def _q_pii_scrub(spark, sf_dir):
    """PII redaction. Emails/IPs/phones are planted deterministically on every
    fourth doc (the synthetic corpus has none), so counts and the scrubbed
    text are both asserted against the SQL oracle."""
    from mmgraphrag_spark.operators.textstats import pii_scrub

    flat = _flat(spark, sf_dir).select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.when(
                F.col("doc_id") % 4 == 0,
                F.concat(
                    F.lit(" contact agent"),
                    F.col("doc_id") % 7,
                    F.lit("@mail.example.net from 10.20."),
                    F.col("doc_id") % 250,
                    F.lit(".9 or call +44 5550 "),
                    F.lit(1000) + F.col("doc_id") % 9000,
                ),
            ).otherwise(F.lit("")),
        ).alias("text"),
    )
    out = pii_scrub(flat, "doc_id", "text")
    return out.select(
        F.col("id").cast("bigint").alias("id"),
        "clean_text",
        F.col("n_emails").cast("bigint").alias("n_emails"),
        F.col("n_ips").cast("bigint").alias("n_ips"),
        F.col("n_phones").cast("bigint").alias("n_phones"),
    )


def _q_assign_split(spark, sf_dir):
    """Deterministic md5-bucket train/val/test assignment (seed-stable,
    partition-layout-independent — the reproducibility property df.sample
    lacks)."""
    from mmgraphrag_spark.operators.sampling import assign_split

    return assign_split(_flat(spark, sf_dir), "doc_id", seed="split").select(
        F.col("id").cast("bigint").alias("id"), "bucket", "split"
    )


def _q_stratified_sample(spark, sf_dir):
    """Per-stratum deterministic downsampling: 'en' docs kept at 64/256,
    'fr' kept fully, 'de' at the 13/256 default, 'zh' at 0 — the volume-
    rebalancing pass a multilingual pretraining pipeline runs."""
    from mmgraphrag_spark.operators.sampling import stratified_sample

    flat = _flat(spark, sf_dir).select(
        "doc_id",
        F.when(F.col("doc_id") % 4 == 0, "en")
        .when(F.col("doc_id") % 4 == 1, "fr")
        .when(F.col("doc_id") % 4 == 2, "de")
        .otherwise("zh")
        .alias("lang"),
    )
    out = stratified_sample(
        flat, "doc_id", "lang", {"en": 64, "fr": 256, "zh": 0},
        default_rate_per_256=13, seed="stratified",
    )
    return out.select(F.col("doc_id").cast("bigint").alias("id"), "lang")


def _q_pack_blocks(spark, sf_dir):
    """GPT-style concat-and-chunk packing plan: whitespace token counts ->
    8 content-keyed streams -> per-stream cumulative offsets -> fixed
    512-token block spans per doc. One exchange on the stream key; the
    global-cumsum WindowExec scale-killer never appears."""
    from mmgraphrag_spark.operators.sampling import pack_training_blocks
    from mmgraphrag_spark.operators.textstats import token_counts

    toks = token_counts(_flat(spark, sf_dir), "doc_id", "text").select(
        "id", F.col("ws_tokens").alias("tokens")
    )
    out = pack_training_blocks(
        toks, "id", "tokens", block_tokens=512, n_streams=8
    )
    return out.select(
        F.col("id").cast("bigint").alias("id"),
        F.col("stream").cast("int").alias("stream"),
        "stream_pos",
        "start_block",
        "end_block",
        "n_blocks",
    )


def _q_pack_manifest(spark, sf_dir):
    """Block-writer manifest: the inverse view of pack_blocks — per (stream,
    block), the ordered doc slices (id, block_offset, doc_offset, slice_len)
    that fill it, closed-form from the same per-stream cumsum. One exchange."""
    from mmgraphrag_spark.operators.sampling import pack_manifest
    from mmgraphrag_spark.operators.textstats import token_counts

    toks = token_counts(_flat(spark, sf_dir), "doc_id", "text").select(
        "id", F.col("ws_tokens").alias("tokens")
    )
    out = pack_manifest(toks, "id", "tokens", block_tokens=512, n_streams=8)
    return out.select(
        F.col("id").cast("bigint").alias("id"),
        F.col("stream").cast("int").alias("stream"),
        F.col("block").cast("bigint").alias("block"),
        "block_offset",
        "doc_offset",
        "slice_len",
    )


def _q_ivf_probe_prebuilt(spark, sf_dir):
    """The query-service shape of IVF: quantizer + inverted file built ONCE
    (build_ivf_index), then only the probe joins run per query — result-
    identical to ivf_topk at the same parameters (the fit is deterministic),
    so it shares that exact oracle. bench.py times the probe alone with the
    index built outside the timer."""
    from mmgraphrag_spark.operators.similarity import build_ivf_index, ivf_topk

    emb = _emb(spark, sf_dir)
    idx = build_ivf_index(emb, n_centroids=8, max_iter=3)
    q = emb.filter(F.col("vec_id") < 5)
    return ivf_topk(None, q, k=10, n_probe=3, index=idx).select(
        F.col("query_id").cast("bigint").alias("query_id"),
        F.col("neighbor_id").cast("bigint").alias("neighbor_id"),
        F.col("rank").cast("bigint").alias("rnk"),
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "spans_sequence": _q_spans_sequence,
        "kg_triples": _q_kg_triples,
        "kg_entities": _q_kg_entities,
        "kg_aliases": _q_kg_aliases,
        "c1_chunking": _q_c1_chunking,
        "c1_chunking_bpe": _q_c1_chunking_bpe,
        "exact_dedup": _q_exact_dedup,
        "minhash_bands": _q_minhash_bands,
        "lsh_pairs": _q_lsh_pairs,
        "simhash": _q_simhash,
        "jaccard_pairs": _q_jaccard_pairs,
        "near_dup_groups": _q_near_dup_groups,
        "link_stats": _q_link_stats,
        "lang_id": _q_lang_id,
        "quality": _q_quality,
        "token_counts": _q_token_counts,
        "fingerprint": _q_fingerprint,
        "ann_topk": _q_ann_topk,
        "embedding_near_dups": _q_embedding_near_dups,
        "embedding_near_dups_lsh": _q_embedding_near_dups_lsh,
        "simhash_pairs": _q_simhash_pairs,
        "signbit_buckets": _q_signbit_buckets,
        "centroid_dims": _q_centroid_dims,
        "a1_entity_merge": _q_a1_entity_merge,
        "a2_edge_merge": _q_a2_edge_merge,
        "a6_degree": _q_a6_degree,
        "cc_components": _q_cc_components,
        "j1_anti_join": _q_j1_anti_join,
        "a10_token_budget": _q_a10_token_budget,
        "w4_ranking": _q_w4_ranking,
        "w5_edge_ranking": _q_w5_edge_ranking,
        "j11_one_hop": _q_j11_one_hop,
        "j10_rehydrate": _q_j10_rehydrate,
        "w2_neighbor_window": _q_w2_neighbor_window,
        "u6_lcc": _q_u6_lcc,
        "a3_summarize": _q_a3_summarize,
        "kg_media_assoc": _q_kg_media_assoc,
        "j13_media_rewrite": _q_j13_media_rewrite,
        "media_features": _q_media_features,
        "lsh_ann_topk": _q_lsh_ann_topk,
        "ivf_topk": _q_ivf_topk,
        "w7_mm_limit": _q_w7_mm_limit,
        "p8_cache_hits": _q_p8_cache_hits,
        "repetition": _q_repetition,
        "decontaminate": _q_decontaminate,
        "decontaminate_spans": _q_decontaminate_spans,
        "pii_scrub": _q_pii_scrub,
        "assign_split": _q_assign_split,
        "stratified_sample": _q_stratified_sample,
        "pack_blocks": _q_pack_blocks,
        "pack_manifest": _q_pack_manifest,
        "ivf_probe_prebuilt": _q_ivf_probe_prebuilt,
    }


# ---------------------------------------------------------------------------
# oracle SQL (DuckDB). Shared fragments are python-interpolated for clarity.
# ---------------------------------------------------------------------------

# word tokens matching operators.dedup.word_tokens
_TOKS = (
    "string_split_regex(trim(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g')), ' +')"
)

# the closed-form grammar text of sources/documents.derived_grammar
_TYPE_CASE = (
    "CASE (doc_id % 50) % 4 WHEN 0 THEN 'ORGANIZATION' WHEN 1 THEN 'PERSON' "
    "WHEN 2 THEN 'GEO' ELSE 'EVENT' END"
)
_GRAMMAR = (
    "'ENTITY_' || (doc_id % 50) || ' is a ' || " + _TYPE_CASE +
    " || ' associated with topic_' || (doc_id % 7) || '.'"
    " || ' ENTITY_' || (doc_id % 50) || ' RELATES_TO ENTITY_' || ((3 * (doc_id % 50) + 1) % 50)"
    " || ' (w=' || (doc_id % 9 + 1) || ') regarding topic_' || (doc_id % 7) || '.'"
    " || ' ENTITY_' || ((3 * (doc_id % 50) + 1) % 50) || ' RELATES_TO ENTITY_' || (50 + (doc_id % 50) % 5)"
    " || ' (w=1) regarding topic_' || (doc_id % 7) || '.'"
)

# distinct grammar groups: m = doc_id % 3150 (lcm(50,7,9)); all derived values
# are functions of m
_KG_BASE = f"""
WITH mg AS (SELECT DISTINCT doc_id % 3150 AS m FROM documents),
par AS (
  SELECT m % 50 AS k, (3 * (m % 50) + 1) % 50 AS b, 50 + (m % 50) % 5 AS u,
         m % 7 AS t, m % 9 + 1 AS w
  FROM mg
),
eall AS (
  SELECT least('"ENTITY_' || k || '"', '"ENTITY_' || b || '"') AS src,
         greatest('"ENTITY_' || k || '"', '"ENTITY_' || b || '"') AS tgt,
         'relates regarding topic_' || t AS d, w
  FROM par
  UNION ALL
  SELECT least('"ENTITY_' || b || '"', '"ENTITY_' || u || '"'),
         greatest('"ENTITY_' || b || '"', '"ENTITY_' || u || '"'),
         'relates regarding topic_' || t, 1
  FROM par
),
text_edges AS (
  SELECT src, tgt, string_agg(DISTINCT d, '<SEP>' ORDER BY d) AS pred,
         CAST(sum(w) AS DOUBLE) AS weight
  FROM eall GROUP BY src, tgt
),
imgdocs AS (SELECT DISTINCT doc_id FROM documents WHERE doc_id % 40 = 0),
contain_edges AS (
  SELECT least('"ENTITY_' || (doc_id % 50) || '"', '"IMG_img://doc-' || doc_id || '/0"') AS src,
         greatest('"ENTITY_' || (doc_id % 50) || '"', '"IMG_img://doc-' || doc_id || '/0"') AS tgt,
         'contains' AS pred, CAST(10.0 AS DOUBLE) AS weight
  FROM imgdocs
)
"""


def oracle_sql() -> dict[str, str]:
    sql: dict[str, str] = {}

    sql["spans_sequence"] = f"""
SELECT 'doc-' || doc_id AS doc_id, 0 AS span_pos, 'text' AS kind, text,
       '' AS media_ref, 0 AS "offset"
FROM documents
UNION ALL
SELECT 'doc-' || doc_id, 1, 'text', {_GRAMMAR}, '', 1 FROM documents
UNION ALL
SELECT 'doc-' || doc_id, 2, 'image', 'Figure: ENTITY_' || (doc_id % 50) || '.',
       'img://doc-' || doc_id || '/0', 2
FROM documents WHERE doc_id % 40 = 0
"""

    sql["kg_triples"] = _KG_BASE + """
SELECT src AS subj, pred, tgt AS obj, weight FROM text_edges
UNION ALL
SELECT src, pred, tgt, weight FROM contain_edges
"""

    sql["kg_entities"] = _KG_BASE + """
, ksrc AS (SELECT m % 50 AS k, count(*) AS n_chunks FROM mg GROUP BY 1),
kimg AS (SELECT doc_id % 50 AS k, count(*) AS n_media FROM imgdocs GROUP BY 1)
SELECT '"ENTITY_' || ksrc.k || '"' AS entity_name,
       '"' || CASE ksrc.k % 4 WHEN 0 THEN 'ORGANIZATION' WHEN 1 THEN 'PERSON'
              WHEN 2 THEN 'GEO' ELSE 'EVENT' END || '"' AS entity_type,
       CAST(ksrc.n_chunks + COALESCE(kimg.n_media, 0) AS BIGINT) AS n_sources
FROM ksrc LEFT JOIN kimg ON ksrc.k = kimg.k
UNION ALL
SELECT DISTINCT '"ENTITY_' || u || '"', '"UNKNOWN"', 0 FROM par
UNION ALL
SELECT '"IMG_img://doc-' || doc_id || '/0"', '"ORI_IMG"', 1 FROM imgdocs
"""

    sql["kg_aliases"] = """
SELECT DISTINCT '"ENTITY_' || (doc_id % 50) || ' (IMAGE)"' AS alias,
       '"ENTITY_' || (doc_id % 50) || '"' AS canonical
FROM documents WHERE doc_id % 40 = 0
"""

    clean = (
        "trim(regexp_replace("
        "replace(replace(replace(replace(replace(trim(text),"
        "'&amp;','&'),'&lt;','<'),'&gt;','>'),'&quot;','\"'),'&#39;',''''),"
        "'[\\x00-\\x1f\\x7f-\\x9f]', '', 'g'))"
    )
    sql["c1_chunking"] = f"""
WITH t AS (
  SELECT doc_id, string_split_regex({clean}, '\\s+') AS w FROM documents
),
starts AS (
  SELECT doc_id, w, unnest(generate_series(0, greatest(len(w) - 1, 0), 24)) AS s
  FROM t
),
chunks AS (
  SELECT array_to_string(w[s + 1 : s + 32], ' ') AS content,
         len(w[s + 1 : s + 32]) AS tokens
  FROM starts
)
SELECT DISTINCT 'chunk-' || md5(content) AS chunk_id, content,
       CAST(tokens AS BIGINT) AS tokens
FROM chunks WHERE tokens > 0
"""

    # same TOKEN_PATTERN as backends.tokenizer (RE2/Java-regex-identical);
    # windows re-join tokens with no separator, so content round-trips exactly
    sql["c1_chunking_bpe"] = f"""
WITH t AS (
  SELECT doc_id,
         regexp_extract_all({clean}, '\\s*(?:[A-Za-z]+|[0-9]+|[^\\sA-Za-z0-9])') AS w
  FROM documents
),
starts AS (
  SELECT doc_id, w, unnest(generate_series(0, greatest(len(w) - 1, 0), 24)) AS s
  FROM t
),
chunks AS (
  SELECT array_to_string(w[s + 1 : s + 32], '') AS content,
         len(w[s + 1 : s + 32]) AS tokens
  FROM starts
)
SELECT DISTINCT 'chunk-' || md5(content) AS chunk_id, content,
       CAST(tokens AS BIGINT) AS tokens
FROM chunks WHERE tokens > 0
"""

    sql["exact_dedup"] = """
SELECT md5(text) AS content_hash, min(doc_id) AS keep_id,
       count(*) AS n_dupes
FROM documents GROUP BY 1
"""

    _SHINGLES3 = f"""
WITH t AS (SELECT doc_id, {_TOKS} AS w FROM documents),
tok AS (SELECT doc_id, unnest(w) AS tk, generate_subscripts(w, 1) AS o, len(w) AS n FROM t),
sh AS (
  SELECT DISTINCT a.doc_id, a.tk || ' ' || b.tk || ' ' || c.tk AS s
  FROM tok a
  JOIN tok b ON a.doc_id = b.doc_id AND b.o = a.o + 1
  JOIN tok c ON a.doc_id = c.doc_id AND c.o = a.o + 2
  WHERE a.n >= 3
  UNION
  SELECT DISTINCT doc_id, array_to_string(w, ' ') FROM t WHERE len(w) < 3
)
"""
    sql["minhash_bands"] = _SHINGLES3 + """
SELECT sh.doc_id AS id, bands.band AS band,
       min(md5('seed' || (bands.band * 2) || ':' || s)) || '|' ||
       min(md5('seed' || (bands.band * 2 + 1) || ':' || s)) AS sig
FROM sh CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS band) bands
GROUP BY 1, 2
"""

    sql["lsh_pairs"] = _SHINGLES3 + """
, sigs AS (
  SELECT sh.doc_id AS id, bands.band AS band,
         min(md5('seed' || (bands.band * 2) || ':' || s)) || '|' ||
         min(md5('seed' || (bands.band * 2 + 1) || ':' || s)) AS sig
  FROM sh CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS band) bands
  GROUP BY 1, 2
),
bounded AS (
  SELECT id, band, sig FROM (
    SELECT id, band, sig,
           row_number() OVER (PARTITION BY band, sig ORDER BY id) AS rn
    FROM sigs
  ) WHERE rn <= 1000
)
SELECT DISTINCT x.id AS a, y.id AS b
FROM bounded x JOIN bounded y ON x.band = y.band AND x.sig = y.sig AND x.id < y.id
"""

    # full dedup decision: LSH candidates + jaccard >= 0.8 verify + recursive
    # connected components; composes the shingle/sig fragments above
    sql["near_dup_groups"] = _SHINGLES3.replace(
        "WITH t AS", "WITH RECURSIVE t AS"
    ) + """
, sigs AS (
  SELECT sh.doc_id AS id, bands.band AS band,
         min(md5('seed' || (bands.band * 2) || ':' || s)) || '|' ||
         min(md5('seed' || (bands.band * 2 + 1) || ':' || s)) AS sig
  FROM sh CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS band) bands
  GROUP BY 1, 2
),
bounded AS (
  SELECT id, band, sig FROM (
    SELECT id, band, sig,
           row_number() OVER (PARTITION BY band, sig ORDER BY id) AS rn
    FROM sigs
  ) WHERE rn <= 1000
),
lshp AS (
  SELECT DISTINCT x.id AS a, y.id AS b
  FROM bounded x JOIN bounded y ON x.band = y.band AND x.sig = y.sig AND x.id < y.id
),
cnt AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
inter AS (
  SELECT p.a, p.b, count(*) AS i
  FROM lshp p JOIN sh x ON x.doc_id = p.a JOIN sh y ON y.doc_id = p.b AND y.s = x.s
  GROUP BY 1, 2
),
verified AS (
  SELECT p.a, p.b
  FROM lshp p
  JOIN cnt na ON na.doc_id = p.a
  JOIN cnt nb ON nb.doc_id = p.b
  LEFT JOIN inter i ON i.a = p.a AND i.b = p.b
  WHERE CAST(COALESCE(i.i, 0) AS DOUBLE) / (na.n + nb.n - COALESCE(i.i, 0)) >= 0.8
),
e AS (SELECT a, b FROM verified UNION SELECT b, a FROM verified),
r AS (
  SELECT doc_id AS node, doc_id AS lbl FROM documents
  UNION
  SELECT e.a, r.lbl FROM e JOIN r ON r.node = e.b
),
comp AS (SELECT node, min(lbl) AS keep FROM r GROUP BY node)
SELECT CAST(node AS BIGINT) AS id, CAST(keep AS BIGINT) AS keep_id,
       node <> keep AS is_duplicate
FROM comp
"""

    sql["link_stats"] = """
WITH t AS (
  SELECT doc_id,
         text || CASE WHEN doc_id % 5 = 0
                      THEN ' see https://example.com/page/' || doc_id ||
                           ' or mail team' || (doc_id % 7) ||
                           '@corp.example.org now'
                      ELSE '' END AS text
  FROM documents
),
x AS (
  SELECT doc_id, text,
         regexp_extract_all(text, 'https?://[^\\s]+') AS urls,
         regexp_extract_all(text,
           '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z][A-Za-z]+') AS emails
  FROM t
)
SELECT doc_id AS id,
       CAST(len(urls) AS BIGINT) AS n_urls,
       CAST(len(emails) AS BIGINT) AS n_emails,
       round(CAST(COALESCE(list_sum(list_transform(urls, u -> len(u))), 0) AS DOUBLE)
             / greatest(len(text), 1), 4) AS url_char_ratio
FROM x
"""

    _simhash_cte = f"""
WITH t AS (SELECT doc_id, list_distinct({_TOKS}) AS w FROM documents),
tok AS (SELECT doc_id, unnest(w) AS tk FROM t),
bits AS (
  SELECT doc_id, bb.b AS b,
         sum(CASE WHEN ascii(substr(md5(tk), bb.b + 1, 1)) % 2 = 1 THEN 1 ELSE -1 END) AS s
  FROM tok CROSS JOIN (SELECT unnest(generate_series(0, 31)) AS b) bb
  GROUP BY 1, 2
),
sh AS (
  SELECT doc_id AS id,
         CAST(sum(CASE WHEN s > 0 THEN CAST(pow(2, b) AS BIGINT) ELSE 0 END) AS BIGINT) AS simhash
  FROM bits GROUP BY 1
)
"""
    sql["simhash"] = _simhash_cte + "SELECT id, simhash FROM sh"

    # exact: the pigeonhole chunk-bucket candidate pass is complete for
    # Hamming <= 3, so the operator's output equals this all-pairs filter
    # (bounded to doc_id < 300, matching the Spark query)
    sql["simhash_pairs"] = _simhash_cte.replace(
        "FROM documents", "FROM documents WHERE doc_id < 300"
    ) + """
SELECT x.id AS a, y.id AS b,
       CAST(bit_count(xor(x.simhash, y.simhash)) AS BIGINT) AS hamming
FROM sh x JOIN sh y ON x.id < y.id
WHERE bit_count(xor(x.simhash, y.simhash)) <= 3
"""

    sql["jaccard_pairs"] = _SHINGLES3 + """
, pairs AS (
  SELECT d.doc_id AS a, d.doc_id + 1 AS b FROM documents d
  WHERE d.doc_id % 5 = 0 AND EXISTS (SELECT 1 FROM documents e WHERE e.doc_id = d.doc_id + 1)
),
cnt AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
inter AS (
  SELECT p.a, p.b, count(*) AS i
  FROM pairs p JOIN sh x ON x.doc_id = p.a JOIN sh y ON y.doc_id = p.b AND y.s = x.s
  GROUP BY 1, 2
)
SELECT p.a, p.b,
       round(CAST(COALESCE(i.i, 0) AS DOUBLE) / (na.n + nb.n - COALESCE(i.i, 0)), 6) AS jaccard
FROM pairs p
JOIN cnt na ON na.doc_id = p.a
JOIN cnt nb ON nb.doc_id = p.b
LEFT JOIN inter i ON i.a = p.a AND i.b = p.b
"""

    _LTOKS = (
        "string_split_regex(trim(regexp_replace(lower(text), '[^a-z一-鿿 ]', ' ', 'g')), ' +')"
    )
    markers = {
        "en": "['the','and','of','to','is','in','that','with']",
        "es": "['el','la','de','que','los','una','con','por']",
        "fr": "['le','les','des','est','une','dans','pour','sur']",
        "de": "['der','die','und','das','ist','nicht','mit','ein']",
    }
    hit_rows = " UNION ALL ".join(
        f"SELECT doc_id, '{lang}' AS lang, len(list_intersect(list_distinct(w), {arr})) AS hits FROM t"
        for lang, arr in sorted(markers.items())
    )
    sql["lang_id"] = f"""
WITH t AS (
  SELECT doc_id, {_LTOKS} AS w,
         len(regexp_extract_all(text, '[一-鿿]')) AS cjk,
         len(string_split_regex(trim(text), '\\s+')) AS ws
  FROM documents
),
h AS ({hit_rows}),
best AS (
  SELECT doc_id, lang, hits,
         row_number() OVER (PARTITION BY doc_id ORDER BY hits DESC, lang ASC) AS rn
  FROM h
)
SELECT t.doc_id AS id,
       CASE WHEN t.cjk * 2 >= t.ws THEN 'zh'
            WHEN b.hits = 0 THEN 'und' ELSE b.lang END AS lang,
       CAST(greatest(b.hits, t.cjk) AS BIGINT) AS score
FROM t JOIN best b ON b.doc_id = t.doc_id AND b.rn = 1
"""

    en = markers["en"]
    sql["quality"] = f"""
WITH t AS (
  SELECT doc_id, length(text) AS n_chars,
         len(string_split_regex(trim(text), '\\s+')) AS n_tokens,
         len(regexp_extract_all(text, '[^\\w\\s]')) AS n_punct,
         len(list_filter({_TOKS}, x -> list_contains({en}, x))) AS n_stop
  FROM documents
),
f AS (
  SELECT doc_id, n_chars, n_tokens,
         CAST(n_chars - (n_tokens - 1) AS DOUBLE) / n_tokens AS mean_len,
         CAST(n_punct AS DOUBLE) / greatest(n_chars, 1) AS punct_ratio,
         CAST(n_stop AS DOUBLE) / greatest(n_tokens, 1) AS stop_ratio
  FROM t
)
SELECT doc_id AS id, CAST(n_chars AS BIGINT) AS n_chars,
       CAST(n_tokens AS BIGINT) AS n_tokens,
       round(mean_len, 4) AS mean_token_len,
       round(punct_ratio, 4) AS punct_ratio,
       round(stop_ratio, 4) AS stopword_ratio,
       round(CAST(
         (CASE WHEN n_tokens >= 5 AND n_tokens <= 100000 THEN 0.4 ELSE 0.0 END)
         + (CASE WHEN mean_len >= 3 AND mean_len <= 12 THEN 0.3 ELSE 0.0 END)
         + (CASE WHEN punct_ratio <= 0.2 THEN 0.2 ELSE 0.0 END)
         + (CASE WHEN stop_ratio >= 0.05 THEN 0.1 ELSE 0.0 END) AS DOUBLE), 2) AS quality
FROM f
"""

    sql["token_counts"] = """
SELECT doc_id AS id,
       CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS ws_tokens,
       CAST(len(regexp_extract_all(text, '[A-Za-z]+|\\d+|[^\\sA-Za-z\\d]')) AS BIGINT) AS bpe_tokens
FROM documents
"""

    sql["fingerprint"] = f"""
WITH t AS (SELECT doc_id, {_TOKS} AS w FROM documents),
tok AS (SELECT doc_id, unnest(w) AS tk, generate_subscripts(w, 1) AS o, len(w) AS n FROM t),
sh AS (
  SELECT DISTINCT a.doc_id, a.tk || ' ' || b.tk || ' ' || c.tk || ' ' || d.tk || ' ' || e.tk AS s
  FROM tok a
  JOIN tok b ON a.doc_id = b.doc_id AND b.o = a.o + 1
  JOIN tok c ON a.doc_id = c.doc_id AND c.o = a.o + 2
  JOIN tok d ON a.doc_id = d.doc_id AND d.o = a.o + 3
  JOIN tok e ON a.doc_id = e.doc_id AND e.o = a.o + 4
  WHERE a.n >= 5
  UNION
  SELECT DISTINCT doc_id, array_to_string(w, ' ') FROM t WHERE len(w) < 5
)
SELECT doc_id AS id, min(md5(s)) AS fingerprint FROM sh GROUP BY 1
"""

    _COS_PAIRS = """
WITH q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings WHERE vec_id < 5),
c AS (SELECT vec_id AS nid, embedding AS ce FROM embeddings),
p AS (SELECT qid, nid, qe, ce FROM q CROSS JOIN c WHERE qid <> nid),
u AS (SELECT qid, nid, CAST(unnest(qe) AS DOUBLE) AS qx, CAST(unnest(ce) AS DOUBLE) AS cx FROM p),
s AS (
  SELECT qid, nid, sum(qx * cx) AS dot,
         sqrt(sum(qx * qx)) AS nq, sqrt(sum(cx * cx)) AS nc
  FROM u GROUP BY 1, 2
)
"""
    sql["ann_topk"] = _COS_PAIRS + """
SELECT qid AS query_id, nid AS neighbor_id, rnk FROM (
  SELECT qid, nid,
         row_number() OVER (PARTITION BY qid ORDER BY dot / (nq * nc + 1e-12) DESC, nid ASC) AS rnk
  FROM s
) WHERE rnk <= 10
"""

    sql["embedding_near_dups"] = """
WITH e AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 300),
p AS (
  SELECT a.vec_id AS a, b.vec_id AS b, a.embedding AS ea, b.embedding AS eb
  FROM e a JOIN e b ON a.vec_id < b.vec_id
),
u AS (SELECT a, b, CAST(unnest(ea) AS DOUBLE) AS x, CAST(unnest(eb) AS DOUBLE) AS y FROM p),
s AS (
  SELECT a, b, sum(x * y) / (sqrt(sum(x * x)) * sqrt(sum(y * y)) + 1e-12) AS cosine
  FROM u GROUP BY 1, 2
)
SELECT a, b, round(cosine, 4) AS cosine FROM s WHERE cosine >= 0.9
"""

    # candidate criterion = sign-bit buckets within Hamming distance 1 (one
    # side probes its bucket + all 1-bit flips), verified by exact cosine —
    # both halves SQL-expressible, so this oracle is exact, not rows-only
    sql["embedding_near_dups_lsh"] = """
WITH bk0 AS (
  SELECT vec_id, embedding,
         (SELECT CAST(sum(CASE WHEN x >= 0 THEN CAST(pow(2, i - 1) AS BIGINT) ELSE 0 END) AS BIGINT)
          FROM (SELECT unnest(embedding[1:8]) AS x,
                       generate_subscripts(embedding[1:8], 1) AS i)) AS bucket
  FROM embeddings
),
p AS (
  SELECT a.vec_id AS a, b.vec_id AS b, a.embedding AS ea, b.embedding AS eb
  FROM bk0 a JOIN bk0 b
    ON a.vec_id < b.vec_id AND bit_count(xor(a.bucket, b.bucket)) <= 1
),
u AS (SELECT a, b, CAST(unnest(ea) AS DOUBLE) AS x, CAST(unnest(eb) AS DOUBLE) AS y FROM p),
s AS (
  SELECT a, b, sum(x * y) / (sqrt(sum(x * x)) * sqrt(sum(y * y)) + 1e-12) AS cosine
  FROM u GROUP BY 1, 2
)
SELECT a, b, round(cosine, 4) AS cosine FROM s WHERE cosine >= 0.35
"""

    # exact oracle for the multi-probe LSH top-k: candidates = corpus vectors
    # whose sign-bit bucket is within Hamming distance 1 of the query's
    # bucket (exactly the flip set lsh_topk probes), ranked by exact cosine
    sql["lsh_ann_topk"] = """
WITH bk AS (
  SELECT vec_id, embedding,
         (SELECT CAST(sum(CASE WHEN x >= 0 THEN CAST(pow(2, i - 1) AS BIGINT) ELSE 0 END) AS BIGINT)
          FROM (SELECT unnest(embedding[1:8]) AS x,
                       generate_subscripts(embedding[1:8], 1) AS i)) AS bucket
  FROM embeddings
),
q AS (SELECT vec_id AS qid, embedding AS qe, bucket AS qb FROM bk WHERE vec_id < 5),
c AS (SELECT vec_id AS nid, embedding AS ce, bucket AS cb FROM bk),
p AS (
  SELECT qid, nid, qe, ce FROM q JOIN c
    ON qid <> nid AND bit_count(xor(qb, cb)) <= 1
),
u AS (SELECT qid, nid, CAST(unnest(qe) AS DOUBLE) AS qx, CAST(unnest(ce) AS DOUBLE) AS cx FROM p),
s AS (
  SELECT qid, nid, sum(qx * cx) AS dot,
         sqrt(sum(qx * qx)) AS nq, sqrt(sum(cx * cx)) AS nc
  FROM u GROUP BY 1, 2
)
SELECT qid AS query_id, nid AS neighbor_id, rnk FROM (
  SELECT qid, nid,
         row_number() OVER (PARTITION BY qid ORDER BY dot / (nq * nc + 1e-12) DESC, nid ASC) AS rnk
  FROM s
) WHERE rnk <= 10
"""

    # exact oracle for IVF top-k: Lloyd's k-means is deterministic here
    # (init = the 8 lowest-vec_id vectors, assignment ties to the smallest
    # label, per-dim means rounded to 6 decimals each round), so the 3
    # fixed iterations UNROLL into closed-form SQL — c0 (init) -> a1/c1 ->
    # a2/c2 -> a3/c3 -> a4 (inverted file vs the final centroids) -> 3-cell
    # probe per query -> in-probe cosine top-10. Matches the Spark operator
    # exactly at sf0.001/0.01/0.1.
    sql["ivf_topk"] = """
WITH emb AS (SELECT vec_id, embedding FROM embeddings),
c0 AS (
  SELECT row_number() OVER (ORDER BY vec_id ASC) - 1 AS label, embedding AS centroid
  FROM (SELECT vec_id, embedding FROM emb ORDER BY vec_id ASC LIMIT 8)
)
, u1 AS (
  SELECT e.vec_id, c.label,
         unnest(e.embedding) AS x, unnest(c.centroid) AS y
  FROM emb e CROSS JOIN c0 c
), s1 AS (
  SELECT vec_id, label,
         sum(x * y) / (sqrt(sum(x * x)) * sqrt(sum(y * y)) + 1e-12) AS cos
  FROM u1 GROUP BY 1, 2
), a1 AS (
  SELECT vec_id, label FROM (
    SELECT vec_id, label,
           row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, label ASC) AS rn
    FROM s1
  ) WHERE rn = 1
)
, c1 AS (
  SELECT label, list(m ORDER BY pos) AS centroid FROM (
    SELECT label, pos, round(avg(x), 6) AS m FROM (
      SELECT a.label AS label, unnest(e.embedding) AS x,
             generate_subscripts(e.embedding, 1) AS pos
      FROM a1 a JOIN emb e USING (vec_id)
    ) GROUP BY 1, 2
  ) GROUP BY label
)
, u2 AS (
  SELECT e.vec_id, c.label,
         unnest(e.embedding) AS x, unnest(c.centroid) AS y
  FROM emb e CROSS JOIN c1 c
), s2 AS (
  SELECT vec_id, label,
         sum(x * y) / (sqrt(sum(x * x)) * sqrt(sum(y * y)) + 1e-12) AS cos
  FROM u2 GROUP BY 1, 2
), a2 AS (
  SELECT vec_id, label FROM (
    SELECT vec_id, label,
           row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, label ASC) AS rn
    FROM s2
  ) WHERE rn = 1
)
, c2 AS (
  SELECT label, list(m ORDER BY pos) AS centroid FROM (
    SELECT label, pos, round(avg(x), 6) AS m FROM (
      SELECT a.label AS label, unnest(e.embedding) AS x,
             generate_subscripts(e.embedding, 1) AS pos
      FROM a2 a JOIN emb e USING (vec_id)
    ) GROUP BY 1, 2
  ) GROUP BY label
)
, u3 AS (
  SELECT e.vec_id, c.label,
         unnest(e.embedding) AS x, unnest(c.centroid) AS y
  FROM emb e CROSS JOIN c2 c
), s3 AS (
  SELECT vec_id, label,
         sum(x * y) / (sqrt(sum(x * x)) * sqrt(sum(y * y)) + 1e-12) AS cos
  FROM u3 GROUP BY 1, 2
), a3 AS (
  SELECT vec_id, label FROM (
    SELECT vec_id, label,
           row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, label ASC) AS rn
    FROM s3
  ) WHERE rn = 1
)
, c3 AS (
  SELECT label, list(m ORDER BY pos) AS centroid FROM (
    SELECT label, pos, round(avg(x), 6) AS m FROM (
      SELECT a.label AS label, unnest(e.embedding) AS x,
             generate_subscripts(e.embedding, 1) AS pos
      FROM a3 a JOIN emb e USING (vec_id)
    ) GROUP BY 1, 2
  ) GROUP BY label
)
, u4 AS (
  SELECT e.vec_id, c.label,
         unnest(e.embedding) AS x, unnest(c.centroid) AS y
  FROM emb e CROSS JOIN c3 c
), s4 AS (
  SELECT vec_id, label,
         sum(x * y) / (sqrt(sum(x * x)) * sqrt(sum(y * y)) + 1e-12) AS cos
  FROM u4 GROUP BY 1, 2
), a4 AS (
  SELECT vec_id, label FROM (
    SELECT vec_id, label,
           row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, label ASC) AS rn
    FROM s4
  ) WHERE rn = 1
)
, qs AS (SELECT vec_id AS qid, embedding AS qe FROM emb WHERE vec_id < 5),
pu AS (
  SELECT q.qid, c.label, unnest(q.qe) AS x, unnest(c.centroid) AS y
  FROM qs q CROSS JOIN c3 c
), ps AS (
  SELECT qid, label,
         sum(x * y) / (sqrt(sum(x * x)) * sqrt(sum(y * y)) + 1e-12) AS cos
  FROM pu GROUP BY 1, 2
), pr AS (
  SELECT qid, label FROM (
    SELECT qid, label,
           row_number() OVER (PARTITION BY qid ORDER BY cos DESC, label ASC) AS rn
    FROM ps
  ) WHERE rn <= 3
), cand AS (
  SELECT p.qid, i.vec_id AS nid
  FROM pr p JOIN a4 i USING (label)
  WHERE p.qid <> i.vec_id
), cu AS (
  SELECT c.qid, c.nid, unnest(q.qe) AS x, unnest(e.embedding) AS y
  FROM cand c JOIN qs q USING (qid) JOIN emb e ON e.vec_id = c.nid
), cs AS (
  SELECT qid, nid,
         sum(x * y) / (sqrt(sum(x * x)) * sqrt(sum(y * y)) + 1e-12) AS cos
  FROM cu GROUP BY 1, 2
)
SELECT CAST(qid AS BIGINT) AS query_id, CAST(nid AS BIGINT) AS neighbor_id,
       CAST(rnk AS BIGINT) AS rnk
FROM (
  SELECT qid, nid,
         row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid ASC) AS rnk
  FROM cs
) WHERE rnk <= 10
"""

    sql["w7_mm_limit"] = """
WITH u AS (SELECT DISTINCT user_id FROM events),
s AS (
  SELECT 'u' || user_id AS entity_name,
         CASE WHEN user_id % 3 = 0 THEN '"ORI_IMG"' ELSE '"PERSON"' END AS entity_type,
         row_number() OVER (ORDER BY 'u' || user_id ASC) AS rnk
  FROM u
)
SELECT entity_name, CAST(rnk AS BIGINT) AS rnk
FROM s WHERE entity_type = '"ORI_IMG"'
ORDER BY rnk LIMIT 3
"""

    sql["p8_cache_hits"] = """
WITH keyed AS (
  SELECT CAST(doc_id AS BIGINT) AS id,
         md5(to_json(struct_pack(text := text))) AS args_hash
  FROM documents
),
cache AS (
  SELECT DISTINCT md5(to_json(struct_pack(text := text))) AS args_hash
  FROM documents WHERE doc_id % 3 = 0
)
SELECT k.id, k.args_hash, (c.args_hash IS NOT NULL) AS hit
FROM keyed k LEFT JOIN cache c USING (args_hash)
"""

    sql["signbit_buckets"] = """
WITH u AS (
  SELECT vec_id, unnest(embedding[1:8]) AS x,
         generate_subscripts(embedding[1:8], 1) - 1 AS i
  FROM embeddings
)
SELECT vec_id,
       CAST(sum(CASE WHEN x >= 0 THEN CAST(pow(2, i) AS BIGINT) ELSE 0 END) AS BIGINT) AS bucket
FROM u GROUP BY 1
"""

    sql["centroid_dims"] = """
WITH u AS (
  SELECT label, unnest(embedding) AS x, generate_subscripts(embedding, 1) - 1 AS pos
  FROM embeddings
)
SELECT CAST(label AS BIGINT) AS label, CAST(pos AS BIGINT) AS pos,
       round(avg(CAST(x AS DOUBLE)), 4) + 0.0 AS mean
FROM u GROUP BY 1, 2
"""

    sql["a1_entity_merge"] = """
WITH m AS (
  SELECT 'ENTITY_' || user_id AS entity_name, upper(event_type) AS entity_type,
         'user ' || user_id || ' does ' || event_type AS description,
         'chunk-' || (event_id % 50) AS source_id
  FROM events
),
per_type AS (
  SELECT entity_name, entity_type, count(*) AS cnt FROM m GROUP BY 1, 2
),
modal AS (
  SELECT entity_name, entity_type FROM (
    SELECT entity_name, entity_type,
           row_number() OVER (PARTITION BY entity_name ORDER BY cnt DESC, entity_type ASC) AS rn
    FROM per_type
  ) WHERE rn = 1
)
SELECT m.entity_name, modal.entity_type,
       string_agg(DISTINCT m.description, '<SEP>' ORDER BY m.description) AS description,
       string_agg(DISTINCT m.source_id, '<SEP>' ORDER BY m.source_id) AS source_ids
FROM m JOIN modal ON modal.entity_name = m.entity_name
GROUP BY 1, 2
"""

    sql["a2_edge_merge"] = """
WITH r AS (
  SELECT 'E' || user_id AS s0, 'E' || ((user_id * 3 + 1) % 25) AS t0,
         'rel ' || event_type AS description,
         CAST(event_id % 7 + 1 AS DOUBLE) AS weight,
         'chunk-' || (event_id % 50) AS source_id
  FROM events
  WHERE 'E' || user_id <> 'E' || ((user_id * 3 + 1) % 25)
)
SELECT least(s0, t0) AS src, greatest(s0, t0) AS tgt,
       sum(weight) AS weight,
       string_agg(DISTINCT description, '<SEP>' ORDER BY description) AS description,
       string_agg(DISTINCT source_id, '<SEP>' ORDER BY source_id) AS source_ids,
       CAST(1 AS BIGINT) AS ord
FROM r GROUP BY 1, 2
"""

    sql["a6_degree"] = """
WITH e AS (
  SELECT DISTINCT 'u' || user_id AS src, 'u' || ((user_id * 3 + 1) % 25) AS tgt
  FROM events
  WHERE 'u' || user_id <> 'u' || ((user_id * 3 + 1) % 25)
),
n AS (SELECT src AS node FROM e UNION ALL SELECT tgt FROM e)
SELECT node, count(*) AS degree FROM n GROUP BY 1
"""

    sql["cc_components"] = """
WITH pairs AS (
  SELECT DISTINCT user_id AS uid, user_id % 7 AS root FROM events
  WHERE user_id <> user_id % 7
),
members AS (
  SELECT uid, root FROM pairs
  UNION
  SELECT DISTINCT root, root FROM pairs
),
mins AS (SELECT root, min('u' || uid) AS comp FROM members GROUP BY 1)
SELECT 'u' || m.uid AS entity_name, mins.comp AS component
FROM members m JOIN mins ON mins.root = m.root
"""

    sql["u6_lcc"] = """
WITH RECURSIVE e0 AS (
  SELECT DISTINCT 'u' || user_id AS a, 'u' || ((user_id * 3 + 1) % 25) AS b
  FROM events WHERE 'u' || user_id <> 'u' || ((user_id * 3 + 1) % 25)
),
e AS (SELECT a, b FROM e0 UNION SELECT b, a FROM e0),
n AS (SELECT DISTINCT a AS node FROM e),
r AS (
  SELECT node, node AS lbl FROM n
  UNION
  SELECT e.a, r.lbl FROM e JOIN r ON r.node = e.b
),
comp AS (SELECT node, min(lbl) AS component FROM r GROUP BY node),
sizes AS (SELECT component, count(*) AS cnt FROM comp GROUP BY 1),
top AS (SELECT component FROM sizes ORDER BY cnt DESC, component ASC LIMIT 1)
SELECT comp.node AS entity_name FROM comp JOIN top USING (component)
"""

    sql["a3_summarize"] = """
WITH t AS (SELECT doc_id, text, string_split_regex(text, '\\s+') AS w FROM documents)
SELECT doc_id AS id,
       CASE WHEN len(w) >= 60 THEN array_to_string(w[1:20], ' ') || ' ...'
            ELSE text END AS summary
FROM t
"""

    sql["kg_media_assoc"] = f"""
SELECT 'img://doc-' || doc_id || '/0' AS media_ref,
       'chunk-' || md5({_GRAMMAR}) AS chunk_id
FROM documents WHERE doc_id % 40 = 0
"""

    # media_features: re-derive the deterministic decode outputs from the
    # md5 hex of the ref (content = utf8(media_ref)); b0..b15 are the digest
    # bytes the Python backend reads from hashlib.md5(content).digest()
    _b = lambda i: f"('0x' || substr(hx, {2 * i + 1}, 2))::INT"  # noqa: E731
    _feat_sum = " + ".join(_b(i) for i in range(16))
    sql["media_features"] = f"""
WITH m AS (
  SELECT 'img://doc-' || doc_id || '/0' AS media_ref FROM documents
  WHERE doc_id % 40 = 0
),
h AS (SELECT media_ref, md5(media_ref) AS hx FROM m)
SELECT media_ref,
       CASE WHEN {_b(0)} % 4 = 0 THEN 'video/mp4' ELSE 'image/jpeg' END AS mime,
       CAST(64 + {_b(0)} AS BIGINT) AS width,
       CAST(64 + {_b(1)} AS BIGINT) AS height,
       CAST(CASE WHEN {_b(0)} % 4 = 0 THEN 1 + ({_b(2)} % 32) ELSE 1 END AS BIGINT) AS n_frames,
       CAST({_feat_sum} AS BIGINT) AS feat_bytes
FROM h
"""

    # J13: each media-bearing doc contributes its media ref to BOTH the
    # ORI_IMG entity and (via the image-entity alias contraction) the
    # canonical '"ENTITY_{{doc%50}}"'; the rewrite maps the ref to the J2
    # grammar chunk of that doc
    sql["j13_media_rewrite"] = f"""
WITH m AS (
  SELECT doc_id, 'chunk-' || md5({_GRAMMAR}) AS chunk_id
  FROM documents WHERE doc_id % 40 = 0
)
SELECT '"IMG_img://doc-' || doc_id || '/0"' AS entity_name, chunk_id FROM m
UNION
SELECT '"ENTITY_' || (doc_id % 50) || '"', chunk_id FROM m
"""

    sql["j1_anti_join"] = """
SELECT event_id FROM events
WHERE user_id NOT IN (SELECT DISTINCT user_id FROM events WHERE user_id % 3 = 0)
"""

    sql["a10_token_budget"] = """
SELECT user_id, event_id FROM (
  SELECT user_id, event_id,
         sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
  FROM events
) WHERE cum <= 500.0
"""

    sql["w4_ranking"] = """
SELECT event_id, event_type, value, rnk FROM (
  SELECT event_id, event_type, value,
         row_number() OVER (PARTITION BY event_type ORDER BY value DESC, event_id ASC) AS rnk
  FROM events
) WHERE rnk <= 5
"""

    sql["w5_edge_ranking"] = r"""
WITH e0 AS (
  SELECT 'u' || user_id AS src, 'u' || ((user_id * 3 + 1) % 25) AS tgt,
         CAST(event_id % 7 + 1 AS DOUBLE) AS w, 'rel ' || event_type AS d
  FROM events
),
e AS (
  SELECT src, tgt, sum(w) AS weight, min(d) AS description
  FROM e0 WHERE src <> tgt GROUP BY 1, 2
),
deg AS (
  SELECT node, count(*) AS degree FROM (
    SELECT src AS node FROM e UNION ALL SELECT tgt FROM e
  ) GROUP BY 1
),
seeds AS (SELECT DISTINCT 'u' || user_id AS entity_name FROM events WHERE user_id % 5 = 0),
se AS (
  SELECT e.src, e.tgt, e.weight, e.description, ds.degree + dt.degree AS edge_rank
  FROM e JOIN deg ds ON ds.node = e.src JOIN deg dt ON dt.node = e.tgt
  WHERE EXISTS (SELECT 1 FROM seeds s WHERE s.entity_name = e.src OR s.entity_name = e.tgt)
),
r AS (
  SELECT *, sum(len(string_split_regex(description, '\s+'))) OVER (
      ORDER BY edge_rank DESC, weight DESC, src ASC, tgt ASC
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
  FROM se
)
SELECT src, tgt, description, weight, CAST(edge_rank AS BIGINT) AS edge_rank
FROM r WHERE cum <= 30
"""

    sql["j11_one_hop"] = """
WITH e AS (
  SELECT DISTINCT 'u' || user_id AS src, 'u' || ((user_id * 3 + 1) % 25) AS tgt
  FROM events WHERE user_id <> (user_id * 3 + 1) % 25
),
s AS (SELECT DISTINCT 'u' || user_id AS entity_name FROM events WHERE user_id % 7 = 0)
SELECT src AS seed, tgt AS neighbor FROM e JOIN s ON e.src = s.entity_name
UNION
SELECT tgt AS seed, src AS neighbor FROM e JOIN s ON e.tgt = s.entity_name
"""

    sql["j10_rehydrate"] = """
WITH e AS (
  SELECT DISTINCT 'u' || user_id AS src, 'u' || ((user_id * 3 + 1) % 25) AS tgt
  FROM events WHERE user_id <> (user_id * 3 + 1) % 25
),
deg AS (
  SELECT node, count(*) AS degree FROM (
    SELECT src AS node FROM e UNION ALL SELECT tgt FROM e
  ) GROUP BY 1
),
ent AS (
  SELECT 'u' || user_id AS entity_name, 'USER' AS entity_type,
         'user with ' || count(*) || ' events' AS description,
         string_agg(DISTINCT 'chunk-' || (event_id % 50), '<SEP>'
                    ORDER BY 'chunk-' || (event_id % 50)) AS source_ids
  FROM events GROUP BY 1
),
ann AS (
  SELECT entity_name, sim,
         row_number() OVER (ORDER BY sim DESC, entity_name ASC) AS rnk
  FROM (
    SELECT DISTINCT 'u' || user_id AS entity_name,
           (user_id % 100) / 100.0 AS sim
    FROM events WHERE user_id % 9 = 0
  )
)
SELECT a.entity_name, ent.entity_type, ent.description, ent.source_ids,
       round(a.sim, 6) AS sim, CAST(a.rnk AS BIGINT) AS rnk,
       CAST(COALESCE(d.degree, 0) AS BIGINT) AS degree
FROM ann a
JOIN ent ON ent.entity_name = a.entity_name
LEFT JOIN deg d ON d.node = a.entity_name
"""

    sql["w2_neighbor_window"] = """
WITH g AS (
  SELECT user_id,
         epoch(ts) - lag(epoch(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap
  FROM events
)
SELECT user_id, count(*) AS n_quick FROM g WHERE gap <= 60.0 GROUP BY 1
"""

    # same planted duplicate lines / repeated phrase and the same closed-form
    # math as operators.textstats.repetition_features (prefix-tagged units,
    # argmax n-gram by (count, gram), capped dup-gram char sums); grams come
    # from list slices over the token array because RE2 has no lookahead —
    # proven set-identical to the Spark regex in tests
    dup_cols = ",\n         ".join(
        f"sum(CASE WHEN substr(u, 1, 1) = '{p}' AND cnt > 1"
        f" THEN cnt * (len(u) - 1) ELSE 0 END) AS dupg{n}"
        for p, n in [("5", 5), ("6", 6), ("7", 7), ("8", 8), ("9", 9), ("x", 10)]
    )
    dup_out = ",\n       ".join(
        f"round(least(CAST(1.0 AS DOUBLE), COALESCE(a.dupg{n}, 0)"
        f" / greatest(CAST(len(b.norm) AS DOUBLE), 1)), 4) AS dup_{n}gram_char_frac"
        for n in range(5, 11)
    )
    sql["repetition"] = f"""
WITH t AS (
  SELECT doc_id,
         text || CASE WHEN doc_id % 3 = 0
                      THEN chr(10) || 'repeated line alpha' ||
                           chr(10) || 'repeated line alpha' ||
                           chr(10) || 'unique tail ' || (doc_id % 11)
                      ELSE '' END
              || CASE WHEN doc_id % 5 = 0
                      THEN ' {_REP_PHRASE} {_REP_PHRASE}'
                      ELSE '' END AS text
  FROM documents
),
b AS (
  SELECT doc_id,
         list_filter(list_transform(string_split(text, chr(10)), x -> trim(x)),
                     x -> x <> '') AS lines,
         regexp_replace(trim(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g')),
                        ' +', ' ', 'g') AS norm
  FROM t
),
bw AS (SELECT doc_id, norm, string_split(norm, ' ') AS w FROM b WHERE norm <> ''),
lu AS (SELECT doc_id, 'l' || unnest(lines) AS u FROM b),
gu AS (
  SELECT bw.doc_id, k.pfx || array_to_string(w[t.i : t.i + k.n - 1], ' ') AS u
  FROM bw,
       (VALUES ('2', 2), ('3', 3), ('4', 4), ('5', 5), ('6', 6),
               ('7', 7), ('8', 8), ('9', 9), ('x', 10)) AS k(pfx, n),
       unnest(generate_series(1, len(w) - k.n + 1)) AS t(i)
),
units AS (SELECT * FROM lu UNION ALL SELECT * FROM gu),
per AS (SELECT doc_id, u, count(*) AS cnt FROM units GROUP BY 1, 2),
agg AS (
  SELECT doc_id,
         sum(CASE WHEN substr(u, 1, 1) = 'l' THEN cnt ELSE 0 END) AS n_lines,
         sum(CASE WHEN substr(u, 1, 1) = 'l' THEN 1 ELSE 0 END) AS n_distinct,
         sum(CASE WHEN substr(u, 1, 1) = 'l' AND cnt > 1
                  THEN cnt * (len(u) - 1) ELSE 0 END) AS dup_chars,
         sum(CASE WHEN substr(u, 1, 1) = 'l'
                  THEN cnt * (len(u) - 1) ELSE 0 END) AS tot_chars,
         {dup_cols}
  FROM per GROUP BY 1
),
topg AS (
  SELECT doc_id, substr(u, 1, 1) AS k, cnt * (len(u) - 1) AS topchars
  FROM per WHERE substr(u, 1, 1) IN ('2', '3', '4')
  QUALIFY row_number() OVER (PARTITION BY doc_id, substr(u, 1, 1)
                             ORDER BY cnt DESC, u DESC) = 1
),
topa AS (
  SELECT doc_id,
         max(CASE WHEN k = '2' THEN topchars END) AS top2,
         max(CASE WHEN k = '3' THEN topchars END) AS top3,
         max(CASE WHEN k = '4' THEN topchars END) AS top4
  FROM topg GROUP BY 1
)
SELECT b.doc_id AS id,
       CAST(COALESCE(a.n_lines, 0) AS BIGINT) AS n_lines,
       round(CASE WHEN COALESCE(a.n_lines, 0) > 0
                  THEN 1 - a.n_distinct / CAST(a.n_lines AS DOUBLE)
                  ELSE 0 END, 4) AS dup_line_frac,
       round(COALESCE(a.dup_chars, 0) / greatest(CAST(COALESCE(a.tot_chars, 0) AS DOUBLE), 1),
             4) AS dup_line_char_frac,
       round(COALESCE(g.top2 / greatest(CAST(len(b.norm) AS DOUBLE), 1), 0),
             4) AS top_bigram_char_frac,
       round(COALESCE(g.top3 / greatest(CAST(len(b.norm) AS DOUBLE), 1), 0),
             4) AS top_3gram_char_frac,
       round(COALESCE(g.top4 / greatest(CAST(len(b.norm) AS DOUBLE), 1), 0),
             4) AS top_4gram_char_frac,
       {dup_out}
FROM b
LEFT JOIN agg a USING (doc_id)
LEFT JOIN topa g USING (doc_id)
"""

    # same distinct word 5-grams as the fingerprint oracle (positional token
    # self-join; <5-token docs fall back to the whole normalized text), every
    # 97th doc as the benchmark side, count >= 3 distinct shared shingles
    sql["decontaminate"] = f"""
WITH d0 AS (
  SELECT doc_id,
         text || CASE WHEN doc_id % 9 = 0
                      THEN ' the famous benchmark question asks what the quick fox does at dawn'
                      ELSE '' END AS text
  FROM documents
),
t AS (SELECT doc_id, {_TOKS} AS w FROM d0),
tok AS (SELECT doc_id, unnest(w) AS tk, generate_subscripts(w, 1) AS o, len(w) AS n FROM t),
sh AS (
  SELECT DISTINCT a.doc_id, a.tk || ' ' || b.tk || ' ' || c.tk || ' ' || d.tk || ' ' || e.tk AS s
  FROM tok a
  JOIN tok b ON a.doc_id = b.doc_id AND b.o = a.o + 1
  JOIN tok c ON a.doc_id = c.doc_id AND c.o = a.o + 2
  JOIN tok d ON a.doc_id = d.doc_id AND d.o = a.o + 3
  JOIN tok e ON a.doc_id = e.doc_id AND e.o = a.o + 4
  WHERE a.n >= 5
  UNION
  SELECT DISTINCT doc_id, array_to_string(w, ' ') FROM t WHERE len(w) < 5
),
bsh AS (SELECT doc_id AS bench_id, s FROM sh WHERE doc_id % 97 = 0)
SELECT d.doc_id AS id, b.bench_id, CAST(count(*) AS BIGINT) AS n_shared
FROM sh d JOIN bsh b USING (s)
GROUP BY 1, 2
HAVING count(*) >= 3
"""

    # GPT-3 appx-C span decontamination: positional 13-grams from token-array
    # slices (the Spark side's posexplode index i-1 == DuckDB's 1-based slice
    # start - 1), pad 5 tokens, clamp to the doc, merge islands with the same
    # null-comparison-is-false CASE the Spark window uses
    sql["decontaminate_spans"] = f"""
WITH d0 AS (
  SELECT doc_id,
         text || CASE WHEN doc_id % 9 = 0 THEN ' {_SPAN_CANARY}' ELSE '' END AS text
  FROM documents
),
t AS (SELECT doc_id, {_TOKS} AS w FROM d0),
sh AS (
  SELECT doc_id, g.i - 1 AS pos,
         array_to_string(w[g.i : g.i + 12], ' ') AS s, len(w) AS ntok
  FROM t, unnest(generate_series(1, len(w) - 12)) AS g(i)
),
bsh AS (SELECT DISTINCT s FROM sh WHERE doc_id % 97 = 0),
hits AS (
  SELECT doc_id, greatest(pos - 5, 0) AS s0, least(pos + 12 + 5, ntok - 1) AS e0
  FROM sh JOIN bsh USING (s)
),
isl AS (
  SELECT doc_id, s0, e0,
         sum(CASE WHEN s0 > pm + 1 THEN 1 ELSE 0 END)
           OVER (PARTITION BY doc_id ORDER BY s0, e0
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
  FROM (
    SELECT doc_id, s0, e0,
           max(e0) OVER (PARTITION BY doc_id ORDER BY s0, e0
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pm
    FROM hits
  )
)
SELECT doc_id AS id,
       CAST(min(s0) AS BIGINT) AS span_start,
       CAST(max(e0) AS BIGINT) AS span_end
FROM isl GROUP BY doc_id, island
"""

    # the identical RE2-compatible patterns as textstats.PII_EMAIL/IP/PHONE,
    # counted on the text AS OF each scrub stage (emails -> IPs -> phones)
    sql["pii_scrub"] = f"""
WITH t AS (
  SELECT doc_id,
         text || CASE WHEN doc_id % 4 = 0
                      THEN ' contact agent' || (doc_id % 7) ||
                           '@mail.example.net from 10.20.' || (doc_id % 250) ||
                           '.9 or call +44 5550 ' || (1000 + doc_id % 9000)
                      ELSE '' END AS text
  FROM documents
),
s1 AS (
  SELECT doc_id,
         len(regexp_extract_all(text, '{_PII_EMAIL}')) AS n_emails,
         regexp_replace(text, '{_PII_EMAIL}', '[EMAIL]', 'g') AS t1
  FROM t
),
s2 AS (
  SELECT doc_id, n_emails,
         len(regexp_extract_all(t1, '{_PII_IP}')) AS n_ips,
         regexp_replace(t1, '{_PII_IP}', '[IP]', 'g') AS t2
  FROM s1
),
s3 AS (
  SELECT doc_id, n_emails, n_ips,
         len(regexp_extract_all(t2, '{_PII_PHONE}')) AS n_phones,
         regexp_replace(t2, '{_PII_PHONE}', '[PHONE]', 'g') AS t3
  FROM s2
)
SELECT doc_id AS id, t3 AS clean_text,
       CAST(n_emails AS BIGINT) AS n_emails,
       CAST(n_ips AS BIGINT) AS n_ips,
       CAST(n_phones AS BIGINT) AS n_phones
FROM s3
"""

    # md5 hex-prefix buckets compared lexicographically against fixed-width
    # hex literals — train=205/256 -> 'cd', val=230/256 -> 'e6' (the same
    # _hex2 math as operators.sampling.assign_split)
    sql["assign_split"] = """
WITH b AS (
  SELECT doc_id, substr(md5('split:' || doc_id), 1, 2) AS bucket FROM documents
)
SELECT doc_id AS id, bucket,
       CASE WHEN bucket < 'cd' THEN 'train'
            WHEN bucket < 'e6' THEN 'val'
            ELSE 'test' END AS split
FROM b
"""

    # per-stratum keep thresholds: en 64 -> '40', fr 256 -> keep all,
    # zh 0 -> '00' (drop all), default (de) 13 -> '0d'
    sql["stratified_sample"] = """
WITH t AS (
  SELECT doc_id,
         CASE doc_id % 4 WHEN 0 THEN 'en' WHEN 1 THEN 'fr'
              WHEN 2 THEN 'de' ELSE 'zh' END AS lang,
         substr(md5('stratified:' || doc_id), 1, 2) AS b
  FROM documents
)
SELECT doc_id AS id, lang FROM t
WHERE b < CASE lang WHEN 'en' THEN '40' WHEN 'fr' THEN 'zz'
               WHEN 'zh' THEN '00' ELSE '0d' END
"""

    # concat-and-chunk packing: same md5 stream key (hex pair -> int via
    # digit positions — no engine-specific hex casts), same string-ordered
    # per-stream cumulative sum, same closed-form block spans
    sql["pack_blocks"] = """
WITH t AS (
  SELECT doc_id,
         CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS tok,
         substr(md5('pack:' || doc_id), 1, 2) AS b
  FROM documents
), s AS (
  SELECT doc_id, tok,
         ((strpos('0123456789abcdef', substr(b, 1, 1)) - 1) * 16
          + strpos('0123456789abcdef', substr(b, 2, 1)) - 1) % 8 AS stream
  FROM t
), c AS (
  SELECT doc_id, tok, stream,
         SUM(tok) OVER (PARTITION BY stream ORDER BY CAST(doc_id AS VARCHAR)
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           - tok AS stream_pos
  FROM s
)
SELECT doc_id AS id,
       CAST(stream AS INTEGER) AS stream,
       CAST(stream_pos AS BIGINT) AS stream_pos,
       CAST(stream_pos // 512 AS BIGINT) AS start_block,
       CAST((stream_pos + GREATEST(tok - 1, 0)) // 512 AS BIGINT) AS end_block,
       CAST(CASE WHEN tok = 0 THEN 0
                 ELSE (stream_pos + tok - 1) // 512
                      - stream_pos // 512 + 1 END AS BIGINT) AS n_blocks
FROM c
"""

    # the packer's inverse view: same stream/cumsum CTEs, then one block-range
    # unnest per doc and the clip arithmetic (block_offset / doc_offset /
    # slice_len) — zero-token docs contribute no slice
    sql["pack_manifest"] = """
WITH t AS (
  SELECT doc_id,
         CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS tok,
         substr(md5('pack:' || doc_id), 1, 2) AS b
  FROM documents
), s AS (
  SELECT doc_id, tok,
         ((strpos('0123456789abcdef', substr(b, 1, 1)) - 1) * 16
          + strpos('0123456789abcdef', substr(b, 2, 1)) - 1) % 8 AS stream
  FROM t
), c AS (
  SELECT doc_id, tok, stream,
         SUM(tok) OVER (PARTITION BY stream ORDER BY CAST(doc_id AS VARCHAR)
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           - tok AS stream_pos
  FROM s
)
SELECT doc_id AS id,
       CAST(stream AS INTEGER) AS stream,
       CAST(t.blk AS BIGINT) AS block,
       CAST(greatest(t.blk * 512, stream_pos) - t.blk * 512 AS BIGINT) AS block_offset,
       CAST(greatest(t.blk * 512, stream_pos) - stream_pos AS BIGINT) AS doc_offset,
       CAST(least((t.blk + 1) * 512, stream_pos + tok)
            - greatest(t.blk * 512, stream_pos) AS BIGINT) AS slice_len
FROM c, unnest(generate_series(CAST(stream_pos // 512 AS BIGINT),
                               CAST((stream_pos + tok - 1) // 512 AS BIGINT))) AS t(blk)
WHERE tok > 0
"""

    # result-identical to ivf_topk (deterministic fit, same parameters) — the
    # prebuilt-index path must reproduce the refit path bit-for-bit
    sql["ivf_probe_prebuilt"] = sql["ivf_topk"]

    return sql
