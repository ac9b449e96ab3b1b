"""Similarity search over embedding columns (array<float>).

Brute-force exact cosine top-k as the correctness baseline (J8/J9/W6 of
SURVEY.md §2), and a sign-bit LSH-bucketed approximate variant as the scale
path: bucket = sign pattern of the first B components (a fixed, deterministic
set of hyperplanes — axis-aligned — reproducible in plain SQL). At 100 TB the
bucketed join replaces the crossJoin: each query probes its own bucket plus
Hamming-1 neighbors, turning O(N*Q) into O(Q * bucket_size).

All cosine math is JVM higher-order functions; no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from mmgraphrag_spark.functions.vectors import cosine_similarity_col


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float | None = None,
) -> DataFrame:
    """Exact cosine top-k: (query_id, neighbor_id, cosine, rank).

    queries is small -> broadcast against the corpus scan; ranking is one
    window shuffle on query_id. Ties broken by neighbor id (deterministic)."""
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qv")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_cv")
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cosine", cosine_similarity_col(F.col("_qv"), F.col("_cv")))
    )
    if threshold is not None:
        scored = scored.filter(F.col("cosine") >= threshold)
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.round("cosine", 6).alias("cosine"), "rank")
    )


def signbit_bucket(vec: Column, n_bits: int = 8) -> Column:
    """Deterministic LSH bucket: sum over the first n_bits components of
    2^i * (component_i >= 0)."""
    return F.aggregate(
        F.zip_with(
            F.slice(vec, 1, n_bits),
            F.sequence(F.lit(0), F.lit(n_bits - 1)),
            lambda v, i: F.when(
                v >= 0, F.pow(F.lit(2.0), i.cast("double")).cast("long")
            ).otherwise(F.lit(0).cast("long")),
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_bits: int = 8,
    probe_hamming: int = 1,
) -> DataFrame:
    """Approximate top-k: probe the query's sign-bit bucket and all buckets
    within Hamming distance ``probe_hamming`` (multi-probe), exact cosine
    within the probed set. Same output shape as brute_force_topk."""
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("_cv"),
        signbit_bucket(F.col(vec_col), n_bits).alias("bucket"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("_qv"),
        signbit_bucket(F.col(vec_col), n_bits).alias("_qb"),
    )
    # multi-probe: expand each query to its bucket + Hamming-1 neighbors
    flips = [F.col("_qb")] + [
        F.col("_qb").bitwiseXOR(F.lit(1 << i)) for i in range(n_bits)
    ][: (n_bits if probe_hamming >= 1 else 0)]
    q = q.withColumn("bucket", F.explode(F.array(*flips)))
    scored = (
        c.join(F.broadcast(q), "bucket")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cosine", cosine_similarity_col(F.col("_qv"), F.col("_cv")))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.round("cosine", 6).alias("cosine"), "rank")
    )


def centroid_per_label(
    embeddings: DataFrame,
    label_col: str = "label",
    vec_col: str = "embedding",
) -> DataFrame:
    """(label, centroid): element-wise mean vector per label — the IVF coarse
    quantizer build step (k-means assignment is a repeated application of
    brute_force_topk against these centroids).

    posexplode + avg keeps the aggregation partial (sum/count combine map-side)
    instead of collect_list'ing whole vectors; the final array re-assembly
    groups tiny (label, dim) rows."""
    per_dim = (
        embeddings.select(
            F.col(label_col).alias("label"),
            F.posexplode(F.col(vec_col)).alias("pos", "v"),
        )
        .groupBy("label", "pos")
        .agg(F.avg("v").alias("mean"))
    )
    return (
        per_dim.groupBy("label")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "mean"))),
                lambda s: F.round(s.getField("mean"), 6),
            ).alias("centroid")
        )
    )
