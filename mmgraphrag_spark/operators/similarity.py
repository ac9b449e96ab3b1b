"""Similarity search over embedding columns (array<float>).

Brute-force exact cosine top-k as the correctness baseline (J8/J9/W6 of
SURVEY.md §2), and a sign-bit LSH-bucketed approximate variant as the scale
path: bucket = sign pattern of the first B components (a fixed, deterministic
set of hyperplanes — axis-aligned — reproducible in plain SQL). At 100 TB the
bucketed join replaces the crossJoin: each query probes its own bucket plus
Hamming-1 neighbors, turning O(N*Q) into O(Q * bucket_size).

Cosine math on the pruned candidate sets is JVM higher-order functions; the
k-means fit's N x k assignment runs as Arrow-batched numpy matmuls (one per
batch — the interpreted JVM lambda was measured slower there, CLAUDE.md
rule 4/5).
"""

from __future__ import annotations

import os

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
    broadcast_queries: bool = True,
) -> DataFrame:
    """Approximate top-k: probe the query's sign-bit bucket and all buckets
    within Hamming distance ``probe_hamming`` (multi-probe), exact cosine
    within the probed set. Same output shape as brute_force_topk.

    ``broadcast_queries=True`` (default) is right for interactive query sets
    (each query expands x(n_bits+1) probes and the whole set must fit in a
    broadcast). For query sides too large to broadcast — batch kNN self-join
    shapes — pass False to take a shuffle hash join on the bucket key
    instead; the plan stays an equi-join either way. At 100 TB also raise
    ``n_bits`` (16-24) so corpus buckets stay bounded."""
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
    q_side = F.broadcast(q) if broadcast_queries else q
    scored = (
        c.join(q_side, "bucket")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cosine", cosine_similarity_col(F.col("_qv"), F.col("_cv")))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.round("cosine", 6).alias("cosine"), "rank")
    )


def assign_nearest_centroid(
    embeddings: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, vec) x (label, centroid) -> (id, vec, label of nearest centroid by
    cosine, ties to the smallest label).

    This is the k-means/IVF hot path — it runs once per fit round plus once
    for the inverted file, over every corpus vector x k centroids. A JVM
    crossJoin with the higher-order-function cosine is INTERPRETED per array
    element (N*k*dim lambda evals — CLAUDE.md rule 4) and measured ~4x
    slower than shipping each Arrow batch through ONE numpy matmul:
    (B x dim) @ (dim x k), row-normalized, argmax per row (numpy argmax
    takes the FIRST max -> smallest label on exact ties, matching the
    max-struct tie-break the JVM version had). The k centroids are collected
    to the driver and ride the closure — k is the quantizer size, tiny by
    definition (they were broadcast anyway). No shuffle at all: the map is
    partition-local, embarrassingly parallel at any corpus size."""
    import numpy as np
    import pandas as pd

    rows = sorted(centroids.collect(), key=lambda r: r["label"])
    labels = np.array([int(r["label"]) for r in rows], dtype="int32")
    cmat = np.array([r["centroid"] for r in rows], dtype="float64")
    cnorm = np.sqrt((cmat * cmat).sum(axis=1))

    src = embeddings.select(id_col, vec_col)
    # pin partitions before the python stage (CLAUDE.md rule 3): a
    # localCheckpoint'ed or AQE-coalesced corpus can arrive in 1-2
    # partitions, serializing the N x k assignment onto as many cores.
    # Repartition only when under-parallel — at full width the map is
    # already partition-local and the extra shuffle would be pure cost.
    # The width probe needs an RDD handle, and DataFrame->RDD conversion
    # re-plans the whole lineage — prohibitive on deep uncut plans (rule 2).
    # A lazy localCheckpoint cuts the plan exactly once, right here: the
    # probe below and the mapInPandas both consume the cut LogicalRDD
    # instead of each re-analyzing the original lineage (no extra compute
    # pass; the checkpoint materializes with the map job itself).
    par = embeddings.sparkSession.sparkContext.defaultParallelism
    src = src.localCheckpoint(eager=False)
    if src.rdd.getNumPartitions() < par:
        src = src.repartition(par)
    out_schema = ", ".join(
        [f"{f.name} {f.dataType.simpleString()}" for f in src.schema.fields]
        + ["label int"]
    )

    def run(it):
        for pdf in it:
            if not len(pdf):
                yield pdf.assign(label=pd.Series([], dtype="int32"))
                continue
            x = np.stack(pdf[vec_col].to_numpy())
            xnorm = np.sqrt((x * x).sum(axis=1))
            cos = (x @ cmat.T) / (np.outer(xnorm, cnorm) + 1e-12)
            pdf = pdf.copy()
            pdf["label"] = labels[np.argmax(cos, axis=1)]
            yield pdf

    return src.mapInPandas(run, out_schema)


def kmeans_fit(
    embeddings: DataFrame,
    k: int = 16,
    max_iter: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF coarse quantizer: Lloyd's k-means, fully DataFrame-native.

    Init = the k lowest-id vectors (deterministic). The k init rows come to
    the driver via TakeOrderedAndProject (k is the quantizer size — tiny by
    definition), so no window/shuffle at all in the init.

    Loop shape = Spark MLlib KMeans': the k x dim centroid state lives on
    the DRIVER (it is driver-sized by definition), and each Lloyd round is
    ONE job — an Arrow-batched mapInPandas computes per-partition partial
    (label, vector-sum, count) via a single numpy matmul per batch, the
    k x n_partitions partial rows collect, and the driver finishes the means
    (rounded to 6 decimals — the determinism sync point the SQL oracle
    keys on). This replaced a per-round crossJoin + posexplode-shuffle +
    localCheckpoint chain (3+ jobs and two shuffles per round, all fixed
    overhead at any corpus size — the partial-agg round is shuffle-free and
    its collect payload is k*(dim+1) doubles per partition regardless of N).
    Labels that lose every member drop, exactly as the old groupBy did.
    Returns (label, centroid)."""
    import numpy as np

    rows = embeddings.select(id_col, vec_col).orderBy(id_col).limit(k).collect()
    labels = list(range(len(rows)))
    cmat = np.array([[float(x) for x in r[vec_col]] for r in rows], dtype="float64")
    # materialize the (repartitioned) vectors once — every round re-scans
    # them, and the source may be an expensive sub-plan
    spark = embeddings.sparkSession
    src = (
        embeddings.select(vec_col)
        .repartition(spark.sparkContext.defaultParallelism)
        .localCheckpoint()
    )

    for _ in range(max_iter):
        lab = np.array(labels, dtype="int32")
        cm = cmat
        cnorm = np.sqrt((cm * cm).sum(axis=1))

        def partials(it):
            import pandas as pd

            for pdf in it:
                if not len(pdf):
                    continue
                x = np.stack(pdf[vec_col].to_numpy())
                xn = np.sqrt((x * x).sum(axis=1))
                best = np.argmax((x @ cm.T) / (np.outer(xn, cnorm) + 1e-12), axis=1)
                seen = np.unique(best)
                yield pd.DataFrame(
                    {
                        "label": lab[seen],
                        "psum": [x[best == i].sum(axis=0).tolist() for i in seen],
                        "cnt": [int((best == i).sum()) for i in seen],
                    }
                )

        acc: dict[int, tuple[np.ndarray, int]] = {}
        for r in src.mapInPandas(
            partials, "label int, psum array<double>, cnt bigint"
        ).collect():
            s, c = acc.get(r["label"], (0.0, 0))
            acc[r["label"]] = (s + np.array(r["psum"], dtype="float64"), c + r["cnt"])
        labels = sorted(acc)
        cmat = np.array(
            [np.round(acc[l][0] / acc[l][1], 6) for l in labels], dtype="float64"
        )

    return spark.createDataFrame(
        [(int(l), c.tolist()) for l, c in zip(labels, cmat)],
        "label int, centroid array<double>",
    ).localCheckpoint()


def build_ivf_index(
    corpus: DataFrame,
    n_centroids: int = 16,
    max_iter: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[DataFrame, DataFrame]:
    """Fit the IVF index ONCE for reuse across queries: (centroids, inverted
    file). The k-means fit and the full-corpus assignment are the expensive
    parts of ivf_topk — a query service must not repeat them per question
    (the reference builds its VDB once at indexing time, storage.py:125-155).
    Both frames are materialized (localCheckpoint); persist them to parquet
    instead when the corpus outgrows executor storage — the shape is the
    same."""
    # kmeans_fit already returns a materialized (localCheckpoint'ed) k-row
    # frame — wrapping it again would cost a second no-op job per build
    centroids = kmeans_fit(
        corpus, k=n_centroids, max_iter=max_iter, id_col=id_col, vec_col=vec_col
    )
    inverted = (
        assign_nearest_centroid(corpus, centroids, id_col, vec_col)
        .select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_cv"), "label")
        .localCheckpoint()
    )
    return centroids, inverted


def save_ivf_index(index: tuple[DataFrame, DataFrame], path: str) -> None:
    """Persist an IVF index for reuse ACROSS driver processes (the reference
    persists its VDB at indexing time, storage.py:125-155): a query service
    indexes once with `submit_job --build-ann-index` and every later
    `query_job --ann-mode ivf` loads instead of refitting. Two parquet
    tables — the k-row quantizer and the inverted file partitionBy'd on the
    cell label, so the per-query probe join (a broadcast join on the
    partition column) dynamic-partition-prunes to the probed cells instead
    of scanning the whole file. Write order is load-order-safe EVEN over an
    existing index: the whole directory is deleted first (also forestalling
    partitionOverwriteMode=dynamic merging a previous index's surviving
    label dirs into this one), then the inverted file lands, then the k-row
    quantizer — so the ``centroids/`` directory the loaders probe for is a
    true commit marker and a crash mid-save never leaves anything
    loadable."""
    from mmgraphrag_spark.plans import fs_delete

    centroids, inverted = index
    fs_delete(centroids.sparkSession, path)
    inverted.write.mode("overwrite").partitionBy("label").parquet(
        os.path.join(path, "inverted")
    )
    centroids.write.mode("overwrite").parquet(os.path.join(path, "centroids"))


def load_ivf_index(spark, path: str) -> tuple[DataFrame, DataFrame]:
    """Load a save_ivf_index directory back into the (centroids, inverted)
    pair ivf_topk consumes. The centroids localCheckpoint (k rows, collected
    per query); the inverted file stays a lazy parquet scan so the probe
    join's label filter pushes down to the scan."""
    centroids = spark.read.parquet(os.path.join(path, "centroids")).localCheckpoint()
    inverted = spark.read.parquet(os.path.join(path, "inverted"))
    return centroids, inverted


def ivf_topk(
    corpus: DataFrame | None,
    queries: DataFrame,
    k: int = 10,
    n_centroids: int = 16,
    n_probe: int = 4,
    max_iter: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    broadcast_queries: bool = True,
    index: tuple[DataFrame, DataFrame] | None = None,
) -> DataFrame:
    """IVF approximate top-k: fit the coarse quantizer, bucket the corpus by
    nearest centroid (the inverted file), probe each query's ``n_probe``
    nearest cells, exact cosine within the probed cells only.
    ``broadcast_queries=False`` switches the probe join to a shuffle hash
    join for query sides too large to broadcast. Pass ``index`` (from
    :func:`build_ivf_index`) to reuse a prebuilt quantizer + inverted file
    instead of refitting per call — the per-query cost is then just the
    probe joins, and ``corpus`` may be None (the inverted file already
    holds every corpus vector).

    Scale shape: the corpus-side join key is the cell label (single hash
    shuffle, cells ~N/n_centroids); queries explode x n_probe. At 100 TB
    raise n_centroids so cells stay bounded — the plan is unchanged. Same
    output shape as brute_force_topk; recall vs brute force is asserted in
    pytest (approximate results have no SQL oracle)."""
    if index is not None:
        centroids, inverted = index
    elif corpus is None:
        raise ValueError("corpus=None requires a prebuilt index")
    else:
        centroids = kmeans_fit(corpus, k=n_centroids, max_iter=max_iter,
                               id_col=id_col, vec_col=vec_col)
        inverted = assign_nearest_centroid(corpus, centroids, id_col, vec_col).select(
            F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_cv"), "label"
        )
    c = centroids.select(F.col("label").alias("_cl"), F.col("centroid").alias("_ctr"))
    qcells = (
        queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qv"))
        .crossJoin(F.broadcast(c))
        .withColumn("_cos", cosine_similarity_col(F.col("_qv"), F.col("_ctr")))
    )
    wq = Window.partitionBy("query_id").orderBy(F.desc("_cos"), F.asc("_cl"))
    probes = (
        qcells.withColumn("_pr", F.row_number().over(wq))
        .filter(F.col("_pr") <= n_probe)
        .select("query_id", "_qv", F.col("_cl").alias("label"))
    )
    probe_side = F.broadcast(probes) if broadcast_queries else probes
    scored = (
        inverted.join(probe_side, "label")
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
