"""Similarity-search tests: brute-force top-k, sign-bit LSH top-k, centroids."""

from __future__ import annotations

import math

from mmgraphrag_spark.operators import similarity as SIM


def _emb(spark):
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0], 0),
        (1, [0.9, 0.1, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0], 0),
        (2, [0.0, 1.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0], 1),
        (3, [-1.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0], 1),
    ]
    return spark.createDataFrame(rows, ["vec_id", "embedding", "label"])


def test_brute_force_topk(spark):
    emb = _emb(spark)
    q = emb.filter("vec_id = 0")
    got = SIM.brute_force_topk(emb, q, k=2).orderBy("rank").collect()
    assert [r.neighbor_id for r in got] == [1, 2]
    assert got[0].cosine > 0.99


def test_lsh_topk_finds_same_bucket_neighbor(spark):
    emb = _emb(spark)
    q = emb.filter("vec_id = 0")
    got = SIM.lsh_topk(emb, q, k=2, n_bits=4).orderBy("rank").collect()
    assert got[0].neighbor_id == 1  # nearest neighbor shares the sign pattern


def test_signbit_bucket_deterministic(spark):
    from pyspark.sql import functions as F

    emb = _emb(spark)
    b = emb.select(
        "vec_id", SIM.signbit_bucket(F.col("embedding"), 4).alias("bucket")
    ).collect()
    got = {r.vec_id: r.bucket for r in b}
    assert got[0] == 0b1111  # all non-negative
    assert got[3] == 0b1110  # first component negative


def test_centroids(spark):
    emb = _emb(spark)
    cents = {r.label: r.centroid for r in SIM.centroid_per_label(emb).collect()}
    assert math.isclose(cents[0][0], 0.95)
    assert math.isclose(cents[1][0], -0.5)
    assert len(cents[0]) == 8


def test_kmeans_fit_separates_clusters(spark):
    """Two well-separated planted clusters -> two centroids, one near each
    cluster mean; assignment is deterministic (min-id init, struct argmax)."""
    import random

    from pyspark.sql import functions as F

    rng = random.Random(3)
    rows = []
    for i in range(30):
        center = [1.0, 0.0, 0.0, 0.0] if i % 2 == 0 else [0.0, 0.0, 1.0, 0.0]
        rows.append((i, [c + rng.uniform(-0.05, 0.05) for c in center]))
    df = spark.createDataFrame(rows, ["vec_id", "embedding"]).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    cents = SIM.kmeans_fit(df, k=2, max_iter=4).collect()
    assert len(cents) == 2
    tops = sorted(
        max(range(4), key=lambda d: abs(c.centroid[d])) for c in cents
    )
    assert tops == [0, 2]  # one centroid per planted direction
    assigned = SIM.assign_nearest_centroid(df, SIM.kmeans_fit(df, k=2, max_iter=4))
    by_label = {}
    for r in assigned.collect():
        by_label.setdefault(r.label, set()).add(r.vec_id % 2)
    assert all(len(v) == 1 for v in by_label.values())  # no cluster mixing


def test_ivf_prebuilt_index_matches_inline_fit(spark):
    """build_ivf_index fitted once and passed via index= yields exactly the
    inline-fit result (kmeans init is deterministic), so a query service can
    reuse one quantizer instead of refitting per question."""
    import random

    from pyspark.sql import functions as F

    rng = random.Random(7)
    rows = [(i, [rng.uniform(-1, 1) for _ in range(6)]) for i in range(80)]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"]).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    q = df.filter("vec_id < 3")
    idx = SIM.build_ivf_index(df, n_centroids=4, max_iter=3)
    with_idx = {
        (r.query_id, r.neighbor_id, r.rank)
        for r in SIM.ivf_topk(df, q, k=4, index=idx).collect()
    }
    inline = {
        (r.query_id, r.neighbor_id, r.rank)
        for r in SIM.ivf_topk(df, q, k=4, n_centroids=4, max_iter=3).collect()
    }
    assert with_idx == inline and with_idx


def test_ivf_topk_recall_vs_brute(spark):
    """IVF with a healthy probe count recovers most of the exact top-k."""
    import random

    from pyspark.sql import functions as F

    rng = random.Random(11)
    rows = [
        (i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(200)
    ]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"]).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    q = df.filter("vec_id < 5")
    exact = {
        (r.query_id, r.neighbor_id)
        for r in SIM.brute_force_topk(df, q, k=5).collect()
    }
    approx = {
        (r.query_id, r.neighbor_id)
        for r in SIM.ivf_topk(df, q, k=5, n_centroids=8, n_probe=4, max_iter=3).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.6, f"recall {recall:.3f}"
    # rank lists are well-formed: 5 per query, ranks 1..5
    per_q = {}
    for r in SIM.ivf_topk(df, q, k=5, n_centroids=8, n_probe=4, max_iter=3).collect():
        per_q.setdefault(r.query_id, []).append(r.rank)
    assert all(sorted(v) == [1, 2, 3, 4, 5] for v in per_q.values())


def test_ivf_index_save_load_roundtrip(spark, tmp_path):
    """A persisted IVF index (submit_job --build-ann-index) must answer
    identically to the in-memory index it was saved from — the
    index-once-query-many path cannot drift from the fit."""
    from pyspark.sql import functions as F

    from mmgraphrag_spark.operators.similarity import (
        build_ivf_index,
        ivf_topk,
        load_ivf_index,
        save_ivf_index,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").withColumn(
        "embedding", F.col("embedding").cast("array<double>")
    )
    q = emb.filter(F.col("vec_id") < 3)
    idx = build_ivf_index(emb, n_centroids=4, max_iter=2)
    save_ivf_index(idx, str(tmp_path / "ann_index"))
    loaded = load_ivf_index(spark, str(tmp_path / "ann_index"))

    def rows(index):
        return sorted(
            (r.query_id, r.neighbor_id, r.rank)
            for r in ivf_topk(emb, q, k=5, index=index).collect()
        )

    got = rows(loaded)
    assert got == rows(idx)
    assert len(got) > 0
