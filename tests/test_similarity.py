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
