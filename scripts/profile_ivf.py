"""Phase-level timing for the ivf_topk driver query (VERDICT r4 What's-wrong
#2): fit loop (3 Lloyd driver rounds) vs corpus assignment vs probe join,
repeated in one session so JIT/session fixed costs are visible separately.

Usage: python scripts/profile_ivf.py [sf_dir] [cpus] [repeats]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 3

    from pyspark.sql import functions as F

    from mmgraphrag_spark.operators.similarity import (
        assign_nearest_centroid,
        ivf_topk,
        kmeans_fit,
    )
    from mmgraphrag_spark.session import build_session

    spark = build_session("profile-ivf", cpus=cpus, shuffle_partitions=cpus)
    import __spark_entry__ as entry

    emb = entry._emb(spark, sf_dir).localCheckpoint()
    emb.count()

    for i in range(reps):
        t = {}
        t0 = time.monotonic()
        cents = kmeans_fit(emb, k=8, max_iter=3)
        t["fit"] = round(time.monotonic() - t0, 3)

        t0 = time.monotonic()
        inv = assign_nearest_centroid(emb, cents).select(
            F.col("vec_id").alias("neighbor_id"),
            F.col("embedding").alias("_cv"),
            "label",
        ).localCheckpoint()
        inv.count()
        t["assign"] = round(time.monotonic() - t0, 3)

        q = emb.filter(F.col("vec_id") < 5)
        t0 = time.monotonic()
        ivf_topk(None, q, k=10, n_probe=3, index=(cents, inv)).count()
        t["probe"] = round(time.monotonic() - t0, 3)

        # the full query exactly as the bench runs it (refit inside)
        t0 = time.monotonic()
        entry.queries()["ivf_topk"](spark, sf_dir).count()
        t["full_query"] = round(time.monotonic() - t0, 3)
        print(json.dumps({"rep": i, **t}), flush=True)

    spark.stop()


if __name__ == "__main__":
    main()
