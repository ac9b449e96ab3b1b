"""Chained curation-pipeline benchmark: dedup -> decontaminate -> PII scrub
-> sequence packing over a replica-scaled corpus, as ONE job — the
composition proof for the per-operator "one scan" claims (VERDICT r4 next-
round #6).

Two variants, interleaved A/B within the same process so window drift hits
both:

- fused:  no intermediate materialization. The dedup stage's output is
          consumed TWICE downstream (the decontamination flag join and the
          anti-join's left side), so its whole sub-plan re-executes once per
          consumer — the cost of staying lazy.
- staged: checkpoint after dedup and after the PII scrub (localCheckpoint,
          or parquet with SPARK_GRAFT_CKPT=parquet), so every stage executes
          exactly once and the packer reads materialized clean text.

Usage:
    python scripts/curation_bench.py [sf_dir] [replicas] [cpus]
    # defaults: /root/testdata/sf0.1  3600 (~18M docs)  4

Prints one JSON line per leg plus a summary; paste the table into BENCH.md.
An md5 capacity probe brackets each leg (CLAUDE.md rule 6: judge windows by
absolute probe throughput, never assume a quiet box).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def probe_mrows(spark) -> float:
    from pyspark.sql import functions as F

    rows = 20_000_000
    cpus = spark.sparkContext.defaultParallelism
    job = lambda: (
        spark.range(0, rows, 1, numPartitions=cpus * 3)
        .select(F.md5(F.col("id").cast("string")).alias("h"))
        .agg(F.max("h"))
        .collect()
    )
    job()
    t0 = time.monotonic()
    job()
    return round(rows / (time.monotonic() - t0) / 1e6, 2)


def run_chain(spark, sf_dir: str, replicas: int, staged: bool) -> dict:
    from pyspark.sql import functions as F

    from bench import _scaled_documents
    from mmgraphrag_spark.operators.dedup import decontaminate, exact_dedup
    from mmgraphrag_spark.operators.sampling import pack_training_blocks
    from mmgraphrag_spark.operators.textstats import pii_scrub

    ckpt = None
    if staged and os.environ.get("SPARK_GRAFT_CKPT") == "parquet":
        import tempfile

        from mmgraphrag_spark.plans import ParquetCheckpointer

        ckpt = ParquetCheckpointer(spark, tempfile.mkdtemp(prefix="curate_"))

    def stage(df, name):
        if not staged:
            return df
        if ckpt is not None:
            return ckpt.stage(name, df)
        return df.localCheckpoint()

    docs = _scaled_documents(spark, sf_dir, replicas)
    n_docs = docs.count()

    # the tiny benchmark side comes from the UNREPLICATED source corpus
    # (every 97th doc) — materialized so the broadcast build doesn't rerun
    # the source scan (CLAUDE.md rule 8)
    bench_side = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .filter(F.col("doc_id") % 97 == 0)
        .select(F.col("doc_id").alias("bid"), "text")
        .localCheckpoint()
    )

    t0 = time.monotonic()
    # 1. exact dedup (window on md5(text); replicas carry distinct text, so
    #    this measures the shuffle+window cost at full volume)
    kept = stage(exact_dedup(docs, "doc_id", "text"), "dedup")
    # 2. decontamination: flag docs sharing >=3 distinct 5-grams with the
    #    benchmark, then anti-join them out (kept is consumed twice here —
    #    the materialization question this bench answers)
    flagged = decontaminate(
        kept, "doc_id", "text", bench_side, "bid", "text",
        shingle_len=5, min_overlap=3,
    ).select(F.col("id").alias("doc_id")).distinct()
    clean = kept.join(flagged, "doc_id", "left_anti")
    # 3. PII scrub (pure scan-side regexp stages)
    scrubbed = stage(
        pii_scrub(clean, "doc_id", "text").select("id", "clean_text"), "pii"
    )
    # 4. tokenize + pack into 2048-token blocks over 256 content-keyed streams
    toks = scrubbed.select(
        "id",
        F.size(F.split(F.trim(F.col("clean_text")), r"\s+")).alias("tokens"),
    )
    packed = pack_training_blocks(
        toks, "id", "tokens", block_tokens=2048, n_streams=256,
        n_parts=spark.sparkContext.defaultParallelism,
    )
    agg = packed.agg(
        F.count(F.lit(1)).alias("n"), F.sum("n_blocks").alias("blocks")
    ).first()
    dt = time.monotonic() - t0
    return {
        "variant": "staged" if staged else "fused",
        "seconds": round(dt, 1),
        "n_docs_in": n_docs,
        "n_docs_packed": agg["n"],
        "n_block_spans": int(agg["blocks"]),
        "docs_per_sec": round(n_docs / dt, 1),
    }


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    replicas = int(sys.argv[2]) if len(sys.argv) > 2 else 3600
    cpus = int(sys.argv[3]) if len(sys.argv) > 3 else 4

    from mmgraphrag_spark.session import build_session

    spark = build_session("curation-bench", cpus=cpus, shuffle_partitions=3 * cpus)

    # warm the python-worker/JIT paths once at tiny scale
    run_chain(spark, sf_dir, 1, staged=False)

    results = []
    for staged in (False, True, False, True):  # interleaved A/B/A/B
        pre = probe_mrows(spark)
        r = run_chain(spark, sf_dir, replicas, staged)
        r["probe_pre_mrows"] = pre
        results.append(r)
        print(json.dumps(r), flush=True)
    print(json.dumps({"cpus": cpus, "replicas": replicas, "legs": results}))
    spark.stop()


if __name__ == "__main__":
    main()
