"""Query a built knowledge graph (the output directory of submit_job.py).

    python scripts/query_job.py --kg /tmp/kg_out \
        --question "What relates ENTITY_1 to ENTITY_2?" \
        [--llm-base-url https://... --llm-model gpt-4o-mini] \
        [--log-dir /tmp/kg_querylog] [--top-k 10]

Runs the reference's local-query path (SURVEY.md §3.2): embed the question,
ANN over the entity VDB, degree-ranked context (text units + edges under
token budgets), then the answer backend — deterministic template offline,
LLMAnswerer (with the two-step multimodal merge) when an endpoint is given.
Prints the answer and writes the context log when --log-dir is set.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--kg", required=True, help="submit_job.py --output directory")
    p.add_argument("--question", required=True)
    p.add_argument("--top-k", type=int, default=10)
    p.add_argument("--threshold", type=float, default=0.2)
    p.add_argument("--ann-mode", default="exact", choices=["exact", "lsh", "ivf"],
                   help="entity-VDB ranking plan: exact distributed top-k "
                        "(default), or the LSH / IVF bucketed scans for VDBs "
                        "too large to scan per query")
    p.add_argument("--media", default=None,
                   help="(media_ref, content binary) parquet table; defaults "
                        "to <kg>/media when present. Ranked ORI_IMG seeds "
                        "carry base64 image bytes into the multimodal answer")
    p.add_argument("--log-dir", default=None)
    p.add_argument("--llm-base-url", default=None)
    p.add_argument("--llm-api-key", default=os.environ.get("OPENAI_API_KEY", ""))
    p.add_argument("--llm-model", default="gpt-4o-mini")
    args = p.parse_args()

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.appName("mmgraphrag_spark_query")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .getOrCreate()
    )

    from mmgraphrag_spark.query import local_query

    kg = {
        name: spark.read.parquet(os.path.join(args.kg, name))
        for name in ("entities", "edges", "chunks")
    }
    # media_spans (J2 chunk association) enables the J13 provenance rewrite
    # in text-unit scoring; tolerate ONLY absence (media-free or pre-J13
    # index outputs) — a corrupt/unreadable table must surface, matching the
    # explicit-path rule for --media below
    from pyspark.errors import AnalysisException

    try:
        kg["media_spans"] = spark.read.parquet(
            os.path.join(args.kg, "media_spans")
        )
    except AnalysisException:
        pass
    # an EXPLICIT --media is always read (it may be a remote path isdir can't
    # see — a read failure should surface, not silently drop the images);
    # only the implicit <kg>/media default probes and tolerates absence
    if args.media:
        media = spark.read.parquet(args.media)
    else:
        try:
            media = spark.read.parquet(os.path.join(args.kg, "media"))
        except Exception:
            media = None
    answerer = None
    if args.llm_base_url:
        from mmgraphrag_spark.backends.llm import ChatClient, LLMAnswerer

        answerer = LLMAnswerer(
            ChatClient(args.llm_base_url, api_key=args.llm_api_key, model=args.llm_model)
        )
    # ivf: fit the quantizer + inverted file ONCE up front (reusable across
    # questions in a service loop) instead of per local_query call
    ann_index = None
    vdb = None
    if args.ann_mode == "ivf":
        from mmgraphrag_spark.backends.embeddings import HashEmbedBackend
        from mmgraphrag_spark.operators.similarity import build_ivf_index
        from mmgraphrag_spark.query import build_entity_vdb

        vdb = build_entity_vdb(kg["entities"], backend=HashEmbedBackend()).localCheckpoint()
        corpus = vdb.select(
            vdb.entity_name.alias("vec_id"), vdb.vec.alias("embedding")
        )
        ann_index = build_ivf_index(corpus)
    out = local_query(
        spark,
        kg,
        args.question,
        top_k=args.top_k,
        threshold=args.threshold,
        answerer=answerer,
        vdb=vdb,
        log_dir=args.log_dir,
        ann_mode=args.ann_mode,
        ann_index=ann_index,
        media=media,
    )
    print("ANSWER:")
    print(out["answer"])
    spark.stop()


if __name__ == "__main__":
    main()
