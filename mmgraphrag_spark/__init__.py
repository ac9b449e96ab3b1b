"""mmgraphrag_spark — a from-scratch PySpark-native multi-modal KG construction engine.

Re-expresses the capabilities of the MMGraphRAG reference (analyzed in SURVEY.md)
Spark-first: DataFrame/SQL logical plans, Catalyst optimization, Arrow-batched pandas
UDFs for the non-relational slow path, explicit partitioning/skew handling, and
snapshot-checkpointed stages.

Layout:
    session      SparkSession builders tuned for local testing and cluster submit
    schema       fixed StructTypes for every table in the pipeline
    datagen      deterministic interleaved-document generator + pure-Python oracle
    functions/   column-expression library (clean_str, ids, record grammar, vectors)
    sources/     readers/writers (documents table, GraphML compat sink)
    operators/   pipeline stages (spans, extract, merge, scene, fusion, dedup, ...)
    plans/       checkpoint/resume + lineage metadata layer
    streaming/   foreachBatch incremental wrapper
    pipeline     end-to-end KG construction driver
    query        local graph-RAG query path
"""

__version__ = "0.1.0"

GRAPH_FIELD_SEP = "<SEP>"  # reference: mmgraphrag/prompt.py:1
RECORD_SEP = "##"          # reference: mmgraphrag/prompt.py:190-192
FIELD_SEP = "<|>"
COMPLETE_TAG = "<|COMPLETE|>"
DEFAULT_ENTITY_TYPES = ["ORGANIZATION", "PERSON", "GEO", "EVENT"]  # prompt.py:189
