"""Structured Streaming surface: incremental KG indexing via foreachBatch."""

from mmgraphrag_spark.streaming.incremental import (  # noqa: F401
    IncrementalIndexer,
    incremental_index_stream,
)
