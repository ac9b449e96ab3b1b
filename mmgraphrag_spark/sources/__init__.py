"""Sources/sinks: interleaved documents builders, parquet stage IO, GraphML export."""
