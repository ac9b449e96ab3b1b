"""Plans layer: stage checkpointing, lineage metadata, resume."""

from mmgraphrag_spark.plans.checkpoint import (  # noqa: F401
    LocalCheckpointer,
    ParquetCheckpointer,
    fs_delete,
    fs_exists,
)
