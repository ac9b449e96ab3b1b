"""Bucketed-table layout for co-located joins (SURVEY.md §4 scale notes).

At 100 TB the dominant cost of the KG pipeline's equi-joins (chunks x
mentions on chunk_id, documents x anything on doc_id) is the shuffle. Spark's
native bucketing removes it: two tables bucketed AND sorted by the join key
into the same bucket count join as a SortMergeJoin with ZERO Exchange — each
task reads matching bucket files from both sides. This is the batch analogue
of the Iceberg bucket-partition layout the production deployment would use.

``write_bucketed`` persists a DataFrame that way; the plan property (no
Exchange under the join) is pinned by tests/test_plans.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int = 64,
    path: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a bucketed+sorted table on ``bucket_col``.

    ``path`` set -> external table (data at path, metadata in the session
    catalog); joins between tables bucketed with the SAME column type and
    bucket count skip the shuffle entirely. Bucket count is a layout contract:
    pick it once per key domain (e.g. 4096 for doc_id at 100 TB) and reuse it
    across every table sharing that key."""
    w = df.write.format("parquet").mode(mode).bucketBy(n_buckets, bucket_col).sortBy(
        bucket_col
    )
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(table)
