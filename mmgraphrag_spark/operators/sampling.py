"""Deterministic, seed-stable sampling and split assignment for training-data
pipelines.

Why not df.sample(): Spark's sample() is partition-layout-dependent (the same
row can land in or out depending on how the input was split), which makes
train/val membership irreproducible across re-reads, repartitions, or engine
versions. A 100 TB corpus needs CONTENT-keyed membership: hash the row id with
a seed and compare against fixed thresholds, so every engine (Spark, DuckDB,
a Python oracle) assigns the identical split forever.

The hash bucket is the first two hex digits of md5("<seed>:<id>") — 256
uniform buckets compared LEXICOGRAPHICALLY against fixed-width hex literals,
which sidesteps every hex->int conversion discrepancy between engines. All
pure JVM expressions: WholeStageCodegen, zero shuffles, zero UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def hash_bucket(id_col: Column, seed: str) -> Column:
    """2-hex-digit (256-way) deterministic bucket of a row id under a seed."""
    return F.substring(F.md5(F.concat(F.lit(f"{seed}:"), id_col.cast("string"))), 1, 2)


def _hex2(n: int) -> str:
    if not 0 <= n <= 256:
        raise ValueError(f"threshold {n} outside [0, 256]")
    return format(n, "02x") if n < 256 else "zz"  # 'zz' > any hex pair


def assign_split(
    df: DataFrame,
    id_col: str,
    seed: str = "split",
    train: int = 205,
    val: int = 230,
) -> DataFrame:
    """(id, bucket, split): deterministic train/val/test assignment.

    `train` and `val` are CUMULATIVE bucket thresholds out of 256: bucket <
    train -> 'train', < val -> 'val', else 'test' (defaults ~80/10/10).
    Membership depends only on (seed, id) — stable under repartitioning,
    re-reads, and engine changes, unlike df.sample()/randomSplit()."""
    if not train <= val <= 256:
        raise ValueError(f"need train <= val <= 256, got {train}, {val}")
    b = hash_bucket(F.col(id_col), seed)
    return df.select(
        F.col(id_col).alias("id"),
        b.alias("bucket"),
        F.when(b < F.lit(_hex2(train)), F.lit("train"))
        .when(b < F.lit(_hex2(val)), F.lit("val"))
        .otherwise(F.lit("test"))
        .alias("split"),
    )


def deterministic_sample(
    df: DataFrame, id_col: str, rate_per_256: int, seed: str = "sample"
) -> DataFrame:
    """Keep rows whose (seed, id) bucket falls below rate_per_256 (e.g. 26 ->
    ~10.2%). A filter, not a projection: all original columns survive, and the
    predicate is a pure scan-side expression (pushes past joins/projections
    like any other filter)."""
    return df.filter(hash_bucket(F.col(id_col), seed) < F.lit(_hex2(rate_per_256)))


def stratified_sample(
    df: DataFrame,
    id_col: str,
    stratum_col: str,
    rates_per_256: dict[str, int],
    default_rate_per_256: int = 0,
    seed: str = "stratified",
) -> DataFrame:
    """Per-stratum deterministic sampling: each stratum value gets its own
    keep-rate (in /256 units), e.g. downsample 'en' to 5% while keeping 100%
    of low-resource languages. Strata missing from `rates_per_256` use
    `default_rate_per_256`. The rate table folds into a CASE expression —
    no join, no shuffle, scan-side evaluable at any scale."""
    b = hash_bucket(F.col(id_col), seed)
    thr: Column = F.lit(_hex2(default_rate_per_256))
    for value, rate in sorted(rates_per_256.items()):
        thr = F.when(F.col(stratum_col) == value, F.lit(_hex2(rate))).otherwise(thr)
    return df.filter(b < thr)
