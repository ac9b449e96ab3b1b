"""Stage checkpointing + resume (SURVEY.md §4 "idempotent stage skip"; the north
rule's "every stage checkpoints ... so a killed run resumes from the last
committed snapshot").

Two implementations behind one seam:

- ``LocalCheckpointer`` — ``df.localCheckpoint(eager)``: materializes stage
  output on the block manager and TRUNCATES THE LOGICAL PLAN. Used by tests and
  bench. The plan cut is load-bearing for performance even single-run: without
  it, Catalyst re-analyzes an exponentially growing tree at every downstream
  action (each self-join doubles the subtree; measured 170s -> 15s at sf0.01).

- ``ParquetCheckpointer`` — the durable stand-in for Iceberg snapshot commits
  (this sandbox ships no Iceberg runtime; the write/commit-marker/read-back
  protocol below is exactly an Iceberg ``MERGE``/snapshot in production).
  Each stage writes parquet + a ``_COMMIT.json`` marker carrying row counters
  and per-partition lineage (rows per shuffle partition); a rerun with the same
  root SKIPS recomputation of committed stages and reads them back — the
  resume-equals-fresh-run property is asserted in tests/test_checkpoint.py.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class LocalCheckpointer:
    """In-memory stage materialization with plan truncation."""

    def __init__(self):
        self.stages: dict[str, dict] = {}

    def stage(self, name: str, df: DataFrame) -> DataFrame:
        t0 = time.monotonic()
        out = df.localCheckpoint()
        self.stages[name] = {"seconds": round(time.monotonic() - t0, 3)}
        return out


class ParquetCheckpointer:
    """Durable per-stage snapshots with commit markers and lineage counters."""

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        os.makedirs(root, exist_ok=True)

    def _dir(self, name: str) -> str:
        return os.path.join(self.root, name)

    def _marker(self, name: str) -> str:
        return os.path.join(self._dir(name), "_COMMIT.json")

    def committed(self, name: str) -> bool:
        return os.path.exists(self._marker(name))

    def load(self, name: str) -> DataFrame:
        return self.spark.read.parquet(os.path.join(self._dir(name), "data"))

    def stage(self, name: str, df: DataFrame) -> DataFrame:
        """Commit ``df`` as stage ``name`` unless already committed; return the
        (re)loaded snapshot. The marker is written only after the parquet write
        fully succeeds — a killed run leaves no marker, so the stage reruns."""
        if self.committed(name):
            return self.load(name)
        path = os.path.join(self._dir(name), "data")
        t0 = time.monotonic()
        df.write.mode("overwrite").parquet(path)
        out = self.spark.read.parquet(path)
        # per-partition lineage: rows per file-partition of the committed snapshot
        part_rows = [
            (r["p"], r["n"])
            for r in out.groupBy(F.spark_partition_id().alias("p"))
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        ]
        marker = {
            "stage": name,
            "rows": sum(n for _, n in part_rows),
            "partitions": sorted(part_rows),
            "wall_seconds": round(time.monotonic() - t0, 3),
            "committed_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        }
        tmp = self._marker(name) + ".tmp"
        with open(tmp, "w") as f:
            json.dump(marker, f)
        os.replace(tmp, self._marker(name))
        return out

    def manifest(self) -> list[dict]:
        out = []
        for name in sorted(os.listdir(self.root)):
            m = self._marker(name)
            if os.path.exists(m):
                with open(m) as f:
                    out.append(json.load(f))
        return out
