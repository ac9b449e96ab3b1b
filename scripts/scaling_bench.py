"""Scaling-efficiency evidence for the north rule (N -> 4N executors).

This sandbox has no multi-executor cluster, so (per the round instructions) we
run the SAME KG-construction job at two parallelism levels — local[8] and
local[32] — on the SAME input, and report throughput at both plus the scaling
efficiency  eff = throughput(4N) / (4 * throughput(N)).

Each level runs in its own subprocess (fresh JVM) so nothing is shared.
Results are appended to BENCH.md.

Usage: python scripts/scaling_bench.py [sf_dir] [replicas]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

RUNNER = """
import json, os, sys
sys.path.insert(0, "/root/repo")
from mmgraphrag_spark.session import build_session
from bench import run_kg_pipeline
cpus = int(os.environ["SPARK_GRAFT_CPUS"])
spark = build_session("scaling", cpus=cpus, shuffle_partitions=3 * cpus)
# warmup: spawn+import python workers, JIT the codegen paths — cold-start
# penalizes wider configs (N workers x imports) and is not what the scaling
# criterion measures
run_kg_pipeline(spark, os.environ["SPARK_GRAFT_SF_DIR"], 2)
r = run_kg_pipeline(spark, os.environ["SPARK_GRAFT_SF_DIR"], int(os.environ["SPARK_GRAFT_REPLICAS"]))
print("RESULT " + json.dumps(r))
spark.stop()
"""


def run_at(cpus: int, sf_dir: str, replicas: int) -> dict:
    env = dict(
        os.environ,
        SPARK_GRAFT_CPUS=str(cpus),
        SPARK_GRAFT_SF_DIR=sf_dir,
        SPARK_GRAFT_REPLICAS=str(replicas),
    )
    out = subprocess.run(
        [sys.executable, "-c", RUNNER], env=env, capture_output=True, text=True,
        timeout=1800,
    )
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(f"no RESULT line; stderr tail: {out.stderr[-2000:]}")


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    replicas = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    n = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    levels = {}
    for cpus in (n, 4 * n):
        r = run_at(cpus, sf_dir, replicas)
        r["docs_per_sec"] = round(r["n_docs"] / r["seconds"], 2)
        r["triples_per_sec"] = round(r["n_triples"] / r["seconds"], 2)
        levels[cpus] = r
        print(f"local[{cpus}]: {r['seconds']:.1f}s, {r['n_docs']} docs, "
              f"{r['docs_per_sec']} docs/s, {r['triples_per_sec']} triples/s")
    lo, hi = n, 4 * n
    eff = levels[hi]["docs_per_sec"] / (4 * levels[lo]["docs_per_sec"])
    print(f"scaling efficiency ({lo} -> {hi} cores): {eff:.3f}")

    section = f"""
## Scaling run — {sf_dir}, replicas={replicas}, N={lo} vs 4N={hi}

Same input, same job, two parallelism levels (fresh JVM each, warmed), sandbox
stand-in for N vs 4N executors:

| level | wall (s) | docs | docs/s | triples/s |
|---|---|---|---|---|
| local[{lo}]  | {levels[lo]['seconds']:.1f} | {levels[lo]['n_docs']} | {levels[lo]['docs_per_sec']} | {levels[lo]['triples_per_sec']} |
| local[{hi}] | {levels[hi]['seconds']:.1f} | {levels[hi]['n_docs']} | {levels[hi]['docs_per_sec']} | {levels[hi]['triples_per_sec']} |

**Scaling efficiency (throughput_{hi} / (4 x throughput_{lo})) = {eff:.3f}**
(north-rule target: >= 0.8)
"""
    with open("/root/repo/BENCH.md", "a") as f:
        f.write(section)
    print("appended to BENCH.md")


if __name__ == "__main__":
    main()
