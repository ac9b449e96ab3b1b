#!/usr/bin/env bash
# One-command verification: unit/property/e2e suite, driver-contract oracle
# parity at two scales, and a bench smoke. Mirrors what the round driver
# checks (CORRECTNESS_r{N} + BENCH_r{N}) plus the full pytest gate.
#
# Usage: bash scripts/ci.sh [--quick]
#   --quick: skip the sf0.1 oracle pass and the bench smoke (~7 min total
#            instead of ~20).
set -euo pipefail
cd "$(dirname "$0")/.."

echo "== pytest =="
python -m pytest tests/ -x -q

echo "== oracle parity @ sf0.01 =="
python scripts/check_oracles.py /root/testdata/sf0.01

echo "== CLI smoke: index (graphml + ann index) then batch query =="
rm -rf /tmp/ci_kg /tmp/ci_kg_ckpt
python scripts/submit_job.py --input /root/testdata/sf0.001/documents.parquet \
  --derive-interleaved --output /tmp/ci_kg --checkpoint /tmp/ci_kg_ckpt \
  --graphml --build-ann-index >/dev/null
test -s /tmp/ci_kg/graph_entity_relation.graphml
test -d /tmp/ci_kg/ann_index/centroids
printf 'What is ENTITY_1 related to?\n' > /tmp/ci_questions.txt
python scripts/query_job.py --kg /tmp/ci_kg --questions-file /tmp/ci_questions.txt \
  --ann-mode ivf > /tmp/ci_answer.txt
grep -q "ANSWER:" /tmp/ci_answer.txt

if [[ "${1:-}" != "--quick" ]]; then
  echo "== oracle parity @ sf0.1 =="
  python scripts/check_oracles.py /root/testdata/sf0.1

  echo "== bench smoke @ sf0.1 =="
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 python bench.py
fi

echo "CI OK"
