#!/bin/bash
# Final stage: commit whatever measurement records the TPU stages wrote
# (BENCH_10M.json, BENCH_CONFIG.json, SEMANTIC_EVAL.json, BENCH_P50_1M.json,
# BENCH_CHURN_1M.json, checkpoints) so a late wedge cannot lose them.
cd /root/repo
git add BENCH_10M.json BENCH_CONFIG.json SEMANTIC_EVAL.json \
  BENCH_P50_1M.json BENCH_CHURN_1M.json checkpoints 2>/dev/null
if ! git diff --cached --quiet; then
  git commit -m "Record round-4 TPU measurements (queue stages 10-50)"
  echo "committed measurement records"
else
  echo "nothing to commit"
fi
