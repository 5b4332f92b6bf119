#!/bin/bash
# BUDGET_S=0
# Final stage: commit whatever measurement records the TPU stages wrote
# so a late wedge cannot lose them.  Files are added ONE AT A TIME:
# `git add a missing-b c` aborts on the first unmatched pathspec and
# stages nothing (all-or-nothing), which would silently drop the
# records that WERE produced.
cd /root/repo
for f in BENCH_10M.json BENCH_10M_GATES.json BENCH_10M_QUALITY.json \
         BENCH_10M_RECALL_CPU.json DIAG_10M_FIDELITY.json \
         AB_LEX_SHARDS.json \
         BENCH_CONFIG.json SEMANTIC_EVAL.json SEMANTIC_EVAL_R5.json \
         TUNE_FIDELITY_PARTIAL_tpu.json \
         BENCH_P50_1M.json BENCH_CHURN_1M.json BENCH_INGEST.json; do
  [ -e "$f" ] && git add "$f"
done
[ -d checkpoints ] && git add checkpoints
if ! git diff --cached --quiet; then
  git commit -m "Record TPU measurement artifacts (queue stages)"
  echo "committed measurement records"
else
  echo "nothing to commit"
fi
