#!/bin/bash
# BUDGET_S=5400
# Stage: semantic scaling run (VERDICT r3 item 3) — 6L encoder,
# full-corpus harvest, encoder + CE steps, CE trained on the serving
# distribution (top-20 hard-negative groups, one pair length =
# position-table length).  Done when pure-CE rerank_recall@10 beats
# retriever_recall@10 in SEMANTIC_EVAL.json.
#
# Step counts scale to the time actually available (QUEUE_REMAINING is
# exported by run_r4_queue.sh): the full run is 6000 enc + 5000 CE in
# ~4 h; with less time left we run proportionally fewer steps rather
# than getting killed mid-eval with nothing recorded.
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
avail=${QUEUE_REMAINING:-14400}
avail=$((avail - 900))            # leave room for eval + checkpoint write
frac_num=$avail; frac_den=12600   # 12600 s ≈ measured full-run train time
enc=$((6000 * frac_num / frac_den)); [ "$enc" -gt 6000 ] && enc=6000
ce=$((5000 * frac_num / frac_den)); [ "$ce" -gt 5000 ] && ce=5000
[ "$enc" -lt 1200 ] && enc=1200
[ "$ce" -lt 1000 ] && ce=1000
echo "semantic stage: enc_steps=$enc ce_steps=$ce (QUEUE_REMAINING=${QUEUE_REMAINING:-unset})"
export SEM_CORPUS=all SEM_LAYERS=6 SEM_RERANK=1 SEM_RERANK_STEPS=$ce
export SEM_CE_LR=7e-5
timeout 14400 python -u scripts/semantic_eval.py "$enc" \
  /root/repo/checkpoints/encoder_semantic
echo "rc=$?"
