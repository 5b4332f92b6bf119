#!/bin/bash
# Stage 3: semantic scaling run (VERDICT r3 item 3) — 6L encoder,
# full-corpus harvest, 6000 encoder steps + 5000 CE steps, CE trained
# on the serving distribution (top-20 hard-negative groups, one pair
# length = position-table length).  Done when pure-CE rerank_recall@10
# beats retriever_recall@10 in SEMANTIC_EVAL.json.
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
export SEM_CORPUS=all SEM_LAYERS=6 SEM_RERANK=1 SEM_RERANK_STEPS=5000
export SEM_CE_LR=7e-5
timeout 14400 python -u scripts/semantic_eval.py 6000 \
  /root/repo/checkpoints/encoder_semantic
echo "rc=$?"
