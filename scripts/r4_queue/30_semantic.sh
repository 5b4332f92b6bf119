#!/bin/bash
# BUDGET_S=2700
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
# SEM_TIME_CAP_S: upper bound on the training window so stages queued
# AFTER this one (churn/ingest in the r5 order) still get their budget
cap=${SEM_TIME_CAP_S:-0}
if [ "$cap" -gt 0 ] && [ "$avail" -gt "$cap" ]; then avail=$cap; fi
frac_num=$avail; frac_den=12600   # 12600 s ≈ measured full-run train time
enc=$((6000 * frac_num / frac_den)); [ "$enc" -gt 6000 ] && enc=6000
ce=$((5000 * frac_num / frac_den)); [ "$ce" -gt 5000 ] && ce=5000
[ "$enc" -lt 1200 ] && enc=1200
[ "$ce" -lt 1000 ] && ce=1000
echo "semantic stage: enc_steps=$enc ce_steps=$ce (QUEUE_REMAINING=${QUEUE_REMAINING:-unset})"
export SEM_CORPUS=all SEM_LAYERS=6 SEM_RERANK=1 SEM_RERANK_STEPS=$ce
export SEM_CE_LR=7e-5
# false-negative denoising for the CE's mined groups (RocketQA recipe;
# train/rerank.py mine_hard_negatives band/skip)
export SEM_NEG_BAND=40 SEM_NEG_SKIP=2
# train into a SEPARATE checkpoint and only promote on improvement — a
# time-capped run must never clobber a better prior record
export SEM_PUBLISH=0
timeout 14400 python -u scripts/semantic_eval.py "$enc" \
  /root/repo/checkpoints/encoder_semantic_r5
echo "rc=$?"
python - <<'PY'
import json, shutil, glob, os
root = "/root/repo"
try:
    with open(f"{root}/checkpoints/encoder_semantic_r5.eval.json") as f:
        new = json.load(f)
except OSError:
    raise SystemExit(0)
try:
    with open(f"{root}/SEMANTIC_EVAL.json") as f:
        old = json.load(f)
except OSError:
    old = {}
new_tr = new.get("semantic_recall_at_10_trained") or 0
old_tr = old.get("semantic_recall_at_10_trained") or 0
new_margin = ((new.get("rerank_recall_at_10") or 0)
              - (new.get("retriever_recall_at_10") or 1))
old_margin = ((old.get("rerank_recall_at_10") or 0)
              - (old.get("retriever_recall_at_10") or 1))
promote = (new_tr >= old_tr) or (
    new_margin > old_margin and new_tr >= old_tr - 0.03)
with open(f"{root}/SEMANTIC_EVAL_R5.json", "w") as f:
    json.dump(new, f, indent=1)  # always record the attempt
if promote:
    with open(f"{root}/SEMANTIC_EVAL.json", "w") as f:
        json.dump(new, f, indent=1)
    for p in glob.glob(f"{root}/checkpoints/encoder_semantic_r5*"):
        dst = p.replace("encoder_semantic_r5", "encoder_semantic")
        shutil.copy(p, dst)
print("promoted" if promote else "kept prior record",
      {"new_trained": new_tr, "old_trained": old_tr,
       "new_margin": new_margin, "old_margin": old_margin})
PY
