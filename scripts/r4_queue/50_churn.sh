#!/bin/bash
# BUDGET_S=1800
# Stage 5: 1M churn on real HBM (VERDICT r3 item 6) — sustained
# insert/delete/compact while serving; no recompile storms, stable QPS.
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
timeout 5400 python -u scripts/bench_churn.py
echo "rc=$?"
