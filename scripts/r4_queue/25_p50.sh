#!/bin/bash
# BUDGET_S=1500
# Stage 4: true per-query p50/p95 through the serving micro-batcher at
# 1M on TPU (VERDICT r3 item 4) — the last unmeasured north-star gate.
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
timeout 5400 python -u scripts/bench_p50.py
echo "rc=$?"
