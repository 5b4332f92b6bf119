#!/bin/bash
# BUDGET_S=3600
# Stage 1: the 10M north-star triple with the r3 tier stack
# (VERDICT r3 item 1).  Uses the l16384 IVF cache built on CPU in r3.
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
if [ -f .bench10m_cache/ivf_n10002432_d768_v131072_s48_l16384.npz ]; then
  export BENCH_NLIST=16384
else
  export BENCH_NLIST=8192
fi
echo "bench_10m --full (nlist=$BENCH_NLIST) $(date +%H:%M:%S)"
timeout 7200 python -u scripts/bench_10m.py --full 16 32 48 64 96 128
echo "rc=$?"
