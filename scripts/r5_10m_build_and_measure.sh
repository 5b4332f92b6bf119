#!/bin/bash
# 10M north-star triple, r5 reworked stack (VERDICT r4 item 3).
#
# The capacity-128 Mosaic fix invalidated the cached l16384 IVF and a
# CPU rebuild is weeks (CLAUDE.md round-5 addendum), so this run builds
# the IVF ON TPU inside the measuring process: pass-2 assignment streams
# ~31 GB of regenerated f32 chunks through the relay — acceptable when
# nothing is racing a deadline, and `cached()` persists the result so a
# died-after-build retry skips straight to measurement.
#
# RUN RULES (CLAUDE.md): designated TPU process — nothing else may hold
# the claim; no heavy host CPU work while it measures; do NOT kill it
# mid-transfer (build uploads and the ~13 GB device placement are the
# r3 wedge windows) — if it must die, SIGTERM between log lines that
# show host-side phases.
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
export MALLOC_MMAP_THRESHOLD_=1073741824 MALLOC_TRIM_THRESHOLD_=1073741824
export BENCH_NLIST=16384
export BENCH_CSR_SHARDS=1

echo "pass 1: gates config (pq768 + deep2x8192) $(date +%H:%M:%S)"
BENCH_PQ=768 BENCH_DEEP_TERMS=2 BENCH_DEEP_POSTINGS=8192 \
  timeout ${TENM_TIMEOUT:-10800} python -u scripts/bench_10m.py --full 16 32 48
rc=$?
echo "rc=$rc"
[ -f BENCH_10M.json ] && cp BENCH_10M.json BENCH_10M_GATES.json
if [ "$rc" -ne 0 ] && [ "$rc" -ne 124 ]; then
  # HBM-pressure fallback: halve the batch (residents ~14.6/16 GB)
  echo "retry at BENCH_BATCH=256 $(date +%H:%M:%S)"
  BENCH_PQ=768 BENCH_DEEP_TERMS=2 BENCH_DEEP_POSTINGS=8192 BENCH_BATCH=256 \
    timeout 3600 python -u scripts/bench_10m.py --full 16 32 48
  echo "rc=$?"
  [ -f BENCH_10M.json ] && cp BENCH_10M.json BENCH_10M_GATES.json
fi
