#!/bin/bash
# BUDGET_S=900
# Stage 0: insurance recording. The moment a healthy claim appears, get
# ONE nonzero driver-metric line on file (bench.py at the current
# operating point) before the long stages start — round 3 ended with
# value 0.0 because the claim wedged before any end-to-end run.
# Later stages (20_fidelity) promote a better config; the driver re-runs
# bench.py at round end anyway. This one is cheap: compile cache is
# warm from r2/r3 (.jax_cache) and the corpus build is host-side.
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
export MALLOC_MMAP_THRESHOLD_=1073741824 MALLOC_TRIM_THRESHOLD_=1073741824
timeout 2700 python -u bench.py | tee /tmp/bench_headline_r4.json
echo "rc=$?"
