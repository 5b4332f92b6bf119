#!/bin/bash
# BUDGET_S=800
# Stage 6 (time allowing): device-resident ingest throughput — docs/s
# through the full engine write path with the on-TPU encoder.
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
timeout 3600 python -u scripts/bench_ingest.py
echo "rc=$?"
