#!/bin/bash
# BUDGET_S=1500
# Stage 0.8: lexical-layout A/B on TPU — doc-sharded CSR (16) vs flat,
# at both 10M budget configs, on device-generated postings with the real
# run-length distribution (no 2.3 GB transfer; sort timing is
# data-independent).  Writes AB_LEX_SHARDS.json with
# recommended_csr_shards; stage 10 reads it.
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
echo "lex A/B start $(date +%H:%M:%S)"
timeout 1400 python -u scripts/ab_lex_shards.py
echo "rc=$?"
