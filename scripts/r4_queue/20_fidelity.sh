#!/bin/bash
# BUDGET_S=2400
# Stage 2: fidelity-vs-QPS sweep with the df-adaptive lex_deep +
# approx_max_k knobs (VERDICT r3 item 2) — find a config with
# fidelity>=0.95 at >=20k QPS and promote it to the bench headline.
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
timeout 5400 python -u scripts/tune_fidelity.py
echo "rc=$?"
