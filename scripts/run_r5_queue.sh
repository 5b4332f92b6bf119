#!/bin/bash
# Round-5 TPU measurement queue.  Differences from run_r4_queue.sh:
#   * waits for a PREP_PID (the 10M host prep) to exit before starting —
#     TPU timing runs are corrupted by concurrent host CPU load;
#   * explicit stage ORDER (VERDICT r5 priorities), not lexical;
#   * same deadline discipline: stop early enough that the driver's
#     round-end bench.py finds the claim free.
# Markers: /tmp/TPU_BUSY while a stage runs; logs /tmp/r5_<stage>.log.
export PYTHONPATH=/root/repo:/root/.axon_site
export MALLOC_MMAP_THRESHOLD_=1073741824 MALLOC_TRIM_THRESHOLD_=1073741824
cd /root/repo
rm -f /tmp/TPU_BUSY

DEADLINE=${QUEUE_DEADLINE:?set QUEUE_DEADLINE (epoch s)}
STAGES=(
  scripts/r4_queue/20_fidelity.sh        # promote BENCH_CONFIG.json
  scripts/r4_queue/05_bench_headline.sh  # confirm headline at tuned point
  scripts/r4_queue/10_bench10m.sh        # 10M north-star triple
  scripts/r4_queue/25_p50.sh             # per-query p50/p95 via batcher
  scripts/r4_queue/30_semantic.sh        # encoder+CE retrain (capped)
  scripts/r4_queue/50_churn.sh           # compact-while-serving at 1M
  scripts/r4_queue/60_ingest.sh          # device write-path docs/s
)

finish() {
  if [ ! -f scripts/r4_queue/90_commit_results.sh.r5done ]; then
    bash scripts/r4_queue/90_commit_results.sh > /tmp/r5_90_commit.log 2>&1
    touch scripts/r4_queue/90_commit_results.sh.r5done
  fi
  rm -f /tmp/TPU_BUSY
  echo "r5 queue finished $(date +%H:%M:%S)"
  exit 0
}

probe() {
  timeout 240 python -c "import jax; assert jax.devices()[0].platform != 'cpu'" 2>/dev/null
}

stage_budget() {
  local b
  b=$(grep -oE '^# BUDGET_S=[0-9]+' "$1" | head -1 | grep -oE '[0-9]+')
  echo "${b:-1200}"
}

if [ -n "$PREP_PID" ]; then
  echo "waiting for host prep pid $PREP_PID to exit..."
  while kill -0 "$PREP_PID" 2>/dev/null; do
    [ "$(date +%s)" -ge $((DEADLINE - 600)) ] && { echo "deadline while prep runs"; finish; }
    sleep 60
  done
  echo "prep exited at $(date +%H:%M:%S)"
fi

echo "r5 queue start $(date +%H:%M:%S) deadline=$(date -d @$DEADLINE +%H:%M:%S)"
for stage in "${STAGES[@]}"; do
  now=$(date +%s); rem=$((DEADLINE - now))
  [ "$rem" -le 90 ] && finish
  [ -f "${stage}.r5done" ] && continue
  b=$(stage_budget "$stage")
  if [ "$b" -gt "$rem" ]; then
    echo "skip $(basename "$stage") (budget $b > remaining $rem)"
    continue
  fi
  if ! probe; then
    echo "claim unavailable before $(basename "$stage"); waiting"
    while ! probe; do
      [ "$(date +%s)" -ge $((DEADLINE - 300)) ] && finish
      sleep 240
    done
  fi
  name=$(basename "$stage" .sh)
  echo "=== stage $name start $(date +%H:%M:%S) (rem ${rem}s) ==="
  touch /tmp/TPU_BUSY
  SEM_TIME_CAP_S=${SEM_TIME_CAP_S:-5400} QUEUE_REMAINING=$rem timeout $((rem - 120)) bash "$stage" > "/tmp/r5_${name}.log" 2>&1
  rc=$?
  rm -f /tmp/TPU_BUSY
  echo "=== stage $name rc=$rc end $(date +%H:%M:%S) ==="
  touch "${stage}.r5done"
done
finish
