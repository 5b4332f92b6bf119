#!/bin/bash
# Round-4 TPU job queue: probe for a healthy claim, then run every stage
# script in scripts/r4_queue/ in lexical order, serialized, one TPU
# process at a time (CLAUDE.md: only ONE process can hold the claim;
# timing runs corrupted by concurrent host CPU load).
#
# DEADLINE-AWARE (round endgame): the driver runs bench.py itself at
# round end — if a queue stage is still holding the TPU claim then, the
# driver's bench blocks on the claim and records 0.0 even though the
# claim is healthy.  So:
#   * every stage declares `# BUDGET_S=<seconds>` (min time it needs);
#   * a stage that no longer fits before QUEUE_DEADLINE is skipped
#     (marker ${s}.skip) and the next one is tried — time only shrinks,
#     so skips are permanent;
#   * running stages are wrapped in `timeout <remaining>`;
#   * at the deadline the queue runs the commit-results stage, touches
#     /tmp/r4_supervisor_stop, and exits, leaving the claim FREE for
#     the driver's final bench.py.
#
# Markers:
#   /tmp/TPU_BUSY        exists while a stage is running (do not start
#                        pytest / heavy host work while present)
#   /tmp/r4_queue.log    orchestrator log
#   /tmp/r4_<stage>.log  per-stage logs
export PYTHONPATH=/root/repo:/root/.axon_site
export MALLOC_MMAP_THRESHOLD_=1073741824 MALLOC_TRIM_THRESHOLD_=1073741824
cd /root/repo
mkdir -p scripts/r4_queue
rm -f /tmp/TPU_BUSY

# round started 04:42:39 UTC (PROGRESS.jsonl ts 1787028159); 12 h round
# ends 16:42:39.  Stop 42 min early so the driver's own bench.py finds
# the claim free.
DEADLINE=${QUEUE_DEADLINE:-1787068800}

finish() {
  # commit whatever measurement records exist, then stop for good
  if [ -f scripts/r4_queue/90_commit_results.sh ] && \
     [ ! -f scripts/r4_queue/90_commit_results.sh.done ]; then
    bash scripts/r4_queue/90_commit_results.sh > /tmp/r4_90_commit_results.log 2>&1
    touch scripts/r4_queue/90_commit_results.sh.done
  fi
  rm -f /tmp/TPU_BUSY
  touch /tmp/r4_supervisor_stop
  echo "r4 queue finished (deadline path) $(date +%H:%M:%S)"
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

echo "r4 queue start $(date +%H:%M:%S) deadline=$(date -d @$DEADLINE +%H:%M:%S)"
while true; do
  now=$(date +%s)
  [ "$now" -ge $((DEADLINE - 300)) ] && { echo "deadline before claim"; finish; }
  if probe; then
    echo "TPU claim healthy at $(date +%H:%M:%S)"
    break
  fi
  echo "probe: claim unavailable $(date +%H:%M:%S)"
  sleep 240
done

while true; do
  now=$(date +%s)
  rem=$((DEADLINE - now))
  [ "$rem" -le 90 ] && finish
  stage=""
  for s in scripts/r4_queue/*.sh; do
    [ -e "$s" ] || break
    [ -f "${s}.done" ] && continue
    [ -f "${s}.skip" ] && continue
    b=$(stage_budget "$s")
    if [ "$b" -gt "$rem" ]; then
      echo "skip $(basename "$s") (budget $b > remaining $rem)"
      touch "${s}.skip"
      continue
    fi
    stage="$s"
    break
  done
  if [ -z "$stage" ]; then
    echo "queue drained at $(date +%H:%M:%S); polling for new stages"
    sleep 120
    [ -f /tmp/r4_queue_stop ] && { echo "stop sentinel"; finish; }
    continue
  fi
  name=$(basename "$stage" .sh)
  echo "=== stage $name start $(date +%H:%M:%S) (rem ${rem}s) ==="
  touch /tmp/TPU_BUSY
  QUEUE_REMAINING=$rem timeout $((rem - 60)) bash "$stage" > "/tmp/r4_${name}.log" 2>&1
  rc=$?
  rm -f /tmp/TPU_BUSY
  echo "=== stage $name rc=$rc end $(date +%H:%M:%S) ==="
  touch "${stage}.done"
  # claim-health check between stages: if wedged, wait it out
  if ! probe; then
    echo "claim unhealthy after $name; waiting"
    while true; do
      [ "$(date +%s)" -ge $((DEADLINE - 300)) ] && finish
      sleep 240
      if probe; then echo "claim back"; break; fi
      echo "still wedged $(date +%H:%M:%S)"
    done
  fi
done
