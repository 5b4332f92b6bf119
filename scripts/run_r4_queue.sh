#!/bin/bash
# Round-4 TPU job queue: probe for a healthy claim, then run every stage
# script in scripts/r4_queue/ in lexical order, serialized, one TPU
# process at a time (CLAUDE.md: only ONE process can hold the claim;
# timing runs corrupted by concurrent host CPU load).
#
# Stages can be appended to scripts/r4_queue/ while this runs — the
# queue re-globs after each stage.  A stage that exits non-zero does
# NOT stop the queue (each stage is independent evidence).
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

probe() {
  timeout 240 python -c "import jax; assert jax.devices()[0].platform != 'cpu'" 2>/dev/null
}

echo "r4 queue start $(date +%H:%M:%S)"
for i in $(seq 1 120); do
  if probe; then
    echo "TPU claim healthy at $(date +%H:%M:%S) (probe $i)"
    break
  fi
  if [ "$i" = 120 ]; then echo "gave up waiting for claim"; exit 1; fi
  echo "probe $i: claim unavailable $(date +%H:%M:%S)"
  sleep 240
done

while true; do
  stage=""
  for s in scripts/r4_queue/*.sh; do
    [ -e "$s" ] || break
    if [ ! -f "${s}.done" ]; then stage="$s"; break; fi
  done
  if [ -z "$stage" ]; then
    echo "queue drained at $(date +%H:%M:%S); polling for new stages"
    sleep 120
    # exit only if a sentinel says the round is wrapping up
    [ -f /tmp/r4_queue_stop ] && { echo "stop sentinel"; break; }
    continue
  fi
  name=$(basename "$stage" .sh)
  echo "=== stage $name start $(date +%H:%M:%S) ==="
  touch /tmp/TPU_BUSY
  bash "$stage" > "/tmp/r4_${name}.log" 2>&1
  rc=$?
  rm -f /tmp/TPU_BUSY
  echo "=== stage $name rc=$rc end $(date +%H:%M:%S) ==="
  touch "${stage}.done"
  # claim-health check between stages: if wedged, wait it out
  if ! probe; then
    echo "claim unhealthy after $name; waiting"
    for j in $(seq 1 60); do
      sleep 240
      if probe; then echo "claim back (wait $j)"; break; fi
      echo "still wedged ($j) $(date +%H:%M:%S)"
    done
  fi
done
echo "r4 queue exit $(date +%H:%M:%S)"
