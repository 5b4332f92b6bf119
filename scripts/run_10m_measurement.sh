#!/bin/bash
# When the TPU claim frees: quiet the host (pause the CPU rebuild),
# run the 10M measurement with whichever IVF cache exists, resume.
export PYTHONPATH=/root/repo:/root/.axon_site
export MALLOC_MMAP_THRESHOLD_=1073741824 MALLOC_TRIM_THRESHOLD_=1073741824
cd /root/repo
for i in $(seq 1 60); do
  if timeout 180 python -c "import jax; assert jax.devices()[0].platform != 'cpu'" 2>/dev/null; then
    date > /tmp/tpu_back
    echo "TPU BACK at $(date +%H:%M) (probe $i)"
    PREP=$(cat /tmp/prepivf.pid 2>/dev/null)
    if [ -n "$PREP" ] && kill -0 $PREP 2>/dev/null; then
      echo "pausing rebuild $PREP"; kill -STOP $PREP
    fi
    if [ -f .bench10m_cache/ivf_n10002432_d768_v131072_s48_l16384.npz ]; then
      export BENCH_NLIST=16384
    else
      export BENCH_NLIST=8192
    fi
    echo "running bench_10m measurement (nlist=$BENCH_NLIST)"
    timeout 7200 python -u scripts/bench_10m.py --full 16 32 48 64 96 128 > /tmp/bench10m_tpu_r3.log 2>&1
    echo "measurement rc=$?"
    if [ -n "$PREP" ] && kill -0 $PREP 2>/dev/null; then
      echo "resuming rebuild $PREP"; kill -CONT $PREP
    fi
    exit 0
  fi
  echo "watch $i: stuck $(date +%H:%M)"
  sleep 300
done
echo "gave up"
