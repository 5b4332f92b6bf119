#!/bin/bash
# Keeps the round-4 TPU queue alive until the queue deadline.
#
# The claim can recover at any moment (the wedge is external to this
# VM), so losing the queue means losing the round's TPU evidence.  This
# supervisor relaunches the queue whenever its pid vanishes.  PID-file
# based — never kills or matches by process name.
#
# Stop: touch /tmp/r4_supervisor_stop (the queue does this itself when
# it hits QUEUE_DEADLINE, so the claim is free for the driver's final
# bench.py run).
cd /root/repo
DEADLINE=${QUEUE_DEADLINE:-1787068800}
while true; do
  [ -f /tmp/r4_supervisor_stop ] && { echo "supervisor stop $(date +%H:%M:%S)"; exit 0; }
  [ "$(date +%s)" -ge "$DEADLINE" ] && { echo "supervisor deadline $(date +%H:%M:%S)"; exit 0; }
  pid=$(cat /tmp/r4_queue.pid 2>/dev/null)
  if [ -z "$pid" ] || ! kill -0 "$pid" 2>/dev/null; then
    echo "supervisor: relaunching queue $(date +%H:%M:%S)"
    nohup bash scripts/run_r4_queue.sh >> /tmp/r4_queue.log 2>&1 &
    echo $! > /tmp/r4_queue.pid
  fi
  sleep 300
done
