#!/bin/bash
# Swap the running r5_queue.sh for the revised tail (r5_queue6.sh) at the
# superres stage boundary: the original tail would have spent every
# remaining chip-minute on li_4x, skipping the k40 retry, the amended
# 512^3 probe, and the torus_vis trials. Group-kills the old queue (it
# was setsid-launched, so pgid == pid) once "superres done" appears in
# its log, then launches the new tail detached.
#
# Usage: setsid nohup bash scripts/r5_watch_swap.sh <queue-pgid> \
#          > /root/data/watch_swap.log 2>&1 &
PGID="${1:?pgid of the running r5_queue.sh}"
LOG=/root/data/queue_r5.log

for i in $(seq 1 240); do
  if ! kill -0 "$PGID" 2>/dev/null; then
    echo "[watcher] old queue already gone (iter $i)"
    break
  fi
  if grep -q "superres done rc\|=== li_4x" "$LOG" 2>/dev/null; then
    echo "[watcher] superres boundary at $(date -u +%H:%M:%S); killing group $PGID"
    sleep 20  # let the stage's harvest cp land
    kill -- "-$PGID" 2>/dev/null
    break
  fi
  sleep 15
done
kill -- "-$PGID" 2>/dev/null  # belt-and-braces (also covers loop timeout)
sleep 5

cd /root/repo
setsid nohup bash scripts/r5_queue6.sh > /root/data/queue_r5b.log 2>&1 &
echo "[watcher] launched r5_queue6 at $(date -u +%H:%M:%S)"
