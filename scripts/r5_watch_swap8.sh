#!/bin/bash
# Watch r5_queue7 (pid in /tmp/queue_r5d.pid, log /root/data/queue_r5d.log)
# and swap to r5_queue8 at the kol3d_512 boundary — the point where the
# two queues' orders diverge. Triggers on any of:
#   - "kol3d_512 done rc="   (stage finished; clean boundary)
#   - "=== torus_vis_03"     (queue7 raced past the boundary; abort it,
#                              queue8 restarts torus_vis_03 resumably)
#   - queue7's process group is gone (crash/exit)
LOG=/root/data/queue_r5d.log
PIDFILE=/tmp/queue_r5d.pid
while true; do
  pid=$(cat "$PIDFILE" 2>/dev/null)
  alive=0
  [ -n "$pid" ] && kill -0 "$pid" 2>/dev/null && alive=1
  hit=""
  grep -q "kol3d_512 done rc=" "$LOG" 2>/dev/null && hit="kol3d_done"
  grep -q "=== torus_vis_03" "$LOG" 2>/dev/null && hit="vis03_started"
  if [ -n "$hit" ] || [ "$alive" = 0 ]; then
    echo "[swap8] trigger=$hit alive=$alive at $(date -u +%H:%M:%S)"
    if [ "$alive" = 1 ]; then
      kill -TERM -- -"$pid" 2>/dev/null
      sleep 15
      kill -KILL -- -"$pid" 2>/dev/null
      sleep 5
    fi
    DEADLINE="${DEADLINE:-$(date -u -d '2026-08-20 07:25' +%s)}" \
      setsid nohup bash /root/repo/scripts/r5_queue8.sh \
      > /root/data/queue_r5e.log 2>&1 &
    echo $! > /tmp/queue_r5e.pid
    echo "[swap8] queue8 launched (pid $(cat /tmp/queue_r5e.pid))"
    exit 0
  fi
  sleep 45
done
