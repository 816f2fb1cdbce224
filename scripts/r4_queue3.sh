#!/bin/bash
# Round-4 queue part 3 (starts when part 2's stages are done): the MGN
# real-flow stand-in training run (~5 chip-min), plus anything part 2
# skipped. Launch detached:
#   setsid nohup bash scripts/r4_queue3.sh > /root/data/queue_r4_3.log 2>&1 &
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo
mkdir -p /root/data

DEADLINE="${DEADLINE:-$(date -u -d 'today 20:30' +%s)}"
if [ $(( DEADLINE - $(date +%s) )) -le 0 ]; then
  echo "[queue_r4_3] FATAL: DEADLINE in the past; set DEADLINE explicitly" >&2
  exit 1
fi
time_left() { echo $(( DEADLINE - $(date +%s) )); }

waited=0
while [ -f /root/data/queue_r4_2.log ] \
      && ! grep -q "all stages complete" /root/data/queue_r4_2.log; do
  if [ "$(time_left)" -lt 900 ]; then
    echo "[queue_r4_3] deadline approaching with part 2 unfinished; exiting"
    exit 0
  fi
  sleep 180; waited=$(( waited + 180 ))
done
echo "[queue_r4_3] starting at $(date -u +%H:%M:%S) (left $(time_left)s)"

wait_tpu() {
  for i in $(seq 1 10); do
    if timeout 180 python -c "
import jax, jax.numpy as jnp
y = jax.jit(lambda a: a@a)(jnp.ones((1024,1024), jnp.bfloat16))
print('tpu ok', float(y[0,0]))" >/dev/null 2>&1; then
      echo "[queue_r4_3] TPU healthy (attempt $i)"
      return 0
    fi
    echo "[queue_r4_3] attempt $i: TPU down; sleeping 240s"
    sleep 240
  done
  return 1
}

stage() {
  name="$1"; budget="$2"; shift 2
  if [ "$(time_left)" -lt 600 ]; then
    echo "[queue_r4_3] skipping $name: past deadline"; return 1
  fi
  if [ "$budget" -gt "$(time_left)" ]; then budget="$(time_left)"; fi
  echo "[queue_r4_3] === $name: $(date -u +%H:%M:%S) (left $(time_left)s, budget ${budget}s) ==="
  wait_tpu || return 1
  timeout "$budget" "$@" > "/root/data/${name}.log" 2>&1
  rc=$?
  echo "[queue_r4_3] $name done rc=$rc at $(date -u +%H:%M:%S)"
  grep -v "WARNING\|cpu_aot\|machine features" "/root/data/${name}.log" | tail -5
}

# MeshGraphNets at the registry budget on the real-flow stand-in.
stage mgn_standin 1500 python -u scripts/mgn_standin.py --data-dir /root/data/mgn

echo "[queue_r4_3] all stages complete $(date -u +%H:%M:%S)"
