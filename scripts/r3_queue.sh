#!/bin/bash
# Round-3 chip-work queue: runs the remaining measurement campaigns
# sequentially, waiting for the TPU relay to answer between stages
# (a wedged relay hangs rather than erroring; probes run with timeout).
# Logs under /root/data/.
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo

wait_tpu() {
  for i in $(seq 1 40); do
    if timeout 120 python -c "
import jax, jax.numpy as jnp
y = jax.jit(lambda a: a@a)(jnp.ones((1024,1024), jnp.bfloat16))
print('tpu ok', float(y[0,0]))" >/dev/null 2>&1; then
      echo "[queue] TPU healthy (attempt $i)"
      return 0
    fi
    echo "[queue] attempt $i: TPU down; sleeping 300s"
    sleep 300
  done
  echo "[queue] TPU never recovered" >&2
  return 1
}

stage() {
  name="$1"; shift
  echo "[queue] === $name: $(date -u +%H:%M:%S) ==="
  wait_tpu || return 1
  "$@" > "/root/data/${name}.log" 2>&1
  rc=$?
  echo "[queue] $name done rc=$rc at $(date -u +%H:%M:%S)"
  grep -v "WARNING\|cpu_aot\|machine features" "/root/data/${name}.log" | tail -5
}

stage kol3d python -u scripts/kolmogorov_3d_chip.py --data-dir /root/data/kol3d
stage torus_li python -u scripts/torus_li_study.py --data-dir /root/data/torus_li
stage torus_vis python -u scripts/torus_vis_study.py --data-dir /root/data/torus_vis
echo "[queue] all stages complete $(date -u +%H:%M:%S)"
