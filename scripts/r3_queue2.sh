#!/bin/bash
# Round-3 master chip queue (v2): resumes the LI full-budget run that died
# with the previous session, then works through the remaining measurement
# campaigns in VERDICT-priority order. Every stage is resumable (datasets
# and study.json checkpoints persist under /root/data), so re-running this
# script after any interruption continues where it left off.
# Launch detached:  setsid nohup bash scripts/r3_queue2.sh > /root/data/queue.log 2>&1 &
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

# 1. LI at the reference's FULL optimization budget (600-frame train set =
#    4,544 steps/epoch x 10 epochs ~ the 40k-step cosine decay), incl. the
#    unlearned-control eval. Data already generated under li_ref2.
stage li_ref2 python -u scripts/learned_interp_reference.py \
  --data-dir /root/data/li_ref2 --train-frames 600

# 2. 3D Kolmogorov on chip: step-time probes (64^3/128^3 + 512^3
#    extrapolation), 64^3 trajectory generation, one 3D-FFNO train epoch.
stage kol3d python -u scripts/kolmogorov_3d_chip.py --data-dir /root/data/kol3d

# 3. torus_li headline attribution: 3 trials x {ffno24, fno4} on one
#    shared dataset (dt ablation deferred to stage 5 so the multi-trial
#    table lands even if wall time runs out).
stage torus_li python -u scripts/torus_li_study.py \
  --data-dir /root/data/torus_li --skip-dt-ablation

# 4. torus_vis / torus_vis_force full-depth conditioning study.
stage torus_vis python -u scripts/torus_vis_study.py --data-dir /root/data/torus_vis

# 5. torus_li dt-provenance ablation (re-runs the same study script; the
#    completed trial jobs are skipped via study.json).
stage torus_li_dt python -u scripts/torus_li_study.py --data-dir /root/data/torus_li

echo "[queue] all stages complete $(date -u +%H:%M:%S)"
