#!/bin/bash
# Round-3 relaunch queue (v5): the VM was rebuilt mid-round (all /root/data
# artifacts from the earlier round-3 session were lost) and the remaining
# budget is ~4h, not 12h. Priorities per VERDICT r2: the two "missing"
# items first (3D-on-chip #3, LI reference protocol #2), then the
# torus_vis full-depth study (#7) trimmed to fit, then extra torus_li
# trials (#4) only if time remains.
#
# Launch detached:
#   setsid nohup bash scripts/r3_queue5.sh > /root/data/queue5.log 2>&1 &
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo
mkdir -p /root/data

# Past DEADLINE no new stage starts; stage timeouts are capped so nothing
# outlives it. Round 3b began ~01:42 UTC with a ~4h budget (ends ~05:40);
# 04:40 leaves an hour of quiet chip for the driver's bench run.
DEADLINE="${DEADLINE:-$(date -u -d 'today 04:40' +%s)}"

time_left() { echo $(( DEADLINE - $(date +%s) )); }

wait_tpu() {
  for i in $(seq 1 20); do
    if timeout 120 python -c "
import jax, jax.numpy as jnp
y = jax.jit(lambda a: a@a)(jnp.ones((1024,1024), jnp.bfloat16))
print('tpu ok', float(y[0,0]))" >/dev/null 2>&1; then
      echo "[queue5] TPU healthy (attempt $i)"
      return 0
    fi
    echo "[queue5] attempt $i: TPU down; sleeping 300s"
    sleep 300
  done
  echo "[queue5] TPU never recovered" >&2
  return 1
}

stage() {
  name="$1"; budget="$2"; shift 2
  if [ "$(time_left)" -lt 600 ]; then
    echo "[queue5] skipping $name: past deadline"
    return 1
  fi
  if [ "$budget" -gt "$(time_left)" ]; then budget="$(time_left)"; fi
  echo "[queue5] === $name: $(date -u +%H:%M:%S) (left $(time_left)s, budget ${budget}s) ==="
  wait_tpu || return 1
  timeout "$budget" "$@" > "/root/data/${name}.log" 2>&1
  rc=$?
  echo "[queue5] $name done rc=$rc at $(date -u +%H:%M:%S)"
  grep -v "WARNING\|cpu_aot\|machine features" "/root/data/${name}.log" | tail -5
}

# 1. 3D Kolmogorov: probe 64^3/128^3 step time, generate a 64^3 set
#    through the production pipeline, train the 3D factorized model.
stage kol3d 2400 python -u scripts/kolmogorov_3d_chip.py --data-dir /root/data/kol3d

# 2. LI at the reference protocol (32-step unroll, 40k-step cosine budget,
#    100-outer-step validation vs 32^2 DNS). Per-epoch checkpoints +
#    epochs.jsonl mean a timeout still yields protocol-valid results.
stage li_ref 6600 python -u scripts/learned_interp_reference.py \
  --data-dir /root/data/li_ref --train-frames 600

# 3. torus_vis / torus_vis_force full-depth (24-layer) conditioning study,
#    trimmed data volume to fit the remaining wall-clock (reference trains
#    on 1000 trajectories; 150 keeps ~30k pairs/epoch at full depth).
stage torus_vis "$(( $(time_left) > 600 ? $(time_left) : 600 ))" \
  python -u scripts/torus_vis_study.py --data-dir /root/data/torus_vis \
  --n-train 150 --n-eval 25 --gen-batch 25 --val-every 5

# 4. Extra torus_li trials with whatever remains (resumable study.json).
stage torus_li_more "$(( $(time_left) > 600 ? $(time_left) : 600 ))" \
  python -u scripts/torus_li_study.py --data-dir /root/data/torus_li --skip-dt-ablation

echo "[queue5] all stages complete $(date -u +%H:%M:%S)"
