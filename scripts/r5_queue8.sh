#!/bin/bash
# Round-5 tail queue (swapped in at the kol3d_512 boundary of r5_queue7).
# Why: queue7's remaining order (torus_vis_03 4800s -> torus_vis_01 ->
# li_4x) would eat the window before the superres-256 row (VERDICT r4 #8)
# ever runs. This tail reorders cheapest-first from the swap point:
#   1. superres256  (~10 min: 4-size rollout eval of the k40 checkpoint,
#                    incl. the missing 256^2 row; test set regenerated at
#                    512^2 sim with the campaign's own cadence)
#   2. torus_vis_03 (trial 2 of the load-bearing conditioning cell)
#   3. torus_vis_01 (trial 2 of its contrast cell)
#   4. li_4x        (only if time somehow remains)
# Same skip-if-done guards as queue7, so it is safe to start even if the
# earlier stages were interrupted (quality_campaign/kol3d are resumable).
#
# Launch (after killing queue7's process group):
#   DEADLINE=<epoch> setsid nohup bash scripts/r5_queue8.sh > /root/data/queue_r5e.log 2>&1 &
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo
mkdir -p /root/data /root/repo/artifacts

DEADLINE="${DEADLINE:-$(date -u -d '2026-08-20 07:25' +%s)}"
time_left() { echo $(( DEADLINE - $(date +%s) )); }
echo "[queue_r5e] starting at $(date -u +%H:%M:%S) (left $(time_left)s)"

wait_tpu() {
  for i in $(seq 1 20); do
    if timeout 240 python -c "
import jax, jax.numpy as jnp
y = jax.jit(lambda a: a@a)(jnp.ones((1024,1024), jnp.bfloat16))
print('tpu ok', float(y[0,0]))" >/dev/null 2>&1; then
      echo "[queue_r5e] TPU healthy (attempt $i)"
      return 0
    fi
    echo "[queue_r5e] attempt $i: TPU down; sleeping 240s"
    sleep 240
  done
  echo "[queue_r5e] TPU never recovered" >&2
  return 1
}

stage() {
  name="$1"; budget="$2"; shift 2
  if [ "$(time_left)" -lt 600 ]; then
    echo "[queue_r5e] skipping $name: past deadline"
    return 1
  fi
  if [ "$budget" -gt "$(time_left)" ]; then budget="$(time_left)"; fi
  echo "[queue_r5e] === $name: $(date -u +%H:%M:%S) (left $(time_left)s, budget ${budget}s) ==="
  wait_tpu || return 1
  timeout "$budget" "$@" > "/root/data/${name}.log" 2>&1
  rc=$?
  echo "[queue_r5e] $name done rc=$rc at $(date -u +%H:%M:%S)"
  grep -v "WARNING\|cpu_aot\|machine features" "/root/data/${name}.log" | tail -6
}

harvest() {
  if [ -e "$1" ]; then
    mkdir -p "$(dirname "/root/repo/artifacts/$2")"
    cp -r "$1" "/root/repo/artifacts/$2"
    echo "[queue_r5e] harvested $1 -> artifacts/$2"
  fi
}

KDIR=/root/data/kochkov512

# 0. Re-harvest anything queue7's interrupted tail produced.
harvest "$KDIR/runs/k40/campaign_log.jsonl" "ksweep/k40_campaign_log.jsonl"
harvest "$KDIR/runs/k40/campaign_meta.json" "ksweep/k40_campaign_meta.json"
harvest /root/data/mgn16/mgn_standin.json mgn_standin_stride16.json
harvest /root/data/kol3d/kol3d_results.json kol3d_results.json

# 1. Super-resolution transfer incl. the 256^2 row (VERDICT r4 #8), from
#    the k40 checkpoint trained minutes ago on this chip. One consistent
#    4-size table: same checkpoint, same held-out seeds, same cadence.
#    15 model steps x 0.56 sim-s/step = 8.4 sim-s horizon (the 64^2
#    time_until is ~3 sim-s, so the horizon is not the binding cut).
if [ ! -s "$KDIR/superres/superres_results.json" ]; then
  stage superres256 2400 python -u scripts/superres_eval.py \
    --data-dir "$KDIR" --ckpt "$KDIR/runs/k40/last.ckpt" \
    --sizes 32 64 128 256 --sim-size 512 --dt 8.75e-4 --inner 16 \
    --outer 650 --warmup 357 --k 40 --n-steps 15
fi
harvest "$KDIR/superres/superres_results.json" superres_results.json

# 2+3. torus_vis second trials, load-bearing cell first.
mkdir -p /root/data/torus_vis
if [ ! -s /root/data/torus_vis/study.json ]; then
  cp /root/repo/artifacts/torus_vis/study.json /root/data/torus_vis/study.json
fi
stage torus_vis_03 4200 python -u scripts/torus_vis_study.py \
  --data-dir /root/data/torus_vis --n-train 150 --n-eval 25 \
  --trials 2 --only vis_03_no_mu_force --val-every 5
harvest /root/data/torus_vis/study.json torus_vis/study_r5.json
stage torus_vis_01 2700 python -u scripts/torus_vis_study.py \
  --data-dir /root/data/torus_vis --n-train 150 --n-eval 25 \
  --trials 2 --only vis_01_baseline --val-every 5
harvest /root/data/torus_vis/study.json torus_vis/study_r5.json

# 4. LI data-volume hypothesis, only if time remains.
stage li_4x 8400 python -u scripts/learned_interp_reference.py \
  --data-dir /root/data/li_4x --n-train 128 --n-test 8 \
  --epochs 20 --steps-per-epoch 1000 --decay-steps 20000 \
  --val-every 2 --resume
harvest /root/data/li_4x/li_reference_trial0.json li_4x/li_reference_trial0.json
harvest /root/data/li_4x/epochs.jsonl li_4x/epochs.jsonl
harvest /root/data/li_4x/control.json li_4x/control.json

echo "[queue_r5e] all stages complete $(date -u +%H:%M:%S) (left $(time_left)s)"
