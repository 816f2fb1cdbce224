#!/bin/bash
# Round-5 queue, post-reboot rebuild. The VM restarted ~01:56Z on
# 2026-08-20, wiping /root/data (datasets + the r5_queue6 tail's progress).
# Everything already harvested into /root/repo/artifacts is safe; this
# queue re-runs ONLY the still-missing evidence, cheapest/highest-value
# first, with the kochkov512 dataset regenerated once and shared:
#   1. ksweep k40  (last missing leg of the paper's step-size figure;
#                   regenerates the 512^2 DNS dataset it trains on)
#   2. mgn16       (MGN stand-in at stride 16 — stride 4 sat at the
#                   persistence floor; reuses the ksweep dataset's h5)
#   3. kol3d_512   (measured 512^3 projection step with the amended
#                   on-device-constants probe; replaces the extrapolation)
#   4. torus_vis 03 then 01, trial 2 (make the load-bearing conditioning
#                   cells multi-trial; seeded dataset regenerated)
#   5. li_4x       (only if time somehow remains)
#
# Launch detached:
#   setsid nohup bash scripts/r5_queue7.sh > /root/data/queue_r5c.log 2>&1 &
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo
mkdir -p /root/data /root/repo/artifacts

# Hard wall-clock exit: session started ~03:00Z with ~5h -> round end
# 07:15-08:00Z; chip quiet >=1h before the EARLIEST plausible end.
DEADLINE="${DEADLINE:-$(date -u -d '2026-08-20 06:15' +%s)}"
time_left() { echo $(( DEADLINE - $(date +%s) )); }
echo "[queue_r5c] starting at $(date -u +%H:%M:%S) (left $(time_left)s)"

wait_tpu() {
  for i in $(seq 1 20); do
    if timeout 240 python -c "
import jax, jax.numpy as jnp
y = jax.jit(lambda a: a@a)(jnp.ones((1024,1024), jnp.bfloat16))
print('tpu ok', float(y[0,0]))" >/dev/null 2>&1; then
      echo "[queue_r5c] TPU healthy (attempt $i)"
      return 0
    fi
    echo "[queue_r5c] attempt $i: TPU down; sleeping 240s"
    sleep 240
  done
  echo "[queue_r5c] TPU never recovered" >&2
  return 1
}

stage() {
  name="$1"; budget="$2"; shift 2
  if [ "$(time_left)" -lt 600 ]; then
    echo "[queue_r5c] skipping $name: past deadline"
    return 1
  fi
  if [ "$budget" -gt "$(time_left)" ]; then budget="$(time_left)"; fi
  echo "[queue_r5c] === $name: $(date -u +%H:%M:%S) (left $(time_left)s, budget ${budget}s) ==="
  wait_tpu || return 1
  timeout "$budget" "$@" > "/root/data/${name}.log" 2>&1
  rc=$?
  echo "[queue_r5c] $name done rc=$rc at $(date -u +%H:%M:%S)"
  grep -v "WARNING\|cpu_aot\|machine features" "/root/data/${name}.log" | tail -6
}

harvest() {
  if [ -e "$1" ]; then
    mkdir -p "$(dirname "/root/repo/artifacts/$2")"
    cp -r "$1" "/root/repo/artifacts/$2"
    echo "[queue_r5c] harvested $1 -> artifacts/$2"
  fi
}

KDIR=/root/data/kochkov512

# 1. k40: regenerates the 512^2 reference-protocol dataset (~25 min) then
#    trains the last k-sweep leg (~16 min).
if ! grep -q '"epoch": 10' "$KDIR/runs/k40/campaign_log.jsonl" 2>/dev/null; then
  stage ksweep_k40c 3600 python -u scripts/quality_campaign.py \
    --data-dir "$KDIR" --n-train 32 --n-test 8 --sim-size 512 \
    --inner 16 --outer 2441 --warmup 357 --dt 8.75e-4 --k 40 \
    --batch 32 --epochs 10 --eval-every 5 --n-steps 60 \
    --precision bf16 --gen-batch 8 --tag k40 --chunk-steps auto
fi
harvest "$KDIR/runs/k40/campaign_log.jsonl" "ksweep/k40_campaign_log.jsonl"
harvest "$KDIR/runs/k40/campaign_meta.json" "ksweep/k40_campaign_meta.json"

# 2. MGN stand-in at stride 16 (needs the ksweep dataset's 64^2 h5).
if [ ! -s /root/data/mgn16/mgn_standin.json ]; then
  stage mgn16 1500 python -u scripts/mgn_standin.py \
    --data-dir /root/data/mgn16 --source "$KDIR/train_64_1.h5" \
    --stride-time 16
fi
harvest /root/data/mgn16/mgn_standin.json mgn_standin_stride16.json

# 3. 512^3 measured step (amended probe: on-device constants, donated
#    scan carry, bf16-state fallback).
if ! grep -q "step_ms_512" /root/data/kol3d/kol3d_results.json 2>/dev/null; then
  stage kol3d_512 1800 python -u scripts/kol3d_highres.py \
    --results /root/data/kol3d/kol3d_results.json
fi
harvest /root/data/kol3d/kol3d_results.json kol3d_results.json

# 4. torus_vis second trials of the load-bearing cells (03 carries the
#    conditioning claim; 01 is its contrast). Seed the study with the
#    banked trial-0 rows so only trial 1 runs per cell; dataset (seeded,
#    identical parameters) regenerates once.
mkdir -p /root/data/torus_vis
if [ ! -s /root/data/torus_vis/study.json ]; then
  cp /root/repo/artifacts/torus_vis/study.json /root/data/torus_vis/study.json
fi
stage torus_vis_03 4800 python -u scripts/torus_vis_study.py \
  --data-dir /root/data/torus_vis --n-train 150 --n-eval 25 \
  --trials 2 --only vis_03_no_mu_force --val-every 5
harvest /root/data/torus_vis/study.json torus_vis/study_r5.json
stage torus_vis_01 2700 python -u scripts/torus_vis_study.py \
  --data-dir /root/data/torus_vis --n-train 150 --n-eval 25 \
  --trials 2 --only vis_01_baseline --val-every 5
harvest /root/data/torus_vis/study.json torus_vis/study_r5.json

# 5. LI data-volume hypothesis, only if time remains (it won't unless
#    earlier stages skipped): trimmed 4x-data rerun, resumable.
stage li_4x 8400 python -u scripts/learned_interp_reference.py \
  --data-dir /root/data/li_4x --n-train 128 --n-test 8 \
  --epochs 20 --steps-per-epoch 1000 --decay-steps 20000 \
  --val-every 2 --resume
harvest /root/data/li_4x/li_reference_trial0.json li_4x/li_reference_trial0.json
harvest /root/data/li_4x/epochs.jsonl li_4x/epochs.jsonl
harvest /root/data/li_4x/control.json li_4x/control.json

echo "[queue_r5c] all stages complete $(date -u +%H:%M:%S) (left $(time_left)s)"
