#!/bin/bash
# Round-5 queue, revised tail (replaces r5_queue.sh after its superres
# stage). Why the rewrite: the original tail gave li_4x a 13500 s budget
# that would have eaten every remaining chip-minute, leaving the k40
# k-sweep leg unretried (it died to a transient relay fault), the amended
# 512^3 probe (donated carry + bf16 fallback, committed AFTER the failed
# attempt) unrun, and torus_vis single-trial. This tail runs
# cheapest-first with per-stage budgets that leave room for everything:
#   k40 retry -> 512^3 retry -> mgn stride-16 -> li_4x (trimmed) ->
#   torus_vis trial-1 of the load-bearing cells (03 first).
#
# Launch detached:
#   setsid nohup bash scripts/r5_queue6.sh > /root/data/queue_r5b.log 2>&1 &
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo
mkdir -p /root/data /root/repo/artifacts

# Hard wall-clock exit >=90 min before round end (same deadline as
# r5_queue.sh: round end ~07:15Z -> chip quiet from 05:30Z).
DEADLINE="${DEADLINE:-$(date -u -d '2026-08-20 05:30' +%s)}"
time_left() { echo $(( DEADLINE - $(date +%s) )); }
echo "[queue_r5b] starting at $(date -u +%H:%M:%S) (left $(time_left)s)"

wait_tpu() {
  for i in $(seq 1 20); do
    if timeout 240 python -c "
import jax, jax.numpy as jnp
y = jax.jit(lambda a: a@a)(jnp.ones((1024,1024), jnp.bfloat16))
print('tpu ok', float(y[0,0]))" >/dev/null 2>&1; then
      echo "[queue_r5b] TPU healthy (attempt $i)"
      return 0
    fi
    echo "[queue_r5b] attempt $i: TPU down; sleeping 240s"
    sleep 240
  done
  echo "[queue_r5b] TPU never recovered" >&2
  return 1
}

stage() {
  name="$1"; budget="$2"; shift 2
  if [ "$(time_left)" -lt 600 ]; then
    echo "[queue_r5b] skipping $name: past deadline"
    return 1
  fi
  if [ "$budget" -gt "$(time_left)" ]; then budget="$(time_left)"; fi
  echo "[queue_r5b] === $name: $(date -u +%H:%M:%S) (left $(time_left)s, budget ${budget}s) ==="
  wait_tpu || return 1
  timeout "$budget" "$@" > "/root/data/${name}.log" 2>&1
  rc=$?
  echo "[queue_r5b] $name done rc=$rc at $(date -u +%H:%M:%S)"
  grep -v "WARNING\|cpu_aot\|machine features" "/root/data/${name}.log" | tail -6
}

harvest() {
  if [ -e "$1" ]; then
    mkdir -p "$(dirname "/root/repo/artifacts/$2")"
    cp -r "$1" "/root/repo/artifacts/$2"
    echo "[queue_r5b] harvested $1 -> artifacts/$2"
  fi
}

KDIR=/root/data/kochkov512

# 0. Safety harvest of whatever the old queue's superres stage produced.
harvest "$KDIR/superres/superres_results.json" superres_results.json

# 1. k40 retry (the only missing k-sweep leg; dataset already on disk,
#    ~16 min of training; died at 00:42 to a one-off relay fault).
if ! grep -q '"epoch": 10' "$KDIR/runs/k40/campaign_log.jsonl" 2>/dev/null; then
  stage ksweep_k40b 2400 python -u scripts/quality_campaign.py \
    --data-dir "$KDIR" --n-train 32 --n-test 8 --sim-size 512 \
    --inner 16 --outer 2441 --warmup 357 --dt 8.75e-4 --k 40 \
    --batch 32 --epochs 10 --eval-every 5 --n-steps 60 \
    --precision bf16 --gen-batch 8 --tag k40 --chunk-steps auto
fi
harvest "$KDIR/runs/k40/campaign_log.jsonl" "ksweep/k40_campaign_log.jsonl"
harvest "$KDIR/runs/k40/campaign_meta.json" "ksweep/k40_campaign_meta.json"

# 2. 512^3 retry with the amended probe (donated scan carry; clean-OOM
#    bf16 fallback in a fresh process). The 00:04 attempt predates the
#    amendment (committed 00:10).
if ! grep -q "step_ms_512" /root/data/kol3d/kol3d_results.json 2>/dev/null; then
  stage kol3d_512 1800 python -u scripts/kol3d_highres.py \
    --results /root/data/kol3d/kol3d_results.json
fi
harvest /root/data/kol3d/kol3d_results.json kol3d_results.json

# 3. MGN stand-in at stride 16: the stride-4 run learned to the
#    persistence floor (deltas too small for the task to discriminate);
#    16x larger deltas make one-step prediction non-trivial.
if [ ! -s /root/data/mgn16/mgn_standin.json ]; then
  stage mgn16 1500 python -u scripts/mgn_standin.py \
    --data-dir /root/data/mgn16 --source "$KDIR/train_64_1.h5" \
    --stride-time 16
fi
harvest /root/data/mgn16/mgn_standin.json mgn_standin_stride16.json

# 4. LI data-volume hypothesis (VERDICT r4 #6), trimmed budget: 4x
#    trajectories, 20k-step cosine (quality converged by ~16k in the 40k
#    reference run). Resumable; epochs.jsonl is evidence even truncated.
stage li_4x 8400 python -u scripts/learned_interp_reference.py \
  --data-dir /root/data/li_4x --n-train 128 --n-test 8 \
  --epochs 20 --steps-per-epoch 1000 --decay-steps 20000 \
  --val-every 2 --resume
harvest /root/data/li_4x/li_reference_trial0.json li_4x/li_reference_trial0.json
harvest /root/data/li_4x/epochs.jsonl li_4x/epochs.jsonl
harvest /root/data/li_4x/control.json li_4x/control.json

# 5. torus_vis trial-1 of the load-bearing cells (VERDICT r4 #9), seeded
#    with the banked trial-0 study so only new trials run. Same dataset
#    parameters as the round-3 study (150+25+25, seed 48396) so trials
#    share the regenerated-identical dataset. 03 (the cell carrying the
#    conditioning claim) before 01.
mkdir -p /root/data/torus_vis
if [ ! -s /root/data/torus_vis/study.json ]; then
  cp /root/repo/artifacts/torus_vis/study.json /root/data/torus_vis/study.json
fi
stage torus_vis_03 4200 python -u scripts/torus_vis_study.py \
  --data-dir /root/data/torus_vis --n-train 150 --n-eval 25 \
  --trials 2 --only vis_03_no_mu_force --val-every 5
harvest /root/data/torus_vis/study.json torus_vis/study_r5.json
stage torus_vis_01 4200 python -u scripts/torus_vis_study.py \
  --data-dir /root/data/torus_vis --n-train 150 --n-eval 25 \
  --trials 2 --only vis_01_baseline --val-every 5
harvest /root/data/torus_vis/study.json torus_vis/study_r5.json

# 6. Bonus: a third trial of each if time somehow remains.
stage torus_vis_t3 4200 python -u scripts/torus_vis_study.py \
  --data-dir /root/data/torus_vis --n-train 150 --n-eval 25 \
  --trials 3 --only vis_03_no_mu_force,vis_01_baseline --val-every 5
harvest /root/data/torus_vis/study.json torus_vis/study_r5.json

echo "[queue_r5b] all stages complete $(date -u +%H:%M:%S) (left $(time_left)s)"
