#!/bin/bash
# Round-5 chip queue (VERDICT r4 "next round" items), REWRITTEN for the
# round-5 reality: /root/data was WIPED between rounds, so every stage's
# input dataset must be regenerated (all the scripts are self-contained
# generators). Cheapest-first within dependency order, skip-if-done
# guards, and each stage's artifact is HARVESTED into /root/repo/artifacts
# the moment it completes (VERDICT r4 weak #1).
#
# Launch detached:
#   setsid nohup bash scripts/r5_queue.sh > /root/data/queue_r5.log 2>&1 &
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo
mkdir -p /root/data /root/repo/artifacts

# Hard wall-clock exit >=90 min before round end (round 5 started ~20:15Z
# on 2026-08-19 with ~11 h => end ~07:15Z; deadline 05:30Z).
DEADLINE="${DEADLINE:-$(date -u -d '2026-08-20 05:30' +%s)}"
if [ $(( DEADLINE - $(date +%s) )) -le 0 ]; then
  echo "[queue_r5] FATAL: DEADLINE in the past; set DEADLINE explicitly" >&2
  exit 1
fi
time_left() { echo $(( DEADLINE - $(date +%s) )); }
echo "[queue_r5] starting at $(date -u +%H:%M:%S) (left $(time_left)s)"

wait_tpu() {
  # The first probe after a client detaches usually fails (relay starves
  # new connections for ~2-6 min) — expect attempt 1 to fail; 240s probe
  # timeouts (the round-5 cold boot took >180s to first compile).
  for i in $(seq 1 20); do
    if timeout 240 python -c "
import jax, jax.numpy as jnp
y = jax.jit(lambda a: a@a)(jnp.ones((1024,1024), jnp.bfloat16))
print('tpu ok', float(y[0,0]))" >/dev/null 2>&1; then
      echo "[queue_r5] TPU healthy (attempt $i)"
      return 0
    fi
    echo "[queue_r5] attempt $i: TPU down; sleeping 240s"
    sleep 240
  done
  echo "[queue_r5] TPU never recovered" >&2
  return 1
}

stage() {
  name="$1"; budget="$2"; shift 2
  if [ "$(time_left)" -lt 600 ]; then
    echo "[queue_r5] skipping $name: past deadline"
    return 1
  fi
  if [ "$budget" -gt "$(time_left)" ]; then budget="$(time_left)"; fi
  echo "[queue_r5] === $name: $(date -u +%H:%M:%S) (left $(time_left)s, budget ${budget}s) ==="
  wait_tpu || return 1
  timeout "$budget" "$@" > "/root/data/${name}.log" 2>&1
  rc=$?
  echo "[queue_r5] $name done rc=$rc at $(date -u +%H:%M:%S)"
  grep -v "WARNING\|cpu_aot\|machine features" "/root/data/${name}.log" | tail -6
}

harvest() {  # harvest <src> <dst-under-artifacts>
  if [ -e "$1" ]; then
    mkdir -p "$(dirname "/root/repo/artifacts/$2")"
    cp -r "$1" "/root/repo/artifacts/$2"
    echo "[queue_r5] harvested $1 -> artifacts/$2"
  fi
}

KDIR=/root/data/kochkov512

# 0. Insurance benchmark on the fresh chip: round 4 ended with NO captured
#    perf number (BENCH_r04 rc=124); bank one immediately.
if [ ! -s /root/repo/artifacts/bench_r5_selfcheck.json ]; then
  stage bench_r5 1500 python -u bench.py
  grep -o '{.*}' /root/data/bench_r5.log | tail -1 \
    > /root/repo/artifacts/bench_r5_selfcheck.json
  cat /root/repo/artifacts/bench_r5_selfcheck.json
fi

# 1. Elasticity stand-in at the full registry budget (VERDICT r4 #4).
#    Self-contained (synthetic Kirsch-stress dataset), ~15 chip-min.
if [ ! -s /root/data/elasticity/elasticity_standin.json ]; then
  stage elasticity 3600 python -u scripts/elasticity_standin.py \
    --data-dir /root/data/elasticity --resume
fi
harvest /root/data/elasticity/elasticity_standin.json elasticity_standin.json

# 2. Measured 256^3 + 512^3 (VERDICT r4 #5). The script skips
#    already-measured sizes, so after the round-5 256^3 run this stage
#    only retries the 512^3 probe (compile-payload fix: constants now
#    assembled on device; IC in bounded per-component dispatches).
if ! grep -q "step_ms_512" /root/data/kol3d/kol3d_results.json 2>/dev/null; then
  stage kol3d_highres 2100 python -u scripts/kol3d_highres.py \
    --results /root/data/kol3d/kol3d_results.json
fi
harvest /root/data/kol3d/kol3d_results.json kol3d_results.json

# 3. k-sweep on the reference-protocol 512^2 dataset (VERDICT r4 #3).
#    The k=20 leg runs first and pays the one-off ~37 min datagen; the
#    dataset is shared by all four legs + mgn_standin + superres.
#    quality_campaign resumes per-epoch, so a timeout continues next leg.
for K in 20 5 10 40; do
  NS=$(( 2420 / K ))
  BUDGET=2400; [ "$K" = 20 ] && BUDGET=6000
  if ! grep -q '"epoch": 10' "$KDIR/runs/k${K}/campaign_log.jsonl" 2>/dev/null; then
    stage "ksweep_k${K}" "$BUDGET" python -u scripts/quality_campaign.py \
      --data-dir "$KDIR" --n-train 32 --n-test 8 --sim-size 512 \
      --inner 16 --outer 2441 --warmup 357 --dt 8.75e-4 --k "$K" \
      --batch 32 --epochs 10 --eval-every 5 --n-steps "$NS" \
      --precision bf16 --gen-batch 8 --tag "k${K}" --chunk-steps auto
  fi
  harvest "$KDIR/runs/k${K}/campaign_log.jsonl" "ksweep/k${K}_campaign_log.jsonl"
  harvest "$KDIR/runs/k${K}/campaign_meta.json" "ksweep/k${K}_campaign_meta.json"
done

# 4. MGN real-flow stand-in (~5 chip-min; VERDICT r4 #7). Uses the ksweep
#    dataset's velocity fields ([32, 2441, 64, 64] vx/vy layout).
if [ ! -s /root/data/mgn/mgn_standin.json ]; then
  stage mgn_standin 1800 python -u scripts/mgn_standin.py \
    --data-dir /root/data/mgn --source "$KDIR/train_64_1.h5"
fi
harvest /root/data/mgn/mgn_standin.json mgn_standin.json

# 5. Super-resolution transfer incl. 256^2 (VERDICT r4 #8), from the k=20
#    sweep checkpoint.
if [ ! -s "$KDIR/superres/superres_results.json" ]; then
  stage superres 2400 python -u scripts/superres_eval.py \
    --data-dir "$KDIR" --ckpt "$KDIR/runs/k20/last.ckpt" \
    --sizes 32 64 128 256 --sim-size 512 --dt 8.75e-4 --inner 16 \
    --outer 650 --warmup 357 --k 20 --n-steps 30
fi
harvest "$KDIR/superres/superres_results.json" superres_results.json

# 6. LI data-volume hypothesis (VERDICT r4 #6): 4x training trajectories,
#    half-budget cosine (20k steps; quality converged by ~16k in the 40k
#    reference run). --resume makes a stage restart continue.
stage li_4x 13500 python -u scripts/learned_interp_reference.py \
  --data-dir /root/data/li_4x --n-train 128 --n-test 8 \
  --epochs 20 --steps-per-epoch 1000 --decay-steps 20000 \
  --val-every 2 --resume
harvest /root/data/li_4x/li_reference_trial0.json li_4x/li_reference_trial0.json
harvest /root/data/li_4x/epochs.jsonl li_4x/epochs.jsonl
harvest /root/data/li_4x/control.json li_4x/control.json

# 7. torus_vis conditioning, multi-trial (VERDICT r4 #9): 3 seeds of the
#    load-bearing cells (01_baseline vs 03_no_mu_force), resumable per
#    trial via study.json; whatever completes before the deadline counts.
stage torus_vis_trials 10800 python -u scripts/torus_vis_study.py \
  --data-dir /root/data/torus_vis --trials 3 \
  --only vis_01_baseline,vis_03_no_mu_force --val-every 5
harvest /root/data/torus_vis/study.json torus_vis/study_r5.json

# 8. Bonus if time remains: regenerate the torus_li raw study artifacts
#    (the round-4 files were lost to a .gitignore bug + the data-disk
#    wipe; same seeds reproduce the banked table).
stage torus_li_regen 14400 python -u scripts/torus_li_study.py \
  --data-dir /root/data/torus_li --skip-dt-ablation --trials 3 --val-every 100
harvest /root/data/torus_li/study.json torus_li/study.json
if [ -d /root/data/torus_li/runs ]; then
  mkdir -p /root/repo/artifacts/torus_li/runs
  for d in /root/data/torus_li/runs/*/; do
    b=$(basename "$d")
    [ -f "$d/metrics.jsonl" ] && { mkdir -p "/root/repo/artifacts/torus_li/runs/$b"; \
      cp "$d/metrics.jsonl" "/root/repo/artifacts/torus_li/runs/$b/"; }
  done
fi

echo "[queue_r5] all stages complete $(date -u +%H:%M:%S) (left $(time_left)s)"
