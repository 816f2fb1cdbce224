#!/bin/bash
# Round-4 queue part 2 (starts when part 1's stages are done):
#   1. HBM bandwidth roofline probe              (VERDICT r3 #5, ~10 min)
#   2. torus_li multi-trial study                (VERDICT r3 #2, ~4.5 h)
#   3. kochkov512 k-sweep {5,10,20,40}           (VERDICT r3 #6, ~1.5 h)
#   4. super-resolution eval incl. 256^2         (VERDICT r3 #8, ~25 min)
#   5. elasticity full budget on stand-in data   (VERDICT r3 #7, ~15 min)
#   6. measured 256^3 (+512^3) projection steps  (VERDICT r3 #4, ~15 min,
#      LAST: the 512^3 compile is the only HBM-risk dispatch in the queue)
#
# Launch detached:
#   setsid nohup bash scripts/r4_queue2.sh > /root/data/queue_r4_2.log 2>&1 &
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo
mkdir -p /root/data

DEADLINE="${DEADLINE:-$(date -u -d 'today 20:30' +%s)}"
if [ $(( DEADLINE - $(date +%s) )) -le 0 ]; then
  echo "[queue_r4_2] FATAL: DEADLINE ($(date -u -d @${DEADLINE})) is in the past;" \
       "set DEADLINE=<epoch seconds> explicitly" >&2
  exit 1
fi

time_left() { echo $(( DEADLINE - $(date +%s) )); }

# Wait for part 1 (max 3 h): it owns the chip until its stages are done.
waited=0
while [ -f /root/data/queue_r4_1.log ] \
      && ! grep -q "all stages complete" /root/data/queue_r4_1.log; do
  if [ "$waited" -ge 10800 ]; then
    echo "[queue_r4_2] part 1 still running after 3h; proceeding anyway"
    break
  fi
  sleep 120; waited=$(( waited + 120 ))
done
echo "[queue_r4_2] starting at $(date -u +%H:%M:%S) (left $(time_left)s)"

wait_tpu() {
  for i in $(seq 1 20); do
    if timeout 180 python -c "
import jax, jax.numpy as jnp
y = jax.jit(lambda a: a@a)(jnp.ones((1024,1024), jnp.bfloat16))
print('tpu ok', float(y[0,0]))" >/dev/null 2>&1; then
      echo "[queue_r4_2] TPU healthy (attempt $i)"
      return 0
    fi
    echo "[queue_r4_2] attempt $i: TPU down; sleeping 240s"
    sleep 240
  done
  echo "[queue_r4_2] TPU never recovered" >&2
  return 1
}

stage() {
  name="$1"; budget="$2"; shift 2
  if [ "$(time_left)" -lt 600 ]; then
    echo "[queue_r4_2] skipping $name: past deadline"
    return 1
  fi
  if [ "$budget" -gt "$(time_left)" ]; then budget="$(time_left)"; fi
  echo "[queue_r4_2] === $name: $(date -u +%H:%M:%S) (left $(time_left)s, budget ${budget}s) ==="
  wait_tpu || return 1
  timeout "$budget" "$@" > "/root/data/${name}.log" 2>&1
  rc=$?
  echo "[queue_r4_2] $name done rc=$rc at $(date -u +%H:%M:%S)"
  grep -v "WARNING\|cpu_aot\|machine features" "/root/data/${name}.log" | tail -6
}

# 1. HBM streaming bandwidth (cheap, seals the MFU roofline argument).
if [ -s /root/data/hbm_bandwidth.json ]; then
  echo "[queue_r4_2] hbm_probe: results exist, skipping"
else
  stage hbm_probe 1200 python -u scripts/probe_hbm_bandwidth.py \
    --out /root/data/hbm_bandwidth.json
fi

# 2. torus_li multi-trial study: 3 trials x {ffno24@101ep, fno4@500ep,
#    fno4@101ep}, shared seeded dataset; resumable per job via study.json.
#    Validation every 100 epochs (test-at-end is the reported metric;
#    per-epoch 200-trajectory rollouts would double the wall).
stage torus_li 16200 python -u scripts/torus_li_study.py \
  --data-dir /root/data/torus_li --skip-dt-ablation --trials 3 --val-every 100

# 3. k-sweep on the reference-protocol 512^2 dataset (32+8 trajectories,
#    regenerated seeded); one tagged run per k, resumable per epoch.
KDIR=/root/data/kochkov512
for K in 20 5 10 40; do
  NS=$(( 2420 / K ))
  # k=20 runs first and pays the one-off ~37 min data generation.
  BUDGET=2400; [ "$K" = 20 ] && BUDGET=5400
  stage "ksweep_k${K}" "$BUDGET" python -u scripts/quality_campaign.py \
    --data-dir "$KDIR" --n-train 32 --n-test 8 --sim-size 512 \
    --inner 16 --outer 2441 --warmup 357 --dt 8.75e-4 --k "$K" \
    --batch 32 --epochs 10 --eval-every 5 --n-steps "$NS" \
    --precision bf16 --gen-batch 8 --tag "k${K}" --chunk-steps auto
done

# 4. Super-resolution transfer incl. 256^2 from the k=20 sweep checkpoint
#    (30-step rollout horizon like the round-3 table; fresh multi-res
#    test set from the same 512^2 generator).
stage superres 2400 python -u scripts/superres_eval.py \
  --data-dir "$KDIR" --ckpt "$KDIR/runs/k20/last.ckpt" \
  --sizes 32 64 128 256 --sim-size 512 --dt 8.75e-4 --inner 16 \
  --outer 650 --warmup 357 --k 20 --n-steps 30

# 5. Elasticity at the full registry budget on the documented stand-in.
stage elasticity 1800 python -u scripts/elasticity_standin.py \
  --data-dir /root/data/elasticity

# 6. Measured high-res 3D steps; 512^3 runs last inside the stage and
#    writes 256^3 results before attempting it.
stage kol3d_highres 1800 python -u scripts/kol3d_highres.py \
  --results /root/data/kol3d/kol3d_results.json

echo "[queue_r4_2] all stages complete $(date -u +%H:%M:%S)"
