#!/bin/bash
# Round-4 queue part 1: the two cheapest/highest-priority VERDICT r3 items
# that resume committed round-3 state —
#   1. finish the learned-interpolation reference run 16k -> 40k steps
#      (VERDICT r3 #1), with the new fine-cadence rho(t) final eval;
#   2. finish torus_vis/03_no_mu_force epochs 9-10 + test (VERDICT r3 #3).
# Part 2 (scripts/r4_queue2.sh) carries the multi-trial torus_li study,
# the k-sweep, super-res 256^2, elasticity, 3D 256^3, and the HBM probe.
#
# Launch detached:
#   setsid nohup bash scripts/r4_queue1.sh > /root/data/queue_r4_1.log 2>&1 &
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo
mkdir -p /root/data

# Round 4 began ~09:40 UTC with a ~12h budget (ends ~21:40); 20:30 leaves
# >1h of quiet chip for the driver's bench run. Fail fast on a stale
# deadline (ADVICE r3: a silently-negative time_left skipped every stage).
DEADLINE="${DEADLINE:-$(date -u -d 'today 20:30' +%s)}"
if [ $(( DEADLINE - $(date +%s) )) -le 0 ]; then
  echo "[queue_r4_1] FATAL: DEADLINE ($(date -u -d @${DEADLINE})) is in the past;" \
       "set DEADLINE=<epoch seconds> explicitly" >&2
  exit 1
fi

time_left() { echo $(( DEADLINE - $(date +%s) )); }

wait_tpu() {
  for i in $(seq 1 20); do
    if timeout 120 python -c "
import jax, jax.numpy as jnp
y = jax.jit(lambda a: a@a)(jnp.ones((1024,1024), jnp.bfloat16))
print('tpu ok', float(y[0,0]))" >/dev/null 2>&1; then
      echo "[queue_r4_1] TPU healthy (attempt $i)"
      return 0
    fi
    echo "[queue_r4_1] attempt $i: TPU down; sleeping 240s"
    sleep 240
  done
  echo "[queue_r4_1] TPU never recovered" >&2
  return 1
}

# Stage with a wedged-compile watchdog: if the Trainer's first-step
# "compile done" marker hasn't appeared within $3 seconds of the n_params
# line, kill the stage (a wedged relay compile looks exactly like silent
# training from outside — verify skill, round-3 lesson).
stage_watchdogged() {
  name="$1"; budget="$2"; wedge_limit="$3"; shift 3
  if [ "$(time_left)" -lt 600 ]; then
    echo "[queue_r4_1] skipping $name: past deadline"
    return 1
  fi
  if [ "$budget" -gt "$(time_left)" ]; then budget="$(time_left)"; fi
  echo "[queue_r4_1] === $name: $(date -u +%H:%M:%S) (left $(time_left)s, budget ${budget}s) ==="
  wait_tpu || return 1
  : > "/root/data/${name}.log"
  timeout "$budget" "$@" > "/root/data/${name}.log" 2>&1 &
  pid=$!
  waited=0
  while kill -0 "$pid" 2>/dev/null; do
    if grep -q "compile done" "/root/data/${name}.log" 2>/dev/null; then
      break
    fi
    if grep -q "n_params" "/root/data/${name}.log" 2>/dev/null; then
      waited=$(( waited + 60 ))
      if [ "$waited" -ge "$wedge_limit" ]; then
        echo "[queue_r4_1] $name: no compile marker after ${waited}s; killing (wedge)"
        kill "$pid" 2>/dev/null; sleep 10; kill -9 "$pid" 2>/dev/null
        return 1
      fi
    fi
    sleep 60
  done
  wait "$pid"
  rc=$?
  echo "[queue_r4_1] $name done rc=$rc at $(date -u +%H:%M:%S)"
  grep -v "WARNING\|cpu_aot\|machine features" "/root/data/${name}.log" | tail -6
}

# 1. LI reference run, 16k -> 40k steps (resume; data + ckpt on disk from
#    round 3). ~24 x 1000-step epochs at ~180 s each + fine rho(t) eval.
stage_watchdogged li_finish 7200 1500 \
  python -u scripts/learned_interp_reference.py \
  --data-dir /root/data/li_ref --train-frames 600 \
  --steps-per-epoch 1000 --epochs 40 --val-every 5 --resume

# 2. torus_vis/03 epochs 9-10 + final test (resumes the committed
#    last.ckpt under torus_vis/03_no_mu_force/checkpoints/).
stage_watchdogged vis03 1500 900 \
  python -u scripts/torus_vis_finish03.py --data-dir /root/data/torus_vis

echo "[queue_r4_1] all stages complete $(date -u +%H:%M:%S)"
