#!/bin/bash
# Round-3b queue v6: li_ref recovery. The first li_ref attempt wedged the
# relay inside the first train-step compile (forward-only control rollout
# compiled fine; the fwd+bwd compile RPC never returned — same signature
# as the round-2 "relay fault mid-compile"). This queue retries with
# restartable 1000-step epochs (identical 40k-step protocol semantics:
# the LR schedule is step-based), falls back to unroll 8 if the retry
# makes no progress, then runs the trimmed torus_vis study.
#
# Launch detached:
#   setsid nohup bash scripts/r3_queue6.sh > /root/data/queue6.log 2>&1 &
export PYTHONPATH=/root/repo:/root/.axon_site
# Persistent compile cache: if the axon PJRT compile path honors it, the
# retry skips recompiling the unchanged control/valid rollouts. Inert if
# unsupported.
export JAX_COMPILATION_CACHE_DIR=/root/data/.jax_cache
cd /root/repo
mkdir -p /root/data

DEADLINE="${DEADLINE:-$(date -u -d 'today 04:40' +%s)}"

time_left() { echo $(( DEADLINE - $(date +%s) )); }

wait_tpu() {
  for i in $(seq 1 20); do
    if timeout 120 python -c "
import jax, jax.numpy as jnp
y = jax.jit(lambda a: a@a)(jnp.ones((1024,1024), jnp.bfloat16))
print('tpu ok', float(y[0,0]))" >/dev/null 2>&1; then
      echo "[queue6] TPU healthy (attempt $i)"
      return 0
    fi
    echo "[queue6] attempt $i: TPU down; sleeping 180s"
    sleep 180
  done
  echo "[queue6] TPU never recovered" >&2
  return 1
}

stage() {
  name="$1"; budget="$2"; shift 2
  if [ "$(time_left)" -lt 600 ]; then
    echo "[queue6] skipping $name: past deadline"
    return 1
  fi
  if [ "$budget" -gt "$(time_left)" ]; then budget="$(time_left)"; fi
  echo "[queue6] === $name: $(date -u +%H:%M:%S) (left $(time_left)s, budget ${budget}s) ==="
  wait_tpu || return 1
  timeout "$budget" "$@" > "/root/data/${name}.log" 2>&1
  rc=$?
  echo "[queue6] $name done rc=$rc at $(date -u +%H:%M:%S)"
  grep -v "WARNING\|cpu_aot\|machine features" "/root/data/${name}.log" | tail -5
}

# 1. li_ref retry at the reference protocol, restartable epochs. Data from
#    the first attempt is on disk and is skipped by the generator. A
#    watchdog kills the stage if the train-step compile marker (logged by
#    the Trainer after the first step's value fetch) hasn't appeared
#    within 1500s of the data/control phase completing — a second wedge
#    then costs ~25 min, not the whole budget.
li_retry_watchdogged() {
  if [ "$(time_left)" -lt 600 ]; then
    echo "[queue6] skipping li_retry: past deadline"; return 1
  fi
  budget=3300
  if [ "$budget" -gt "$(time_left)" ]; then budget="$(time_left)"; fi
  echo "[queue6] === li_retry: $(date -u +%H:%M:%S) (left $(time_left)s, budget ${budget}s) ==="
  wait_tpu || return 1
  timeout "$budget" python -u scripts/learned_interp_reference.py \
    --data-dir /root/data/li_ref --train-frames 600 \
    --steps-per-epoch 1000 --epochs 40 --val-every 5 \
    > /root/data/li_retry.log 2>&1 &
  pid=$!
  waited=0
  while kill -0 "$pid" 2>/dev/null; do
    if grep -q "compile done" /root/data/li_retry.log 2>/dev/null; then
      break
    fi
    # Only start the wedge clock once the run reaches training (the
    # n_params line follows data load + control eval).
    if grep -q "n_params" /root/data/li_retry.log 2>/dev/null; then
      waited=$(( waited + 60 ))
      if [ "$waited" -ge 1500 ]; then
        echo "[queue6] li_retry: no compile marker after ${waited}s; killing (wedge)"
        kill "$pid" 2>/dev/null; sleep 10; kill -9 "$pid" 2>/dev/null
        return 1
      fi
    fi
    sleep 60
  done
  wait "$pid"
  rc=$?
  echo "[queue6] li_retry done rc=$rc at $(date -u +%H:%M:%S)"
  grep -v "WARNING\|cpu_aot\|machine features" /root/data/li_retry.log | tail -5
}
li_retry_watchdogged

# 2. Fallback only if the retry produced zero completed epochs: the
#    round-2-proven unroll-8 configuration at the full validation protocol
#    (deviation documented in RESULTS if used).
if [ ! -s /root/data/li_ref/epochs.jsonl ]; then
  stage li_unroll8 2400 python -u scripts/learned_interp_reference.py \
    --data-dir /root/data/li_ref --train-frames 600 --unroll 8 \
    --steps-per-epoch 1000 --epochs 40 --val-every 5
fi

# 3. torus_vis / torus_vis_force full-depth conditioning study, trimmed
#    to the remaining wall-clock.
stage torus_vis "$(( $(time_left) > 600 ? $(time_left) : 600 ))" \
  python -u scripts/torus_vis_study.py --data-dir /root/data/torus_vis \
  --n-train 100 --n-eval 20 --gen-batch 20 --val-every 5

echo "[queue6] all stages complete $(date -u +%H:%M:%S)"
