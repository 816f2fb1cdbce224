#!/bin/bash
# Round-3 master chip queue (v4): reprioritized for the remaining round
# wall-clock. The torus_li study (r3_queue2 stage 3) is mid trial-0; this
# queue lets the trial-0 pair (ffno24 + fno4) finish, stops the study
# before it sinks hours into trials 1-2, then runs the two VERDICT
# "missing" items (3D-on-chip, LI full budget — both fixed since their
# r3_queue2 failures), then torus_vis full-depth, and only then resumes
# the extra torus_li trials with whatever time remains before DEADLINE.
#
# Launch detached:
#   setsid nohup bash scripts/r3_queue4.sh <study_pid> > /root/data/queue4.log 2>&1 &
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo

STUDY_PID="${1:-}"
STUDY_JSON=/root/data/torus_li/study.json
# Past DEADLINE no new stage starts, leaving the chip quiet for the
# driver's bench run at round end. Round 3 began ~09:40 UTC with a ~12h
# budget (ends ~21:40); 20:30 leaves >1h of margin for the bench run.
DEADLINE="${DEADLINE:-$(date -u -d 'today 20:30' +%s)}"

time_left() { echo $(( DEADLINE - $(date +%s) )); }

# --- Phase A: wait for the trial-0 pair, then stop the study ------------
if [ -n "$STUDY_PID" ]; then
  echo "[queue4] waiting for torus_li trial-0 pair (study pid $STUDY_PID)"
  while kill -0 "$STUDY_PID" 2>/dev/null; do
    if python - "$STUDY_JSON" <<'EOF'
import json, sys
try:
    r = json.load(open(sys.argv[1]))
except Exception:
    sys.exit(1)
sys.exit(0 if "ffno24_trial0" in r and "fno4_trial0" in r else 1)
EOF
    then
      echo "[queue4] trial-0 pair recorded; stopping study pid $STUDY_PID"
      kill "$STUDY_PID" 2>/dev/null
      sleep 10
      kill -9 "$STUDY_PID" 2>/dev/null
      break
    fi
    sleep 60
  done
  # Give a killed TPU client a moment to release the relay.
  sleep 30
fi

wait_tpu() {
  for i in $(seq 1 40); do
    if timeout 120 python -c "
import jax, jax.numpy as jnp
y = jax.jit(lambda a: a@a)(jnp.ones((1024,1024), jnp.bfloat16))
print('tpu ok', float(y[0,0]))" >/dev/null 2>&1; then
      echo "[queue4] TPU healthy (attempt $i)"
      return 0
    fi
    echo "[queue4] attempt $i: TPU down; sleeping 300s"
    sleep 300
  done
  echo "[queue4] TPU never recovered" >&2
  return 1
}

stage() {
  name="$1"; budget="$2"; shift 2
  if [ "$(time_left)" -lt 600 ]; then
    echo "[queue4] skipping $name: past deadline"
    return 1
  fi
  # Never let a stage outlive the deadline: cap its budget at time_left.
  if [ "$budget" -gt "$(time_left)" ]; then budget="$(time_left)"; fi
  echo "[queue4] === $name: $(date -u +%H:%M:%S) (left $(time_left)s) ==="
  wait_tpu || return 1
  timeout "$budget" "$@" > "/root/data/${name}.log" 2>&1
  rc=$?
  echo "[queue4] $name done rc=$rc at $(date -u +%H:%M:%S)"
  grep -v "WARNING\|cpu_aot\|machine features" "/root/data/${name}.log" | tail -5
}

# 1. 3D Kolmogorov (fixed: jitted IC build, real-pair spectral filter).
stage kol3d 2400 python -u scripts/kolmogorov_3d_chip.py --data-dir /root/data/kol3d

# 2. LI at the reference's full budget (fixed: limit_train_batches 4000 =
#    the 40k-step reference budget, grad clip 1.0, per-epoch checkpoints).
stage li_ref2 7200 python -u scripts/learned_interp_reference.py \
  --data-dir /root/data/li_ref2 --train-frames 600

# 3. torus_vis / torus_vis_force full-depth conditioning study.
stage torus_vis 7200 python -u scripts/torus_vis_study.py --data-dir /root/data/torus_vis

# 4. Remaining torus_li trials (resumable; skips completed jobs).
stage torus_li_more "$(( $(time_left) > 600 ? $(time_left) : 600 ))" \
  python -u scripts/torus_li_study.py --data-dir /root/data/torus_li --skip-dt-ablation

echo "[queue4] all stages complete $(date -u +%H:%M:%S)"
