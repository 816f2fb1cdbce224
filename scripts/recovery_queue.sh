#!/bin/bash
# Waits for the TPU relay to recover, then runs the queued chip work:
#  1. 2048^2 native-resolution generation smoke (validates the one-step
#     calibration probe at the reference's own sim grid)
#  2. 96-trajectory (3x reference data) 512^2 campaign
#  3. final bench.py
# Each stage logs under /root/data/.
export PYTHONPATH=/root/repo:/root/.axon_site

echo "[queue] waiting for TPU..."
healthy=0
for i in $(seq 1 40); do
  if timeout 120 python -c "
import jax, jax.numpy as jnp
y = jax.jit(lambda a: a@a)(jnp.ones((1024,1024), jnp.bfloat16))
print('tpu ok', float(y[0,0]))" >/dev/null 2>&1; then
    echo "[queue] TPU healthy after attempt $i"
    healthy=1
    break
  fi
  echo "[queue] attempt $i: still down; sleeping 600s"
  sleep 600
done
if [ "$healthy" != 1 ]; then
  echo "[queue] TPU never recovered; aborting without running stages" >&2
  exit 1
fi

echo "[queue] === stage 1: 2048^2 smoke ==="
timeout 3600 python - <<'EOF'
import sys
sys.path.insert(0, "/root/repo")
from fourierflow_tpu.commands.generate import kolmogorov
kolmogorov("/root/data/kochkov2048/smoke.yaml")
import h5py, numpy as np
for s in (256, 64, 32):
    with h5py.File(f"/root/data/kochkov2048/smoke_{s}_1.h5") as f:
        w = f["vorticity"][...]
        print("out", s, w.shape, "max|w|", float(np.abs(w).max()),
              "evolves", float(np.abs(w[0,1]-w[0,0]).max()) > 1e-3, flush=True)
EOF

echo "[queue] === stage 2: 96-trajectory campaign ==="
python scripts/quality_campaign.py --data-dir /root/data/kochkov512x96 \
  --n-train 96 --n-test 8 --sim-size 512 --inner 16 --outer 2441 \
  --warmup 357 --dt 8.75e-4 --k 20 --batch 32 --epochs 10 --eval-every 2 \
  --n-steps 121 --precision bf16 --tag ffno_ref --gen-batch 8 \
  --chunk-steps auto

echo "[queue] === stage 3: final bench ==="
timeout 900 python /root/repo/bench.py

echo "[queue] all done"
