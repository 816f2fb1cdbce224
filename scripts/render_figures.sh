#!/bin/bash
# Render the paper-style figures from the measured campaign/sweep
# artifacts (CPU-only; all inputs are local logs/JSON written by the
# on-chip jobs — quality_campaign.py tags, stepsize_dns.py,
# inference_timing.py). Safe to re-run; skips figures whose inputs are
# missing.
set -u
cd "$(dirname "$0")/.."
export JAX_PLATFORMS=cpu
OUT=${1:-figures}
K512=${K512:-/root/data/kochkov512}
SSDNS=${SSDNS:-/root/data/stepsize_dns/stepsize_dns.json}
mkdir -p "$OUT"
run() { echo "== $*"; python -m fourierflow_tpu.commands "$@" || echo "   (skipped: inputs missing)"; }

# Architecture ablation: correlation curves per model family
run plot correlation --root "$K512/runs" --out-path "$OUT/correlation.png"

# Noise-injection ablation (reference's noise_std sweep)
noise_inputs=()
for pair in "0.0=noise_00" "0.01=ffno_ref" "0.03=noise_003" "0.1=noise_01"; do
  v=${pair%%=*}; tag=${pair#*=}
  log="$K512/runs/$tag/campaign_log.jsonl"
  [ -f "$log" ] && noise_inputs+=("$v=$log")
done
if [ ${#noise_inputs[@]} -ge 2 ]; then
  run plot ablation --inputs "${noise_inputs[@]}" --xlabel "noise std" \
      --out-path "$OUT/noise_ablation.png"
fi

# Varying step size: F-FNO k-sweep + DNS dt-multiple line
ss_inputs=()
for pair in "0.07=k5" "0.14=k10" "0.28=ffno_ref" "0.56=k40"; do
  v=${pair%%=*}; tag=${pair#*=}
  log="$K512/runs/$tag/campaign_log.jsonl"
  [ -f "$log" ] && ss_inputs+=("$v=$log")
done
if [ ${#ss_inputs[@]} -ge 2 ] && [ -f "$SSDNS" ]; then
  run plot stepsize "$SSDNS" --inputs "${ss_inputs[@]}" \
      --out-path "$OUT/stepsize.png"
fi

# Inference performance tradeoff (DNS baselines from RESULTS.md)
if [ -f "$K512/runs/inference_times.jsonl" ]; then
  run plot tradeoff "$K512" --out-path "$OUT/tradeoff.png" \
      --inputs "DNS 64²=0.0011" "DNS 512²=1.39"
fi

# Super-resolution transfer (from the recorded superres eval)
[ -f "$K512/superres/superres_results.json" ] && \
  run plot superresolution "$K512/superres/superres_results.json" \
      --out-path "$OUT/superresolution.png"

echo "figures in $OUT/"
ls -la "$OUT" | tail -n +2
