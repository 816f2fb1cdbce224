#!/usr/bin/env bash
# Canonical experiment sweep (equivalent of reference:scripts/run_all.sh).
# Every name resolves from the built-in registry; add trailing key=value
# overrides as needed. Assumes datasets under $DATA_ROOT (see README Data).
set -euo pipefail
CMD="python -m fourierflow_tpu.commands"

# --- torus_li: F-FNO depth sweep + original-FNO baselines ---------------
for n in 4 8 12 16 20 24; do
  $CMD train "torus_li/markov/${n}_layers"
  $CMD train "torus_li/zongyi/${n}_layers"
done

# --- torus_li ablations (at 24 layers) -----------------------------------
for a in no_sharing shared_fork all_weights_shared learn_difference \
         no_positional_features with_velocity shuffle_xy_grid \
         no_factorization no_factorization_shared_weights \
         no_factorization_shared_all zongyi_markov teacher_forcing; do
  $CMD train "torus_li/ablation/${a}/24_layers"
done

# --- Geo-FNO benchmarks ---------------------------------------------------
for task in airfoil pipe elasticity plasticity; do
  for variant in ffno geo-fno; do
    $CMD train "${task}/${variant}/4_layers" || true  # pipe has no fcno etc.
  done
done

# --- Kolmogorov (torus_kochkov) -------------------------------------------
for size in 64 128 256; do
  $CMD train "torus_kochkov/ffno/grid_sizes/${size}"
done
$CMD train torus_kochkov/learned_interpolation/rollout/x64

# --- MeshGraphNets ---------------------------------------------------------
$CMD train cylinder_flow/baseline

# --- Super-resolution evaluation (train at 64, test across grids) ---------
for grid in 32 64 128 256; do
  $CMD test "torus_kochkov/ffno/superresolution/train_with_x64/${grid}"
done
