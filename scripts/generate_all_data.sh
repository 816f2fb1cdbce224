#!/usr/bin/env bash
# Dataset generation sweep (equivalent of the generation workflows in
# reference:README.md:85-120). Large sims: budget per RESULTS.md.
set -euo pipefail
CMD="python -m fourierflow_tpu.commands"

# Torus datasets via the Crank-Nicolson solver (torus_li-style + contextual)
$CMD generate navier-stokes "$DATA_ROOT/zongyi/ns_generated.h5" \
  --s 64 --t 20 --steps 20 --mu 1e-5
$CMD generate navier-stokes "$DATA_ROOT/torus/torus_vis.h5" \
  --s 256 --mu-min 1e-5 --mu-max 1e-4 --force random
$CMD generate navier-stokes "$DATA_ROOT/torus/torus_vis_force.h5" \
  --s 256 --mu-min 1e-5 --mu-max 1e-4 --force random --varying-force

# Kolmogorov Re=1000: initial conditions, then ML trajectories + baselines
for split in train valid test; do
  $CMD generate kolmogorov "data/kolmogorov/re_1000/initial_conditions/${split}"
  $CMD generate kolmogorov "data/kolmogorov/re_1000/trajectories/${split}"
done
for size in 32 64 128 256 512 1024; do
  $CMD generate kolmogorov "data/kolmogorov/re_1000/baselines/${size}"
done

# 3D (projection method) and method comparisons
$CMD generate kolmogorov data/kolmogorov/three_dimensions/initial_conditions/test
$CMD generate kolmogorov data/kolmogorov/three_dimensions/trajectories/test
$CMD generate kolmogorov data/kolmogorov/compare_methods/drag/spectral
$CMD generate kolmogorov data/kolmogorov/compare_methods/drag/projection
