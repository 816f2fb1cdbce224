"""fourierflow_tpu: a TPU-native Factorized Fourier Neural Operator framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
``alasdairtran/fourierflow`` (the official F-FNO code, ICLR 2023), designed
TPU-first:

- the factorized spectral convolution is expressed as truncated-DFT matmuls
  that map directly onto the MXU (with an XLA-FFT fallback for large grids),
  optionally fused into Pallas kernels;
- training/eval loops are pure functions under ``jax.jit`` with
  ``lax.scan`` rollouts;
- scaling uses ``jax.sharding.Mesh`` + NamedSharding (batch-data-parallel by
  default, spatial sharding for very large generation grids);
- the Kolmogorov data pipeline is a native pseudo-spectral solver (no
  jax-cfd dependency).

Reference parity map lives in SURVEY.md at the repo root; docstrings cite
reference files as ``reference:<path>:<lines>``.
"""

__version__ = "0.1.0"
