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


def _load_dotenv():
    """Auto-load ``.env`` from the working directory into os.environ
    (reference:fourierflow/__init__.py:1-2 via python-dotenv; here a
    dependency-free parser). Existing variables are never overridden."""
    import os

    path = os.path.join(os.getcwd(), ".env")
    if not os.path.exists(path):
        return
    try:
        with open(path) as f:
            for line in f:
                line = line.strip()
                if not line or line.startswith("#") or "=" not in line:
                    continue
                key, _, value = line.partition("=")
                key = key.strip()
                value = value.strip().strip("'\"")
                os.environ.setdefault(key, value)
    except OSError:
        pass


_load_dotenv()
