"""``export`` command: serialize the flagship rollout for serving.

No reference analog (the reference serves from a live Lightning process);
this produces a self-contained StableHLO artifact — weights + normalizer
baked in, the autoregressive rollout a single scanned XLA program — that a
serving host runs with ``fourierflow_tpu.utils.serving.load_exported``
(or any StableHLO runtime) without the framework installed.
"""

import logging
from typing import List, Optional

import jax

from ..config import instantiate, load_config
from .train import build_routine

logger = logging.getLogger(__name__)

__all__ = ["main"]


def main(
    config_path: str,
    out_path: str,
    checkpoint_path: Optional[str] = None,
    torch_checkpoint: Optional[str] = None,
    overrides: Optional[List[str]] = None,
    n_steps: int = 20,
    batch_size: int = 1,
    size: int = 64,
    platforms: Optional[List[str]] = None,
    trial: int = 0,
    precision: Optional[str] = None,
):
    from ..utils.serving import export_rollout, load_exported

    cfg = load_config(config_path, overrides)
    builder = instantiate(cfg["builder"])
    routine = build_routine(cfg["routine"], builder)
    state = routine.init(jax.random.PRNGKey(7231 + trial), builder.sample_batch())
    if checkpoint_path:
        from ..trainers.callbacks import load_state

        state = load_state(checkpoint_path, state)
    if torch_checkpoint:
        from ..utils.torch_import import import_reference_checkpoint

        state = import_reference_checkpoint(torch_checkpoint, state)

    path = export_rollout(
        routine, state, out_path,
        n_steps=n_steps, batch_size=batch_size, size=size, platforms=platforms,
        precision=precision,
    )
    # Smoke-load the artifact so a broken export fails here, not at serve
    # time.
    fn = load_exported(path)
    logger.info("artifact loads; in_avals=%s", getattr(fn, "in_avals", "(jitted)"))
    print({"out_path": path, "n_steps": n_steps, "batch_size": batch_size, "size": size})
    return path
