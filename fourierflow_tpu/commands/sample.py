"""``sample`` command: run test and pickle one (batch, prediction) pair —
the raw material for paper figures (equivalent of
reference:fourierflow/commands/sample.py).
"""

import logging
import os
import pickle
from typing import List, Optional

import jax
import numpy as np

from ..config import instantiate, load_config
from .train import build_routine

logger = logging.getLogger(__name__)

__all__ = ["main"]


def main(
    config_path: str,
    checkpoint_path: Optional[str] = None,
    overrides: Optional[List[str]] = None,
    trial: int = 0,
    out_path: Optional[str] = None,
):
    cfg = load_config(config_path, overrides)
    builder = instantiate(cfg["builder"])
    routine = build_routine(cfg["routine"], builder)

    state = routine.init(jax.random.PRNGKey(7231 + trial), builder.sample_batch())
    if checkpoint_path:
        from ..trainers.callbacks import load_state

        state = load_state(checkpoint_path, state)

    batch = next(builder.test_batches())
    if hasattr(routine, "rollout") and "data" in batch:
        preds, _, _ = jax.jit(routine.rollout)(state, batch)
    else:
        logs = jax.jit(routine.valid_step)(state, batch)
        preds = logs.get("preds", logs)
    preds = jax.tree.map(np.asarray, preds)

    if out_path is None:
        base = config_path if os.path.isdir(os.path.dirname(config_path)) else "."
        out_path = os.path.join(os.path.dirname(base) or ".", "sample.pkl")
    with open(out_path, "wb") as f:
        pickle.dump([jax.tree.map(np.asarray, batch), preds], f)
    logger.info("wrote %s", out_path)
    return out_path
