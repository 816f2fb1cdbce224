"""``test`` command: evaluate a saved checkpoint on the test split
(reference:fourierflow/commands/test.py:23-96)."""

import logging

import jax
import numpy as np

from ..config import instantiate, load_config
from ..trainers.callbacks import load_state
from .train import build_routine, build_trainer

logger = logging.getLogger(__name__)


def find_checkpoint(config_path: str, trial: int) -> str:
    """Locate the best checkpoint of the newest run for this trial
    (reference test.py globs ``trial-{trial}-*/epoch*.ckpt``)."""
    import glob
    import os

    from .train import experiment_dir

    config_dir = experiment_dir(config_path)
    for pattern in ("best.ckpt", "last.ckpt"):
        paths = sorted(
            glob.glob(os.path.join(config_dir, "checkpoints",
                                   f"trial-{trial}-*", pattern))
        )
        if paths:
            return paths[-1]
    raise FileNotFoundError(
        f"no checkpoint found under {config_dir}/checkpoints/trial-{trial}-*"
    )


def main(config_path, checkpoint_path=None, overrides=None, trial: int = 0,
         torch_checkpoint=None):
    cfg = load_config(config_path, overrides)
    seed = 7231 + trial
    if checkpoint_path is None and torch_checkpoint is None:
        checkpoint_path = find_checkpoint(config_path, trial)
        logger.info("using checkpoint %s", checkpoint_path)
    builder = instantiate(cfg["builder"])
    routine = build_routine(cfg["routine"], builder)
    template = routine.init(jax.random.PRNGKey(seed), builder.sample_batch())
    if torch_checkpoint is not None:
        # Reference Lightning checkpoint (the reference's test command
        # evaluates lightning .ckpt files directly, ref commands/test.py:51-60).
        from ..utils.torch_import import import_reference_checkpoint

        state = import_reference_checkpoint(torch_checkpoint, template)
    else:
        state = load_state(checkpoint_path, template)
    trainer = build_trainer(cfg.get("trainer"))
    logs = trainer.test(routine, builder, state)
    logger.info("test logs: %s", {k: v for k, v in logs.items() if np.ndim(v) == 0})
    return logs
