"""``train`` command: config-driven experiment runner.

TPU-native equivalent of reference:fourierflow/commands/train.py:26-148:
loads an experiment YAML (the reference Hydra schema: wandb / builder /
routine / trainer / callbacks), seeds with 7231+trial, trains, tests with
the best checkpoint, and measures inference time.
"""

import logging
import os
import time
from typing import List, Optional

import jax
import numpy as np

from ..config import instantiate, load_config
from ..routines.base import make_optimizer
from ..trainers import JSONLogger, ModelCheckpoint, Trainer

logger = logging.getLogger(__name__)

__all__ = ["build_routine", "build_trainer", "main"]


def build_routine(routine_cfg: dict, builder=None):
    """Construct a routine from a reference-schema config node, adapting
    torch optimizer/scheduler configs to optax
    (reference routines/base.py:67-77)."""
    cfg = dict(routine_cfg)
    opt_partial = instantiate(cfg.pop("optimizer", None))
    sch_cfg = cfg.pop("scheduler", None)

    opt_info = opt_partial() if callable(opt_partial) else {"kind": "adamw", "lr": 1e-3}
    lr = opt_info.get("lr", 1e-3)
    weight_decay = opt_info.get("weight_decay", 0.0)

    schedule = None
    if sch_cfg is not None:
        node = sch_cfg.get("scheduler", sch_cfg) if isinstance(sch_cfg, dict) else sch_cfg
        sch_partial = instantiate(node)
        if callable(sch_partial):
            kwargs = {}
            if sch_cfg.get("interval") == "epoch" and builder is not None:
                kwargs["steps_per_epoch"] = builder.batches_per_epoch
            try:
                schedule = sch_partial(lr=lr, **kwargs)
            except TypeError:
                schedule = sch_partial(lr)

    optimizer = make_optimizer(
        lr=lr,
        weight_decay=weight_decay,
        schedule=schedule,
        clip_val=cfg.pop("clip_val", None),
        accumulate_grad_batches=cfg.pop("accumulate_grad_batches", 1),
    )
    return instantiate(cfg, optimizer=optimizer)


def build_trainer(trainer_cfg: dict, callbacks=()):
    cfg = dict(trainer_cfg or {})
    limit = cfg.get("limit_train_batches")
    if isinstance(limit, float):
        limit = None if limit >= 1.0 else max(1, int(limit))
    if cfg.get("fast_dev_run"):
        # Reference debug knob (pl.Trainer fast_dev_run): touch one train
        # batch and one validation batch, no checkpointing. Epoch 0 is the
        # normalizer-accumulation pass here, so two epochs = acc + 1 step.
        return Trainer(
            max_epochs=2,
            limit_train_batches=1,
            limit_val_batches=1,
            callbacks=[],
        )
    return Trainer(
        max_epochs=cfg.get("max_epochs", 1),
        limit_train_batches=limit,
        limit_val_batches=cfg.get("limit_val_batches"),
        log_every_n_steps=cfg.get("log_every_n_steps", 100),
        check_val_every_n_epoch=cfg.get("check_val_every_n_epoch", 1),
        callbacks=list(callbacks),
        tensor_parallel=cfg.get("tensor_parallel", 1),
        spatial_parallel=cfg.get("spatial_parallel", 1),
        data_parallel=cfg.get("data_parallel", True),
    )


def resolve_test_state(callbacks, state, trainer=None):
    """State for the post-fit test pass: the best MONITORED checkpoint if
    one was saved, else the final fit state (reference commands/
    train.py:125-131 loads the best checkpoint before trainer.test; with
    monitor=None the last save IS the final state, so nothing to load).
    Weights/normalizer/step only — the test pass needs no optimizer
    state. Skipped under tensor parallelism, where the live state carries
    device shardings a host-side restore would drop."""
    if trainer is not None and getattr(trainer, "tensor_parallel", 1) > 1:
        return state
    for cb in callbacks:
        if (isinstance(cb, ModelCheckpoint) and cb.monitor is not None
                and cb.best_path and os.path.exists(cb.best_path)):
            from ..trainers.callbacks import load_inference_state

            logger.info("testing with best checkpoint %s (%s=%.6g)",
                        cb.best_path, cb.monitor, cb.best)
            return load_inference_state(cb.best_path, state)
    return state


def _is_torch_checkpoint(path: str) -> bool:
    """Torch/Lightning checkpoints are zip archives ('PK') or legacy
    pickles ('\\x80'); native checkpoints are msgpack files or orbax
    directories. Sniffing the format up front keeps load errors
    attributable (a bad native checkpoint must not surface as a torch
    unpickling error)."""
    if os.path.isdir(path):
        return False
    with open(path, "rb") as f:
        magic = f.read(2)
    return magic[:2] == b"PK" or magic[:1] == b"\x80"


class ExistingExperimentFound(RuntimeError):
    """Raised when results for this trial already exist and neither
    ``force`` nor ``resume`` was requested
    (reference utils/path.py:55-72, utils/exceptions.py)."""


def experiment_dir(config_path: str) -> str:
    """Per-experiment directory for run artifacts. For a YAML file this is
    the file's directory (reference semantics: results live next to
    config.yaml, ref commands/train.py). For a registry name the name
    itself is the directory — in the reference every experiment name IS a
    directory (name/config.yaml), so dirname() on a bare name would
    collapse sibling experiments (markov/4_layers and markov/24_layers)
    into one checkpoints tree."""
    p = os.path.abspath(config_path)
    if os.path.isfile(p):
        return os.path.dirname(p)
    return p


def _existing_trial_dirs(config_dir: str, trial: int):
    import glob

    return sorted(glob.glob(os.path.join(config_dir, "checkpoints", f"trial-{trial}-*")))


def main(
    config_path: str,
    overrides: Optional[List[str]] = None,
    trial: int = 0,
    checkpoint_path: Optional[str] = None,
    no_test: bool = False,
    force: bool = False,
    resume: bool = False,
    profile_dir: Optional[str] = None,
    config_dir: Optional[str] = None,
):
    """``config_dir`` overrides the run-artifact directory (default: the
    registry name under CWD / the YAML's directory) — studies use it to
    keep checkpoints on the data disk and budget-ablation variants out of
    the canonical experiment group that ``plot table`` aggregates."""
    cfg = load_config(config_path, overrides)
    seed = 7231 + trial  # reference commands/train.py:56-58
    np.random.seed(seed)

    builder = instantiate(cfg["builder"])
    routine = build_routine(cfg["routine"], builder)
    # Reference debug knob: trainer.track_grad_norm = 2 logs gradient
    # norms (commands/train.py + pl.Trainer); -1/absent disables.
    tgn = (cfg.get("trainer") or {}).get("track_grad_norm")
    if tgn not in (None, -1, False):
        routine.track_grad_norm = True

    config_dir = config_dir or experiment_dir(config_path)
    existing = _existing_trial_dirs(config_dir, trial)
    if existing and not (force or resume or checkpoint_path):
        raise ExistingExperimentFound(
            f"results for trial {trial} already exist under "
            f"{os.path.join(config_dir, 'checkpoints')}; pass --force to "
            f"overwrite or --resume to continue from the last checkpoint"
        )
    if resume and existing and not checkpoint_path:
        # Epoch-granularity resume from the newest last.ckpt
        # (reference commands/train.py:74-79 — mid-epoch resume is
        # unsupported there too).
        for d in reversed(existing):
            cand = os.path.join(d, "last.ckpt")
            if os.path.exists(cand):
                checkpoint_path = cand
                logger.info("resuming from %s", cand)
                break
    run_dir = os.path.join(config_dir, "checkpoints", f"trial-{trial}-{int(time.time())}")

    callbacks = instantiate(cfg.get("callbacks", [])) or []
    has_ckpt = False
    for cb in callbacks:
        if isinstance(cb, ModelCheckpoint):
            cb.dirpath = run_dir
            has_ckpt = True
    if not has_ckpt:
        callbacks.append(ModelCheckpoint(run_dir))
    callbacks.append(JSONLogger(os.path.join(run_dir, "metrics.jsonl")))

    trainer = build_trainer(cfg.get("trainer"), callbacks)
    trainer.seed = seed

    state = None
    if checkpoint_path:
        from ..trainers.callbacks import load_state

        template = routine.init(jax.random.PRNGKey(seed), builder.sample_batch())
        state = load_state(checkpoint_path, template)
    elif cfg.get("pretrained_path"):
        # Fine-tuning from pretrained weights (reference
        # commands/train.py:70-72 / routines/base.py:79-88): load the
        # model weights only — fresh optimizer state, fresh schedule.
        # Accepts this framework's checkpoints or a reference torch
        # Lightning .ckpt (utils/torch_import).
        pretrained = os.path.expandvars(cfg["pretrained_path"])
        if not os.path.exists(pretrained):
            raise FileNotFoundError(f"pretrained_path: {pretrained}")
        template = routine.init(jax.random.PRNGKey(seed), builder.sample_batch())
        if _is_torch_checkpoint(pretrained):
            from ..utils.torch_import import import_reference_checkpoint

            state = import_reference_checkpoint(pretrained, template)
        else:
            from ..trainers.callbacks import load_inference_state

            state = load_inference_state(pretrained, template)
        # weights only: the fine-tuning run keeps its own step counter
        # (fresh optimizer + schedule), like the reference's fresh Trainer
        state = state.replace(step=template.step)
        logger.info("loaded pretrained weights from %s", pretrained)

    if profile_dir:
        # First-class jax.profiler trace around the fit (SURVEY.md §5 —
        # the reference offers wall-clock timing only); view the result
        # with TensorBoard's profile plugin or ui.perfetto.dev.
        from ..utils.profiling import trace

        with trace(profile_dir):
            state = trainer.fit(routine, builder, state=state)
    else:
        state = trainer.fit(routine, builder, state=state)

    if not no_test:
        logs = trainer.test(routine, builder,
                            resolve_test_state(callbacks, state, trainer))
        logger.info("test logs: %s", {k: v for k, v in logs.items() if np.ndim(v) == 0})

    return trainer, state
