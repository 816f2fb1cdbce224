"""Config system: YAML + ``_target_`` instantiation, compatible with the
reference's Hydra-based experiment schema.

The reference wires everything from YAML via hydra.utils.instantiate with
OmegaConf resolvers (reference:fourierflow/__init__.py:20-24,
commands/train.py:38-41). This is a dependency-light reimplementation that
accepts the reference's config files nearly unchanged:

- ``${oc.env:VAR}`` / ``${oc.env:VAR,default}`` env interpolation
- ``${eval: expr}`` arithmetic (math namespace)
- ``${import: dotted.path}`` constants
- ``${get_method: dotted.path}`` callables
- ``_target_`` class/function instantiation with recursive kwargs,
  ``_args_`` positionals, and ``functools.partial`` support
- dotted-path CLI overrides (``routine.conv.n_layers=8``)

Reference ``_target_`` names (``fourierflow.*``, ``torch.optim.*``,
lightning callbacks) are translated to their TPU-native equivalents via
``TARGET_TRANSLATION``.
"""

import ast
import importlib
import math
import os
import re
from functools import partial
from typing import Any, Dict, List, Optional

import yaml

__all__ = ["load_config", "instantiate", "import_string", "apply_overrides"]


class _YamlLoader(yaml.SafeLoader):
    """SafeLoader with YAML 1.2 float semantics: ``1e-3`` parses as a
    float, not a string. PyYAML implements YAML 1.1, whose float regex
    requires a dot before the exponent — but the reference's configs (and
    OmegaConf, which they were written for) use bare scientific notation
    everywhere (e.g. ``viscosity: 1e-3`` in every data/kolmogorov YAML),
    so reference YAML files must load with the 1.2 rule here."""


_YamlLoader.add_implicit_resolver(
    "tag:yaml.org,2002:float",
    re.compile(
        r"""^(?:
            [-+]?(?:[0-9][0-9_]*)\.[0-9_]*(?:[eE][-+]?[0-9]+)?
           |[-+]?(?:[0-9][0-9_]*)(?:[eE][-+]?[0-9]+)
           |\.[0-9][0-9_]*(?:[eE][-+]?[0-9]+)?
           |[-+]?\.(?:inf|Inf|INF)
           |\.(?:nan|NaN|NAN))$""",
        re.X,
    ),
    list("-+0123456789."),
)


TARGET_TRANSLATION = {
    # builders
    "fourierflow.builders.NSMarkovBuilder": "fourierflow_tpu.builders.NSMarkovBuilder",
    "fourierflow.builders.NSZongyiBuilder": "fourierflow_tpu.builders.NSZongyiBuilder",
    "fourierflow.builders.NSContextualBuilder": "fourierflow_tpu.builders.NSContextualBuilder",
    "fourierflow.builders.KolmogorovBuilder": "fourierflow_tpu.builders.KolmogorovBuilder",
    "fourierflow.builders.ElasticityBuilder": "fourierflow_tpu.builders.ElasticityBuilder",
    "fourierflow.builders.StructuredMesh2DBuilder": "fourierflow_tpu.builders.StructuredMesh2DBuilder",
    "fourierflow.builders.PlasticityBuilder": "fourierflow_tpu.builders.PlasticityBuilder",
    # models
    "fourierflow.modules.FNOFactorized2DBlock": "fourierflow_tpu.models.FNOFactorized2DBlock",
    "fourierflow.modules.FNOZongyi2DBlock": "fourierflow_tpu.models.FNOZongyi2DBlock",
    "fourierflow.modules.FNOFactorizedMesh2D": "fourierflow_tpu.models.FNOFactorizedMesh2D",
    "fourierflow.modules.FNOFactorizedMesh3D": "fourierflow_tpu.models.FNOFactorizedMesh3D",
    "fourierflow.modules.FNOFactorizedPointCloud2D": "fourierflow_tpu.models.FNOFactorizedPointCloud2D",
    "fourierflow.modules.CNOFactorized2DBlock": "fourierflow_tpu.models.CNOFactorized2DBlock",
    "fourierflow.modules.FNOPlus2DBlock": "fourierflow_tpu.models.FNOPlus2DBlock",
    "fourierflow.modules.IPhi": "fourierflow_tpu.models.IPhi",
    # routines
    "fourierflow.routines.Grid2DMarkovExperiment": "fourierflow_tpu.routines.Grid2DMarkovRoutine",
    "fourierflow.routines.Grid2DRolloutExperiment": "fourierflow_tpu.routines.Grid2DRolloutRoutine",
    "fourierflow.routines.PointCloudExperiment": "fourierflow_tpu.routines.PointCloudRoutine",
    "fourierflow.routines.StructuredMeshExperiment": "fourierflow_tpu.routines.StructuredMeshRoutine",
    # optimizers / schedulers (adapted, see commands/train.py)
    "torch.optim.AdamW": "fourierflow_tpu.config._adamw_config",
    "torch.optim.Adam": "fourierflow_tpu.config._adam_config",
    "fourierflow.schedulers.CosineWithWarmupScheduler": "fourierflow_tpu.schedulers.cosine_with_warmup",
    "fourierflow.schedulers.LinearWithWarmupScheduler": "fourierflow_tpu.schedulers.linear_with_warmup",
    "fourierflow.schedulers.ExponentialWithWarmupScheduler": "fourierflow_tpu.schedulers.exponential_with_warmup",
    "torch.optim.lr_scheduler.StepLR": "fourierflow_tpu.schedulers.step_lr",
    # kolmogorov pipeline (jax-cfd targets -> native equivalents)
    "fourierflow.utils.Grid": "fourierflow_tpu.utils.Grid",
    "fourierflow.utils.equations.NavierStokes2D": "fourierflow_tpu.utils.equations.NavierStokes2D",
    "jax_cfd.spectral.time_stepping.crank_nicolson_rk4": "fourierflow_tpu.utils.equations.crank_nicolson_rk4",
    "jax_cfd.base.equations.stable_time_step": "fourierflow_tpu.utils.equations.stable_time_step",
    "jax_cfd.base.equations.semi_implicit_navier_stokes": "fourierflow_tpu.utils.finite_volume.semi_implicit_navier_stokes",
    "jax_cfd.base.grids.Grid": "fourierflow_tpu.utils.Grid",
    "jax_cfd.base.forcings.simple_turbulence_forcing": "fourierflow_tpu.utils.forcings.simple_turbulence_forcing",
    "jax_cfd.base.time_stepping.classic_rk4": "fourierflow_tpu.utils.finite_volume.classic_rk4",
    "jax_cfd.base.time_stepping.forward_euler": "fourierflow_tpu.utils.finite_volume.forward_euler",
    "fourierflow.utils.forcings.kolmogorov_forcing_fn": "fourierflow_tpu.utils.forcings.kolmogorov_forcing_fn",
    "fourierflow.builders.kolmogorov.downsample_vorticity": "fourierflow_tpu.builders.kolmogorov.downsample_vorticity_snapshot",
    "fourierflow.builders.kolmogorov.downsample_velocity": "fourierflow_tpu.builders.kolmogorov.downsample_velocity_snapshot",
    "fourierflow.builders.KolmogorovTorchDataset": "fourierflow_tpu.builders.kolmogorov.KolmogorovMarkovDataset",
    "fourierflow.builders.kolmogorov.KolmogorovTorchDataset": "fourierflow_tpu.builders.kolmogorov.KolmogorovMarkovDataset",
    "fourierflow.builders.kolmogorov.KolmogorovTrajectoryDataset": "fourierflow_tpu.builders.kolmogorov.KolmogorovTrajectoryDataset",
    # callbacks
    "fourierflow.callbacks.CustomModelCheckpoint": "fourierflow_tpu.trainers.ModelCheckpoint",
    # lightning-only callbacks: dropped at instantiation
    "pytorch_lightning.callbacks.LearningRateMonitor": None,
    "pytorch_lightning.callbacks.ModelSummary": None,
}


def _adamw_config(lr=1e-3, weight_decay=1e-4, **kw):
    """Marker carrying AdamW hyperparams; resolved together with the
    scheduler in commands/train.py."""
    return {"kind": "adamw", "lr": lr, "weight_decay": weight_decay, **kw}


def _adam_config(lr=1e-3, **kw):
    return {"kind": "adam", "lr": lr, **kw}


def import_string(path: str):
    """Import ``pkg.mod.attr`` (reference:fourierflow/utils/path.py)."""
    module_path, _, attr = path.rpartition(".")
    if not module_path:
        raise ImportError(f"cannot import {path!r}")
    module = importlib.import_module(module_path)
    return getattr(module, attr)


_EVAL_NS = {"pi": math.pi, "e": math.e, "math": math}
_INTERP_RE = re.compile(r"\$\{([^{}]+)\}")


def _resolve_value(expr: str, root: Optional[Dict] = None) -> Any:
    expr = expr.strip()
    if expr.startswith("oc.env:"):
        body = expr[len("oc.env:") :]
        if "," in body:
            var, default = body.split(",", 1)
            return os.environ.get(var.strip(), default.strip())
        val = os.environ.get(body.strip())
        if val is None:
            raise KeyError(f"environment variable {body!r} not set")
        return val
    if expr.startswith("eval:"):
        return eval(expr[len("eval:") :], {"__builtins__": {}}, dict(_EVAL_NS))
    if expr.startswith("import:"):
        return import_string(expr[len("import:") :].strip())
    if expr.startswith("get_method:"):
        return expr  # kept symbolic; resolved at instantiation
    # OmegaConf-style reference to another config node (e.g. ${sim_grid},
    # ${domain}, ${a.b.c}).
    if root is not None:
        node: Any = root
        for part in expr.split("."):
            if isinstance(node, dict) and part in node:
                node = node[part]
            else:
                node = None
                break
        if node is not None:
            return _interpolate(node, root)
    raise ValueError(f"unknown resolver in ${{{expr}}}")


def _resolve_str(s: str, root: Optional[Dict]) -> Any:
    """Resolve a string with possibly-nested ${...} interpolations,
    innermost first (e.g. ``${eval:2 * ${import:numpy.pi}}``)."""
    for _ in range(10):
        m = _INTERP_RE.fullmatch(s.strip())
        if m:
            return _resolve_value(m.group(1), root)
        if not _INTERP_RE.search(s):
            return s
        s = _INTERP_RE.sub(lambda mm: str(_resolve_value(mm.group(1), root)), s)
    return s


def _interpolate(obj: Any, root: Optional[Dict] = None) -> Any:
    if isinstance(obj, str):
        return _resolve_str(obj, root)
    if isinstance(obj, dict):
        return {k: _interpolate(v, root) for k, v in obj.items()}
    if isinstance(obj, list):
        return [_interpolate(v, root) for v in obj]
    return obj


def apply_overrides(cfg: Dict, overrides: List[str]) -> Dict:
    """Dotted-path overrides, Hydra-style. Integer path segments index
    into lists (``callbacks.0.every_n_epochs=10``)."""
    for ov in overrides or []:
        key, _, raw = ov.partition("=")
        try:
            value = ast.literal_eval(raw)
        except (ValueError, SyntaxError):
            value = raw
        node = cfg
        parts = key.strip().split(".")
        for p in parts[:-1]:
            if isinstance(node, list):
                node = node[int(p)]
            else:
                node = node.setdefault(p, {})
        if isinstance(node, list):
            node[int(parts[-1])] = value
        else:
            node[parts[-1]] = value
    return cfg


def load_config(path: str, overrides: Optional[List[str]] = None) -> Dict:
    """Load an experiment config from a YAML file, or — when `path` is not
    a file on disk — from the programmatic experiment registry by name
    (e.g. ``torus_li/markov/24_layers``; see experiments.py)."""
    if os.path.isfile(path):
        with open(path) as f:
            cfg = yaml.load(f, Loader=_YamlLoader)
    else:
        from .experiments import get_experiment

        cfg = get_experiment(path)
    cfg = apply_overrides(cfg, overrides or [])
    return _interpolate(cfg, root=cfg)


def _translate(target: str) -> Optional[str]:
    if target in TARGET_TRANSLATION:
        return TARGET_TRANSLATION[target]
    return target


def resolve_symbol(path: str):
    """Import a callable, first translating reference names (so e.g.
    ``torch.optim.AdamW`` resolves to the optax adapter)."""
    path = _translate(path)
    if path is None:
        return None
    return import_string(path)


def instantiate(cfg: Any, **extra_kwargs):
    """Recursively instantiate a ``_target_`` config node."""
    if isinstance(cfg, list):
        out = [instantiate(c) for c in cfg]
        return [o for o in out if o is not None]
    if not isinstance(cfg, dict):
        if isinstance(cfg, str) and cfg.startswith("get_method:"):
            return resolve_symbol(cfg[len("get_method:") :].strip())
        return cfg
    if "_target_" not in cfg:
        return {k: instantiate(v) for k, v in cfg.items()}

    target = _translate(cfg["_target_"])
    if target is None:
        return None

    args = [instantiate(a) for a in cfg.get("_args_", [])]
    kwargs = {
        k: instantiate(v)
        for k, v in cfg.items()
        if k not in ("_target_", "_args_")
    }
    kwargs.update(extra_kwargs)

    if target == "functools.partial":
        fn = args[0]
        return partial(fn, *args[1:], **kwargs)

    cls = import_string(target) if isinstance(target, str) else target
    return cls(*args, **kwargs)
