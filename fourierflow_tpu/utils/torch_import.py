"""Import reference (torch / PyTorch Lightning) F-FNO checkpoints.

The reference converts its own torch checkpoints into a jnp pytree for
JAX inference (reference:fourierflow/commands/infer.py:91-143,
``get_params``). This module is the equivalent capability for this
framework: published F-FNO Lightning checkpoints (Grid2DMarkovExperiment
with an ``FNOFactorized2DBlock`` under the ``conv`` attribute) load
directly into this framework's flax parameter tree + NormalizerState, so
reference-trained weights can be evaluated/rolled out here.

Key mapping (torch module naming from
reference:fourierflow/modules/factorized_fno/grid_2d.py:104-153,
modules/linear.py:41-50, modules/feedforward.py:7-20):

==========================================================  =========================================
torch state_dict key                                        flax params key
==========================================================  =========================================
conv.in_proj.weight [out,in] (or weight_g/weight_v)         in_proj.kernel [in,out] (+ .g [1,out])
conv.fourier_weight.0 / .1  [i,o,modes,2]                   fourier_weight_y / fourier_weight_x
conv.spectral_layers.{i}.fourier_weight.0 / .1              layers_{i}_fourier_weight_y / _x
conv.spectral_layers.{i}.backcast_ff.layers.{j}.0.*         layers_{i}_backcast_ff.WNLinear_{j}.*
conv.spectral_layers.{i}.forecast_ff.layers.{j}.0.*         layers_{i}_forecast_ff.WNLinear_{j}.*
conv.backcast_ff.layers.{j}.0.* (share_fork)                backcast_ff.WNLinear_{j}.*
conv.out.{j}.*                                              WNLinear_{j}.* (block level)
normalizer.{sum,sum_squared,count}                          TrainState.normalizer fields
==========================================================  =========================================

Torch ``nn.Linear`` stores weight as [out, in]; flax kernels are
[in, out] — transposed on import. Torch ``weight_norm`` (dim=0) stores
``weight_g`` [out, 1] and ``weight_v`` [out, in]; our WNLinear stores
``g`` [1, out] and ``kernel`` = v.T (per-output-column norms — the same
reparameterization, see layers.py:61-90).

Fourier weights transfer verbatim: the reference stores them as real
[in, out, modes, 2] pairs (grid_2d.py:25-28) and this framework keeps the
identical layout (models/ffno_grid_2d.py:65-66,127-128) — all the
TPU-native restructuring (truncated-DFT matmuls, packed-complex mixing,
interleaved bases) lives in the *bases*, not the parameters.

torch is an optional host-side dependency (CPU is fine); everything here
runs eagerly on the host before arrays move to device.
"""

from __future__ import annotations

import logging
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

logger = logging.getLogger(__name__)

__all__ = [
    "load_reference_state_dict",
    "convert_ffno_state_dict",
    "convert_zongyi_state_dict",
    "convert_reference_state_dict",
    "import_reference_checkpoint",
]


def load_reference_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Load a reference checkpoint file into {name: float32 numpy array}.

    Accepts a PyTorch Lightning ``.ckpt`` (state_dict nested under the
    ``state_dict`` key) or a bare ``torch.save``'d state_dict.
    """
    try:
        import torch
    except ImportError as e:  # pragma: no cover - torch is baked into this env
        raise ImportError(
            "Importing reference checkpoints requires torch (CPU build is "
            "sufficient): the reference stores weights with torch.save."
        ) from e

    try:
        blob = torch.load(path, map_location="cpu", weights_only=True)
    except Exception:
        # Lightning checkpoints carry non-tensor metadata (hyper_parameters,
        # callbacks) that weights_only rejects; fall back to a full unpickle.
        blob = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(blob, dict) and "state_dict" in blob:
        blob = blob["state_dict"]
    out = {}
    for k, v in blob.items():
        if hasattr(v, "detach"):
            out[k] = np.asarray(v.detach().cpu().numpy(), dtype=np.float32)
    return out


def _linear(sd: Dict[str, np.ndarray], base: str) -> Dict[str, np.ndarray]:
    """Convert one torch Linear / weight-normed Linear to flax WNLinear
    params. Raises KeyError if the layer is absent."""
    p: Dict[str, np.ndarray] = {}
    if f"{base}.weight_v" in sd:
        p["kernel"] = sd[f"{base}.weight_v"].T.copy()  # [in, out]
        p["g"] = sd[f"{base}.weight_g"].reshape(1, -1).copy()  # [1, out]
    elif f"{base}.weight" in sd:
        p["kernel"] = sd[f"{base}.weight"].T.copy()
    else:
        raise KeyError(f"{base}.weight")
    if f"{base}.bias" in sd:
        p["bias"] = sd[f"{base}.bias"].copy()
    return p


def _ff(sd: Dict[str, np.ndarray], base: str) -> Dict[str, Any]:
    """A reference FeedForward: layers.{j}.0 is the WNLinear inside each
    Sequential (feedforward.py:13-19)."""
    out: Dict[str, Any] = {}
    j = 0
    while f"{base}.layers.{j}.0.weight" in sd or f"{base}.layers.{j}.0.weight_v" in sd:
        out[f"WNLinear_{j}"] = _linear(sd, f"{base}.layers.{j}.0")
        j += 1
    if not out:
        raise KeyError(f"{base}.layers.0.0.weight")
    return out


def convert_ffno_state_dict(
    sd: Dict[str, np.ndarray], prefix: str = "conv."
) -> Tuple[Dict[str, Any], Optional[Dict[str, np.ndarray]]]:
    """Map a reference FNOFactorized2DBlock state_dict to this framework's
    flax variables ``{"params": {...}}`` plus normalizer statistics.

    Returns ``(variables, normalizer)`` where ``normalizer`` is
    ``{"sum", "sum_squared", "count"}`` (None if the checkpoint carries no
    normalizer buffers).
    """
    sd = {k[len(prefix):] if k.startswith(prefix) else k: v for k, v in sd.items()}

    p: Dict[str, Any] = {"in_proj": _linear(sd, "in_proj")}

    if "fourier_weight.0" in sd:  # share_weight=True (grid_2d.py:129-135)
        p["fourier_weight_y"] = sd["fourier_weight.0"].copy()
        p["fourier_weight_x"] = sd["fourier_weight.1"].copy()

    n_layers = 0
    while any(k.startswith(f"spectral_layers.{n_layers}.") for k in sd):
        n_layers += 1
    if n_layers == 0:
        raise ValueError(
            "No spectral_layers.* entries found — not an FNOFactorized2DBlock "
            f"checkpoint (keys: {sorted(sd)[:8]}...)"
        )

    shared_backcast = shared_forecast = False
    for i in range(n_layers):
        base = f"spectral_layers.{i}"
        if f"{base}.fourier_weight.0" in sd and "fourier_weight.0" not in sd:
            p[f"layers_{i}_fourier_weight_y"] = sd[f"{base}.fourier_weight.0"].copy()
            p[f"layers_{i}_fourier_weight_x"] = sd[f"{base}.fourier_weight.1"].copy()
        # share_fork registers ONE FeedForward reused by every layer; its
        # tensors appear under spectral_layers.0 AND backcast_ff (same
        # storage). Prefer the block-level name when present.
        if f"backcast_ff.layers.0.0.weight" in sd or "backcast_ff.layers.0.0.weight_v" in sd:
            shared_backcast = True
        else:
            p[f"layers_{i}_backcast_ff"] = _ff(sd, f"{base}.backcast_ff")
        has_forecast = any(k.startswith(f"{base}.forecast_ff.") for k in sd)
        if has_forecast:
            if "forecast_ff.layers.0.0.weight" in sd or "forecast_ff.layers.0.0.weight_v" in sd:
                shared_forecast = True
            else:
                p[f"layers_{i}_forecast_ff"] = _ff(sd, f"{base}.forecast_ff")
    if shared_backcast:
        p["backcast_ff"] = _ff(sd, "backcast_ff")
    if shared_forecast:
        p["forecast_ff"] = _ff(sd, "forecast_ff")

    # Output head: nn.Sequential(WNLinear, WNLinear) named `out`
    # (grid_2d.py:150-152); registered at block level in the flax tree.
    p["WNLinear_0"] = _linear(sd, "out.0")
    p["WNLinear_1"] = _linear(sd, "out.1")

    norm = None
    if "normalizer.sum" in sd:
        norm = {
            "sum": sd["normalizer.sum"].copy(),
            "sum_squared": sd["normalizer.sum_squared"].copy(),
            "count": np.asarray(sd["normalizer.count"], np.float32).reshape(()),
        }

    logger.info(
        "Converted reference checkpoint: %d layers, share_weight=%s, "
        "share_fork=%s, normalizer=%s",
        n_layers, "fourier_weight_y" in p, shared_backcast, norm is not None,
    )
    return {"params": p}, norm


def convert_zongyi_state_dict(
    sd: Dict[str, np.ndarray], prefix: str = "conv."
) -> Tuple[Dict[str, Any], Optional[Dict[str, np.ndarray]]]:
    """Map a reference FNOZongyi2DBlock state_dict (torch naming from
    reference:fourierflow/modules/zongyi_fno/grid_2d.py:16-119) to this
    framework's flax tree:

    in_proj / spectral_layers.{i}.{linear,fourier_weight.0/1} /
    feedforward.{0,2}  →  in_proj / layers_{i}.{linear,fourier_weight_1/2}
    / WNLinear_{0,1}. Fourier weights [i,o,m,m,2] transfer verbatim.
    """
    sd = {k[len(prefix):] if k.startswith(prefix) else k: v for k, v in sd.items()}
    p: Dict[str, Any] = {"in_proj": _linear(sd, "in_proj")}
    i = 0
    while f"spectral_layers.{i}.linear.weight" in sd:
        p[f"layers_{i}"] = {
            "fourier_weight_1": sd[f"spectral_layers.{i}.fourier_weight.0"].copy(),
            "fourier_weight_2": sd[f"spectral_layers.{i}.fourier_weight.1"].copy(),
            "linear": _linear(sd, f"spectral_layers.{i}.linear"),
        }
        i += 1
    if i == 0:
        raise ValueError("No spectral_layers.*.linear entries — not a Zongyi FNO checkpoint")
    p["WNLinear_0"] = _linear(sd, "feedforward.0")
    p["WNLinear_1"] = _linear(sd, "feedforward.2")

    norm = None
    if "normalizer.sum" in sd:
        norm = {
            "sum": sd["normalizer.sum"].copy(),
            "sum_squared": sd["normalizer.sum_squared"].copy(),
            "count": np.asarray(sd["normalizer.count"], np.float32).reshape(()),
        }
    logger.info("Converted reference Zongyi checkpoint: %d layers", i)
    return {"params": p}, norm


def convert_reference_state_dict(
    sd: Dict[str, np.ndarray], prefix: str = "conv."
) -> Tuple[Dict[str, Any], Optional[Dict[str, np.ndarray]]]:
    """Auto-detect the reference model family and convert.

    F-FNO checkpoints carry ``spectral_layers.{i}.backcast_ff`` modules;
    Zongyi checkpoints carry ``spectral_layers.{i}.linear`` instead.
    """
    stripped = {k[len(prefix):] if k.startswith(prefix) else k for k in sd}
    if any(".backcast_ff." in k or k.startswith("out.") for k in stripped):
        return convert_ffno_state_dict(sd, prefix)
    if any(".linear." in k and k.startswith("spectral_layers.") for k in stripped):
        return convert_zongyi_state_dict(sd, prefix)
    raise ValueError(
        "Unrecognized reference checkpoint — neither FNOFactorized2DBlock "
        f"nor FNOZongyi2DBlock naming (keys: {sorted(stripped)[:8]}...)"
    )


def _check_tree_match(got: Dict[str, Any], want: Dict[str, Any]):
    def flat(tree):
        leaves = jax.tree_util.tree_flatten_with_path(tree)[0]
        return {jax.tree_util.keystr(k): v for k, v in leaves}

    got_flat, want_flat = flat(got), flat(want)
    missing = sorted(set(want_flat) - set(got_flat))
    extra = sorted(set(got_flat) - set(want_flat))
    if missing or extra:
        raise ValueError(
            f"Checkpoint/model mismatch — missing in checkpoint: {missing[:6]}, "
            f"unexpected in checkpoint: {extra[:6]}"
        )
    for k, v in want_flat.items():
        g = got_flat[k]
        if tuple(np.shape(g)) != tuple(np.shape(v)):
            raise ValueError(
                f"Shape mismatch at {k}: checkpoint {np.shape(g)} vs model {np.shape(v)}"
            )


def import_reference_checkpoint(path: str, state):
    """Load a reference Lightning checkpoint into an existing TrainState.

    Validates the converted tree against ``state.params`` (full key and
    shape check) before replacing; normalizer statistics transfer into the
    state's NormalizerState when both sides have one. Optimizer state is
    left untouched (reference inference never restores it either —
    infer.py converts weights only).
    """
    sd = load_reference_state_dict(path)
    variables, norm = convert_reference_state_dict(sd)
    params = variables["params"]
    _check_tree_match(params, state.params["params"] if "params" in state.params else state.params)
    new_params = {"params": params} if "params" in state.params else params
    new_params = jax.tree.map(jnp.asarray, new_params)
    state = state.replace(params=new_params)
    if norm is not None and state.normalizer is not None:
        state = state.replace(
            normalizer=state.normalizer.replace(
                sum=jnp.asarray(norm["sum"]),
                sum_squared=jnp.asarray(norm["sum_squared"]),
                count=jnp.asarray(norm["count"]),
                n_accumulations=jnp.asarray(norm["count"]),
            )
        )
    return state
