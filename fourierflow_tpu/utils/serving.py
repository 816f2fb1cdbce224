"""Serving export: self-contained StableHLO rollout artifacts.

The reference has no deployment story beyond a live Python process; here
the flagship inference path (autoregressive Markov rollout with feature
rebuild + normalizer, routines/grid_2d_markov.py::rollout) can be exported
with ``jax.export`` into a single serialized artifact — parameters and
normalizer statistics baked in as constants, the whole rollout a
``lax.scan`` inside one XLA program. A serving host deserializes and calls
it with a vorticity field; no flax, no model code, no Python framework
state needed at serve time.

Artifacts record their lowering platform(s); pass
``platforms=['cpu', 'tpu']`` to lower for both backends in one artifact —
cross-platform lowering works from a CPU-only host, so artifacts can be
built where you train configs and served on the TPU fleet.
"""

from __future__ import annotations

import logging
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from jax import export as jax_export

logger = logging.getLogger(__name__)

__all__ = ["make_rollout_fn", "export_rollout", "load_exported"]


def make_rollout_fn(routine, state, n_steps: int):
    """A pure serving function ``w0 [b,X,Y,1] (-> , force) -> preds
    [b,X,Y,n_steps]`` closing over params + normalizer statistics.

    Mirrors the eval rollout (grid_2d_markov.py::rollout) without targets:
    rebuild features from each prediction, normalize, model forward,
    denormalize, feed back.
    """
    params = state.params
    norm = state.normalizer
    takes_force = bool(getattr(routine, "append_force", False))

    def step_fn(im, force):
        x = routine.build_features(im, force, None)
        if routine.should_normalize:
            from ..layers import normalizer_apply, normalizer_inverse

            x = normalizer_apply(norm, x)
            out = routine.model.apply(params, x)["forecast"]
            out = normalizer_inverse(norm, out, channel=0)
        else:
            out = routine.model.apply(params, x)["forecast"]
        if getattr(routine, "learn_difference", False):
            return im + out
        return out

    if takes_force:
        def serve(w0, force):
            def body(im, _):
                im = step_fn(im, force)
                return im, im[..., 0]

            _, traj = jax.lax.scan(body, w0, None, length=n_steps)
            return jnp.moveaxis(traj, 0, -1)
    else:
        def serve(w0):
            def body(im, _):
                im = step_fn(im, None)
                return im, im[..., 0]

            _, traj = jax.lax.scan(body, w0, None, length=n_steps)
            return jnp.moveaxis(traj, 0, -1)

    serve.takes_force = takes_force
    return serve


def export_rollout(
    routine,
    state,
    out_path: str,
    n_steps: int,
    batch_size: int,
    size: int,
    platforms: Optional[Sequence[str]] = None,
    precision: Optional[str] = None,
) -> str:
    """Export the rollout to a serialized StableHLO artifact at
    ``out_path``. Returns the path.

    ``precision`` bakes a matmul precision into the artifact (e.g.
    ``'highest'`` = full-f32 dots). At the TPU default (bf16 dots), two
    equivalent lowerings can differ by ~0.5% per matmul depending on
    fusion layout — measured ~2% per step through an 8-layer forward —
    so artifacts that must reproduce a reference trace bit-closely
    should export with ``precision='highest'`` (at ~2x matmul cost on
    the MXU for f32)."""
    serve = make_rollout_fn(routine, state, n_steps)
    args = [jax.ShapeDtypeStruct((batch_size, size, size, 1), jnp.float32)]
    if serve.takes_force:
        args.append(jax.ShapeDtypeStruct((size, size), jnp.float32))
    # Lower with the fused Pallas FeedForward disabled: a pallas_call
    # cannot cross-lower to other platforms (multi-platform export from a
    # TPU host raises "Only interpret mode is supported on CPU backend"),
    # and the fused kernel only wins in the backward — forward-only
    # artifacts are better served by XLA's own fusion.
    import contextlib

    from ..layers import ff_fuse_override

    with contextlib.ExitStack() as stack:
        stack.enter_context(ff_fuse_override("never"))
        if precision is not None:
            stack.enter_context(jax.default_matmul_precision(precision))
        exported = jax_export.export(
            jax.jit(serve),
            platforms=list(platforms) if platforms else None,
        )(*args)
    blob = exported.serialize()
    with open(out_path, "wb") as f:
        f.write(blob)
    logger.info(
        "exported rollout (%d steps, batch %d, %d^2, platforms=%s): %s (%d bytes)",
        n_steps, batch_size, size, exported.platforms, out_path, len(blob),
    )
    return out_path


def load_exported(path: str):
    """Deserialize an exported rollout; returns a callable
    ``(w0[, force]) -> preds``."""
    with open(path, "rb") as f:
        exported = jax_export.deserialize(f.read())
    return jax.jit(exported.call)
