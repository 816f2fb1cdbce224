"""Shared neural-net layers (flax.linen) and small functional ops.

TPU-native equivalents of reference:fourierflow/modules/{linear,feedforward,
position,loss,normalizer}.py. Weight normalization is an explicit
reparameterization (w = g * v/||v||) rather than a module hook, so it traces
cleanly under jit.
"""

import contextlib
import math
import os
from typing import Optional

import flax.linen as nn
import flax.struct
import jax
import jax.numpy as jnp

__all__ = [
    "WNLinear",
    "FeedForward",
    "fourier_encode",
    "encode_positions",
    "lp_loss_rel",
    "lp_loss_abs",
    "NormalizerState",
    "normalizer_init",
    "normalizer_accumulate",
    "normalizer_apply",
    "normalizer_inverse",
    "LpLoss",
    "GehringLinear",
    "ff_fuse_override",
]

# Process-wide FeedForward fuse override (None = use each module's `fuse`
# attribute). Serving export sets this to 'never' while lowering: a Pallas
# pallas_call cannot cross-lower to other platforms in a multi-platform
# StableHLO artifact, and the fused kernel's win is in the *backward*
# (forward-only fusion measured slower than XLA's own fusion — RESULTS.md),
# so inference artifacts should carry plain dots.
_FF_FUSE_OVERRIDE: Optional[str] = None


@contextlib.contextmanager
def ff_fuse_override(mode: Optional[str]):
    """Temporarily force every FeedForward's fuse mode (e.g. 'never' while
    tracing/lowering an export). Trace-time only: must be active while the
    function is being traced, not when the compiled result runs."""
    global _FF_FUSE_OVERRIDE
    prev = _FF_FUSE_OVERRIDE
    _FF_FUSE_OVERRIDE = mode
    try:
        yield
    finally:
        _FF_FUSE_OVERRIDE = prev


def torch_linear_kernel_init(key, shape, dtype=jnp.float32):
    """torch.nn.Linear default init (kaiming_uniform(a=sqrt(5))) for a
    flax-layout kernel [in, out]: U(-1/sqrt(in), 1/sqrt(in))."""
    in_f = shape[0]
    bound = 1.0 / math.sqrt(in_f)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def xavier_normal_init(gain: float = 1.0):
    """torch.nn.init.xavier_normal_ for weights whose first two dims are
    (fan_in, fan_out) — used for the spectral weights
    (reference grid_2d.py:28,131)."""

    def init(key, shape, dtype=jnp.float32):
        fan_in, fan_out = shape[0], shape[1]
        receptive = 1
        for s in shape[2:]:
            receptive *= s
        # torch computes fan over dims 0/1 times the receptive field of the
        # remaining dims.
        std = gain * math.sqrt(2.0 / ((fan_in + fan_out) * receptive))
        return std * jax.random.normal(key, shape, dtype)

    return init


class WNLinear(nn.Module):
    """Linear layer with optional explicit weight normalization.

    Mirrors reference:fourierflow/modules/linear.py:41-79 (WNLinear): torch
    default init; with ``wnorm`` the weight is reparameterized as
    g * v / ||v|| with per-output-column norms (torch weight_norm dim=0).
    """

    features: int
    use_bias: bool = True
    wnorm: bool = False
    dtype: Optional[jnp.dtype] = None  # compute dtype; params stay f32

    @nn.compact
    def __call__(self, x, return_dense: bool = False):
        """Apply the layer, or with ``return_dense`` declare the params and
        return the effective ``(kernel, bias)`` (weight-norm already folded
        in, compute dtype applied) — used by fused kernels that consume the
        dense weights directly. ``x`` then only supplies the input width."""
        in_f = x.shape[-1]
        v = self.param("kernel", torch_linear_kernel_init, (in_f, self.features))
        if self.wnorm:
            g = self.param(
                "g",
                lambda _key: jnp.linalg.norm(v, axis=0, keepdims=True),
            )
            norm = jnp.linalg.norm(v, axis=0, keepdims=True)
            kernel = g * v / jnp.maximum(norm, 1e-12)
        else:
            kernel = v
        if self.dtype is not None:
            x = x.astype(self.dtype)
            kernel = kernel.astype(self.dtype)
        b = None
        if self.use_bias:
            b = self.param(
                "bias",
                lambda key, shape, dtype=jnp.float32: jax.random.uniform(
                    key, shape, dtype, -1.0 / math.sqrt(in_f), 1.0 / math.sqrt(in_f)
                ),
                (self.features,),
            )
            if self.dtype is not None:
                b = b.astype(self.dtype)
        if return_dense:
            return kernel, b
        y = x @ kernel
        if b is not None:
            y = y + b
        return y


class GehringLinear(nn.Module):
    """Linear layer with Gehring et al. (2017) initialization and optional
    weight normalization (reference:fourierflow/modules/linear.py:12-38).

    Init: weights ~ N(0, sqrt((1 - dropout) / fan_in)), zero bias — the
    fan-in scaling keeps output variance at 1 under dropout.
    """

    features: int
    dropout: float = 0.0
    use_bias: bool = True
    weight_norm: bool = True

    @nn.compact
    def __call__(self, x):
        in_f = x.shape[-1]

        def gehring_init(key, shape, dtype=jnp.float32):
            std = math.sqrt((1.0 - self.dropout) / shape[0])
            return std * jax.random.normal(key, shape, dtype)

        v = self.param("kernel", gehring_init, (in_f, self.features))
        if self.weight_norm:
            g = self.param(
                "g", lambda _key: jnp.linalg.norm(v, axis=0, keepdims=True)
            )
            norm = jnp.linalg.norm(v, axis=0, keepdims=True)
            kernel = g * v / jnp.maximum(norm, 1e-12)
        else:
            kernel = v
        y = x @ kernel
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros, (self.features,))
            y = y + b
        return y


class FeedForward(nn.Module):
    """n-layer MLP with expansion `factor`, ReLU between layers, optional
    LayerNorm on the last layer (reference:fourierflow/modules/feedforward.py).
    """

    dim: int
    factor: int
    ff_weight_norm: bool = False
    n_layers: int = 2
    layer_norm: bool = False
    dropout: float = 0.0
    dtype: Optional[jnp.dtype] = None
    # 'auto': fused Pallas matmul-relu-matmul kernel (ops/pallas_ff.py) on
    # TPU for the plain 2-layer shape — the hidden [rows, dim*factor]
    # activations stay in VMEM in forward AND backward instead of making
    # ~7 HBM round trips per layer. 'fwd': fused forward, XLA-dots
    # backward. 'never'/'always' force the choice ('always' runs
    # interpreted off-TPU, for tests). The default can be overridden
    # process-wide with FOURIERFLOW_FF_FUSE (benchmark A/Bs).
    fuse: str = os.environ.get("FOURIERFLOW_FF_FUSE", "auto")

    def _fuse_mode(self) -> str:
        return _FF_FUSE_OVERRIDE if _FF_FUSE_OVERRIDE is not None else self.fuse

    def _fusable(self) -> bool:
        return (
            self.n_layers == 2
            and self.dropout == 0.0
            and not self.layer_norm
            and self._fuse_mode() != "never"
        )

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        backend = jax.default_backend()
        fuse = self._fuse_mode()
        if self._fusable() and (fuse == "always" or backend == "tpu"):
            from .ops.pallas_ff import fused_ff

            lin0 = WNLinear(self.dim * self.factor, wnorm=self.ff_weight_norm,
                            dtype=self.dtype)
            lin1 = WNLinear(self.dim, wnorm=self.ff_weight_norm,
                            dtype=self.dtype)
            k1, b1 = lin0(x, return_dense=True)
            k2, b2 = lin1(
                jnp.zeros((1, self.dim * self.factor), x.dtype),
                return_dense=True,
            )
            if self.dtype is not None:
                x = x.astype(self.dtype)
            return fused_ff(x, k1, b1, k2, b2, backend != "tpu",
                            fuse != "fwd")
        for i in range(self.n_layers):
            out_dim = self.dim if i == self.n_layers - 1 else self.dim * self.factor
            x = WNLinear(out_dim, wnorm=self.ff_weight_norm, dtype=self.dtype)(x)
            if self.dropout > 0.0:
                x = nn.Dropout(self.dropout, deterministic=deterministic)(x)
            if i < self.n_layers - 1:
                x = nn.relu(x)
            if self.layer_norm and i == self.n_layers - 1:
                x = nn.LayerNorm()(x)
        return x


def fourier_encode(x: jax.Array, max_freq: float, num_bands: int = 4, base: float = 2.0):
    """Perceiver-style positional encoding
    (reference:fourierflow/modules/position.py:7-31): logspace scales,
    sin/cos, raw coordinate appended."""
    orig_x = x[..., None]
    scales = jnp.logspace(
        0.0,
        math.log(max_freq / 2) / math.log(base),
        num=num_bands,
        base=base,
        dtype=x.dtype,
    )
    scales = scales.reshape((1,) * orig_x.ndim + (-1,))[..., 0, :]
    xs = orig_x * scales * jnp.pi
    enc = jnp.concatenate([jnp.sin(xs), jnp.cos(xs), orig_x], axis=-1)
    return enc


def encode_positions(
    dim_sizes,
    low: float = -1.0,
    high: float = 1.0,
    fourier: bool = False,
    max_freq: Optional[float] = None,
    num_bands: int = 8,
    base: float = 2.0,
    dtype=jnp.float32,
):
    """Meshgrid of linspace positions, optionally fourier-encoded
    (reference:fourierflow/routines/grid_2d_markov.py:98-122)."""
    grids = [jnp.linspace(low, high, num=s, dtype=dtype) for s in dim_sizes]
    pos = jnp.stack(jnp.meshgrid(*grids, indexing="ij"), axis=-1)
    if not fourier:
        return pos
    feats = fourier_encode(pos, max_freq, num_bands, base=base)
    return feats.reshape(*feats.shape[:-2], -1)


def lp_loss_rel(x: jax.Array, y: jax.Array, p: int = 2, reduce_mean: bool = True):
    """Normalized relative Lp loss (N-MSE), the headline metric
    (reference:fourierflow/modules/loss.py:33-46)."""
    b = x.shape[0]
    diff = jnp.linalg.norm((x - y).reshape(b, -1), ord=p, axis=1)
    ynorm = jnp.linalg.norm(y.reshape(b, -1), ord=p, axis=1)
    r = diff / ynorm
    return jnp.mean(r) if reduce_mean else r


def lp_loss_abs(x: jax.Array, y: jax.Array, d: int = 2, p: int = 2, reduce_mean: bool = True):
    """Absolute Lp loss with uniform-mesh scaling
    (reference:fourierflow/modules/loss.py:18-31)."""
    b = x.shape[0]
    h = 1.0 / (x.shape[1] - 1.0)
    norms = (h ** (d / p)) * jnp.linalg.norm((x - y).reshape(b, -1), ord=p, axis=1)
    return jnp.mean(norms) if reduce_mean else norms


class NormalizerState(flax.struct.PyTreeNode):
    """Running mean/std accumulator state
    (reference:fourierflow/modules/normalizer.py:6-77). Pure pytree so it
    threads through jit'd train steps."""

    sum: jax.Array
    sum_squared: jax.Array
    count: jax.Array
    n_accumulations: jax.Array
    max_accumulations: float = flax.struct.field(pytree_node=False)
    std_epsilon: float = flax.struct.field(pytree_node=False)

    @property
    def mean(self):
        safe = jnp.maximum(self.count, 1.0)
        return self.sum / safe

    @property
    def std(self):
        safe = jnp.maximum(self.count, 1.0)
        var = self.sum_squared / safe - self.mean**2
        return jnp.maximum(jnp.sqrt(jnp.maximum(var, 0.0)), self.std_epsilon)


def normalizer_init(size: int, max_accumulations: float = 1e6, std_epsilon: float = 1e-8):
    return NormalizerState(
        sum=jnp.zeros((size,)),
        sum_squared=jnp.zeros((size,)),
        count=jnp.zeros(()),
        n_accumulations=jnp.zeros(()),
        max_accumulations=float(max_accumulations),
        std_epsilon=float(std_epsilon),
    )


def normalizer_accumulate(state: NormalizerState, x: jax.Array) -> NormalizerState:
    """Accumulate stats over all leading dims of x ([..., size]); no-op once
    max_accumulations is reached (normalizer.py:18-26,48-50)."""
    flat = x.reshape(-1, x.shape[-1])
    do = state.n_accumulations < state.max_accumulations
    w = jnp.where(do, 1.0, 0.0)
    return state.replace(
        sum=state.sum + w * flat.sum(axis=0),
        sum_squared=state.sum_squared + w * (flat**2).sum(axis=0),
        count=state.count + w * flat.shape[0],
        n_accumulations=state.n_accumulations + w,
    )


def normalizer_apply(state: NormalizerState, x: jax.Array) -> jax.Array:
    return (x - state.mean) / state.std


def normalizer_inverse(state: NormalizerState, x: jax.Array, channel: Optional[int] = None):
    if channel is None:
        return x * state.std + state.mean
    return x * state.std[channel] + state.mean[channel]


class LpLoss:
    """Class-style API over the relative/absolute Lp losses (equivalent of
    reference:fourierflow/modules/loss.py:4-49; ``rel`` is the headline
    N-MSE metric). Functional forms: ``lp_loss_rel`` / ``lp_loss_abs``."""

    def __init__(self, d: int = 2, p: int = 2, size_average: bool = True,
                 reduction: bool = True):
        self.d = d
        self.p = p
        self.reduction = reduction
        self.size_average = size_average

    def abs(self, x, y):
        return lp_loss_abs(x, y, d=self.d, p=self.p, reduce_mean=self.size_average)

    def rel(self, x, y):
        return lp_loss_rel(x, y, p=self.p, reduce_mean=self.size_average)

    def __call__(self, x, y):
        return self.rel(x, y)
