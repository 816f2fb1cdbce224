"""Markov (one-step) training routine for 2D torus Navier-Stokes — the
main F-FNO experiment.

TPU-native redesign of reference:fourierflow/routines/grid_2d_markov.py:
feature building (vorticity + spectrally-recovered velocity + positions +
forcing + viscosity), epoch-0 normalizer accumulation, Gaussian noise
injection, one-step N-MSE training, and a ``lax.scan`` autoregressive
rollout for validation (the reference uses a Python loop, :263-321) with
vorticity-correlation metrics.
"""

import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..layers import (
    encode_positions,
    lp_loss_rel,
    normalizer_accumulate,
    normalizer_apply,
    normalizer_init,
    normalizer_inverse,
)
from ..utils.grids import velocity_from_vorticity
from .base import Routine, TrainState

__all__ = ["Grid2DMarkovRoutine"]

TWO_PI = 2.0 * math.pi


class Grid2DMarkovRoutine(Routine):
    def __init__(
        self,
        model=None,
        n_steps: Optional[int] = None,
        num_freq_bands: int = 8,
        freq_base: float = 2.0,
        low: float = 0.0,
        high: float = 1.0,
        use_position: bool = True,
        append_force: bool = False,
        append_mu: bool = False,
        max_accumulations: float = 1e6,
        should_normalize: bool = True,
        use_fourier_position: bool = False,
        noise_std: float = 0.0,
        use_velocity: bool = False,
        learn_difference: bool = False,
        step_size: float = 1.0,
        k_max: int = 32,
        domain=((0, TWO_PI), (0, TWO_PI)),
        shuffle_grid: bool = False,
        grid_size=(64,),
        pred_path=None,
        optimizer=None,
        conv=None,
        **kwargs,
    ):
        super().__init__(optimizer=optimizer, **kwargs)
        # `conv` is the reference's name for the model argument
        # (grid_2d_markov.py:24-25).
        self.model = model if model is not None else conv
        self.n_steps = n_steps
        self.num_freq_bands = num_freq_bands
        self.freq_base = freq_base
        self.low = low
        self.high = high
        self.use_position = use_position
        self.append_force = append_force
        self.append_mu = append_mu
        self.max_accumulations = max_accumulations
        self.should_normalize = should_normalize
        self.use_fourier_position = use_fourier_position
        self.noise_std = noise_std
        self.use_velocity = use_velocity
        self.learn_difference = learn_difference
        self.step_size = step_size
        self.k_max = k_max
        self.domain = domain
        # shuffle_xy_grid ablation (reference grid_2d_markov.py:75-80):
        # fixed random spatial permutation applied to inputs, inverted on
        # outputs — tests whether the operator exploits grid structure.
        self.pred_path = pred_path
        # Everything this routine consumes is derived from the vorticity
        # (velocities are recovered spectrally in build_features), so the
        # trainer's device-resident fast path only needs the 'w' array.
        self.device_data_fields = ("w",)
        self.shuffle_grid = shuffle_grid
        if shuffle_grid:
            if isinstance(grid_size, int):
                grid_size = (grid_size,)
            assert len(grid_size) == 1, "shuffle_grid only supports one size"
            rs = np.random.RandomState(0)
            self.x_idx = jnp.asarray(rs.permutation(grid_size[0]))
            self.x_inv = jnp.argsort(self.x_idx)
            self.y_idx = jnp.asarray(rs.permutation(grid_size[0]))
            self.y_inv = jnp.argsort(self.y_idx)

    # --- features ---------------------------------------------------------
    def _pos_feats(self, dim_sizes, dtype):
        return encode_positions(
            dim_sizes,
            self.low,
            self.high,
            fourier=self.use_fourier_position,
            max_freq=self.k_max,
            num_bands=self.num_freq_bands,
            base=self.freq_base,
            dtype=dtype,
        )

    def build_features(self, w, force=None, mu=None):
        """w: [b, X, Y, 1] raw vorticity -> [b, X, Y, input_dim] features,
        pre-normalization (grid_2d_markov.py:124-163)."""
        b, sx, sy, _ = w.shape
        feats = [w]
        if self.use_velocity:
            u, v = velocity_from_vorticity(w[..., 0], self.domain)
            feats += [u[..., None], v[..., None]]
        if self.use_position:
            pos = self._pos_feats([sx, sy], w.dtype)
            feats.append(jnp.broadcast_to(pos[None], (b, *pos.shape)))
        if self.append_force:
            f = force if force.ndim == 4 else force[..., None]
            feats.append(f)
        if self.append_mu:
            feats.append(jnp.broadcast_to(mu[:, None, None, None], (b, sx, sy, 1)))
        return jnp.concatenate(feats, axis=-1)

    # --- contract -----------------------------------------------------------
    def init(self, key, sample_batch) -> TrainState:
        if "x" in sample_batch:
            w = jnp.asarray(sample_batch["x"])
        else:
            w = jnp.asarray(sample_batch["data"][..., 0])[..., None]
        x = self.build_features(
            w, sample_batch.get("f"), sample_batch.get("mu")
        )
        params = self.model.init(key, x)
        normalizer = (
            normalizer_init(x.shape[-1], self.max_accumulations)
            if self.should_normalize
            else None
        )
        return self.make_train_state(params, normalizer)

    def accumulate_step(self, state: TrainState, batch) -> TrainState:
        """Epoch-0 pass: only gather normalizer statistics
        (grid_2d_markov.py:374-383)."""
        if not self.should_normalize:
            return state
        x = self.build_features(batch["x"], batch.get("f"), batch.get("mu"))
        return state.replace(normalizer=normalizer_accumulate(state.normalizer, x))

    def train_step(self, state: TrainState, batch, rng):
        x = self.build_features(batch["x"], batch.get("f"), batch.get("mu"))
        norm = state.normalizer
        if self.should_normalize:
            # Stats keep accumulating during training until the cap, matching
            # the reference's training-mode Normalizer (normalizer.py:48-50).
            norm = normalizer_accumulate(norm, x)
            x = normalizer_apply(norm, x)
        if self.noise_std > 0.0:
            x = x + self.noise_std * jax.random.normal(rng, x.shape, x.dtype)

        targets = batch["dy"] if self.learn_difference else batch["y"]
        b = x.shape[0]
        if self.shuffle_grid:
            x = x[:, self.x_idx][:, :, self.y_idx]

        def loss_fn(params):
            im = self.model.apply(params, x)["forecast"]
            if self.shuffle_grid:
                im = im[:, :, self.y_inv][:, self.x_inv]
            if self.should_normalize:
                im = normalizer_inverse(norm, im, channel=0)
            return lp_loss_rel(im.reshape(b, -1), targets.reshape(b, -1))

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        state = self.apply_grads(state.replace(normalizer=norm), grads)
        return state, self.with_grad_norm({"train_loss": loss}, grads)

    def rollout(self, state: TrainState, batch):
        """Autoregressive rollout over the trailing n_steps of the
        trajectory, re-building features from each prediction
        (grid_2d_markov.py:195-326). Returns (preds, step_losses, yy)."""
        data = batch["data"]  # [b, X, Y, T]
        b, sx, sy, t_total = data.shape
        # Clamp to the available horizon (the reference indexes out of
        # range instead when n_steps exceeds the trajectory length).
        n_steps = min(self.n_steps or t_total - 1, t_total - 1)

        w0 = data[..., -n_steps - 1][..., None]  # [b, X, Y, 1]
        yy = data[..., -n_steps:]

        mu = batch.get("mu")
        force = batch.get("f")
        static_force = None
        force_seq = None
        if self.append_force:
            if force.ndim == 3:
                static_force = force
            else:
                force_seq = jnp.moveaxis(force[..., -n_steps:], -1, 0)  # [T,b,X,Y]

        if self.learn_difference:
            # prev: [b, X, Y, n_steps] previous true states; targets are
            # differences (note: the reference indexes yy[t-1] which wraps
            # at t=0; we use the true previous state instead).
            prev = jnp.concatenate([w0, yy[..., :-1]], axis=-1)
            dy = yy - prev
        else:
            dy = None

        params = state.params
        norm = state.normalizer

        def step(carry, xs):
            im = carry  # current vorticity [b, X, Y, 1]
            y_t, f_t, dy_t = xs
            f_in = static_force if static_force is not None else f_t
            x = self.build_features(im, f_in, mu)
            if self.should_normalize:
                x = normalizer_apply(norm, x)
            out = self.model.apply(params, x)["forecast"]
            if self.should_normalize:
                out = normalizer_inverse(norm, out, channel=0)
            if self.learn_difference:
                l = lp_loss_rel(out.reshape(b, -1), dy_t.reshape(b, -1))
                im_next = im + out
            else:
                l = lp_loss_rel(out.reshape(b, -1), y_t.reshape(b, -1))
                im_next = out
            return im_next, (im_next[..., 0], l)

        xs = (
            jnp.moveaxis(yy, -1, 0),
            force_seq if force_seq is not None else jnp.zeros((n_steps, 1, 1, 1), data.dtype),
            jnp.moveaxis(dy, -1, 0) if dy is not None else jnp.zeros((n_steps, 1, 1, 1), data.dtype),
        )
        _, (preds, step_losses) = jax.lax.scan(step, w0, xs)
        preds = jnp.moveaxis(preds, 0, -1)  # [b, X, Y, n_steps]
        return preds, step_losses, yy

    def _rho_time_until(self, preds, yy):
        """Mean vorticity correlation rho(t) over the batch and the sim
        time until rho drops below 0.95 (grid_2d_markov.py:338-350)."""
        pred_norm = jnp.linalg.norm(preds, axis=(1, 2), keepdims=True)
        yy_norm = jnp.linalg.norm(yy, axis=(1, 2), keepdims=True)
        p = ((preds / pred_norm) * (yy / yy_norm)).sum(axis=(1, 2)).mean(axis=0)
        # p: [n_steps]
        has_diverged = p < 0.95
        diverged_t = jnp.where(
            jnp.any(has_diverged), jnp.argmax(has_diverged), p.shape[0]
        )
        return p, diverged_t * self.step_size

    def compute_losses(self, preds, step_losses, yy, corr_yy=None):
        """Rollout metrics: mean step loss, full-field N-MSE, vorticity
        correlation rho(t), time-until rho<0.95
        (grid_2d_markov.py:328-372).

        ``corr_yy`` [b, cX, cY, n_steps] is an independently-generated
        reference trajectory at reduced resolution (32^2 for the
        Kolmogorov protocol): predictions are spectrally downsampled to
        its grid and correlated against it, giving the reference's
        reduced_time_until / p_2 metrics (grid_2d_markov.py:353-370)."""
        b = preds.shape[0]
        loss = jnp.mean(step_losses)
        loss_full = lp_loss_rel(preds.reshape(b, -1), yy.reshape(b, -1))

        p, time_until = self._rho_time_until(preds, yy)

        loss = jnp.where(jnp.isnan(loss), 9999.9, loss)
        loss_full = jnp.where(jnp.isnan(loss_full), 9999.9, loss_full)
        metrics = {
            "loss_avg": loss,
            "loss": loss_full,
            "time_until": time_until,
            "corr": p.mean(),
            "correlations": p,
            "step_losses": step_losses,
        }
        if corr_yy is not None:
            from ..utils.spectral import downsample_vorticity

            corr_size = corr_yy.shape[1]
            if preds.shape[1] != corr_size:
                preds_2 = downsample_vorticity(preds, corr_size, self.domain)
            else:
                preds_2 = preds
            p_2, reduced_time_until = self._rho_time_until(preds_2, corr_yy)
            metrics["reduced_time_until"] = reduced_time_until
            metrics["reduced_corr"] = p_2.mean()
            metrics["reduced_correlations"] = p_2
        return metrics

    def valid_step(self, state: TrainState, batch):
        preds, step_losses, yy = self.rollout(state, batch)
        corr_yy = None
        if "corr_data" in batch:
            # Same trailing-horizon slice as the rollout targets.
            corr_yy = batch["corr_data"][..., -preds.shape[-1]:]
        return self.compute_losses(preds, step_losses, yy, corr_yy)

    def save_predictions(self, preds, times=None, path=None):
        """Dump rollout predictions with velocities, spectrally downsampled
        to 64^2 when larger (reference grid_2d_markov.py:427-476 writes
        netCDF via xarray; xarray is absent here, so the same layout goes
        to HDF5: vorticity/vx/vy [sample, x, y, time] + time).

        The reference loops over (sample, time) in Python; here one jitted
        vmap over both.
        """
        import h5py

        from ..utils.grids import Grid
        from ..utils.spectral import (
            downsample_vorticity_hat,
            vorticity_to_velocity_solve,
        )
        from ..ops.fourier import irfft2, rfft2

        path = path or self.pred_path
        preds = jnp.asarray(preds)
        b, sx, sy, t = preds.shape
        sim_grid = Grid((sx, sy), domain=self.domain)
        out_size = min(sx, 64)
        out_grid = Grid((out_size, out_size), domain=self.domain)
        solve = vorticity_to_velocity_solve(sim_grid)

        @jax.jit
        def convert(ws):  # [b, X, Y, T]
            def one(w):  # [X, Y]
                w_hat = rfft2(w, axes=(0, 1))
                if sx > 64:
                    out = downsample_vorticity_hat(w_hat, solve, sim_grid, out_grid)
                    return out["vx"], out["vy"], out["vorticity"]
                vxh, vyh = solve(w_hat)
                return (
                    irfft2(vxh, s=(sx, sy), axes=(0, 1)),
                    irfft2(vyh, s=(sx, sy), axes=(0, 1)),
                    w,
                )

            return jax.vmap(jax.vmap(one))(jnp.moveaxis(ws, -1, 1))

        vx, vy, w = jax.tree.map(
            lambda a: np.moveaxis(np.asarray(a), 1, -1), convert(preds)
        )
        with h5py.File(path, "w") as f:
            f.create_dataset("vorticity", data=w)
            f.create_dataset("vx", data=vx)
            f.create_dataset("vy", data=vy)
            if times is not None:
                f.create_dataset("time", data=np.asarray(times))
            f.create_dataset("x", data=np.asarray(out_grid.axes()[0]))
            f.create_dataset("y", data=np.asarray(out_grid.axes()[1]))
        return path
