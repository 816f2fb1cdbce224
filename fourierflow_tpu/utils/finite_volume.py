"""Native finite-volume Navier-Stokes ("projection" method), 2D and 3D.

TPU-native replacement for jax-cfd's ``semi_implicit_navier_stokes`` as
used by the reference's projection-method data configs
(reference:data/kolmogorov/three_dimensions/trajectories/*.yaml,
data/kolmogorov/compare_methods/**): staggered (MAC) velocities, flux-form
central advection, explicit diffusion, Kolmogorov forcing with linear
drag, and an exact pressure projection diagonalized by the DFT of the
periodic 5/7-point Laplacian — computed with the matmul-DFT wrappers so it
runs on the MXU (no XLA FFT on this backend).

State is a tuple of velocity components, channels-free ``[..., X, Y(, Z)]``
with component i stored at the face with offset 1 along axis i and 0.5
along the others (jax-cfd convention). All constants are numpy (trace-time;
eager complex is unimplemented on axon).
"""

from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.fourier import irfftn_pair, rfftn_pair

__all__ = [
    "pressure_projection_nd",
    "semi_implicit_navier_stokes",
    "kolmogorov_forcing_fv",
    "filtered_velocity_field_3d",
    "forward_euler",
    "classic_rk4",
]


def _roll(x, shift, axis):
    return jnp.roll(x, shift, axis=axis)


def _fd_laplacian_eigs_1d(shape, h):
    """Per-axis DFT eigenvalue vectors of the periodic N-D 2nd-order
    Laplacian (numpy, rfft layout on the last axis). Kept 1-D so callers
    can assemble the N-D array ON DEVICE with a broadcast sum — embedding
    the materialized N-D array as an HLO constant scales as N^3 and blows
    the relay's compile-payload limit at 512^3 (HTTP 413, measured: the
    full inv-eigenvalue constant alone is 512*512*257*4 B = 270 MB).
    Each vector's k=0 entry is exactly 0.0, so the zero mode is exactly
    the all-axes-zero index downstream."""
    ndim = len(shape)
    out = []
    for d, n in enumerate(shape):
        k = np.arange(n if d < ndim - 1 else n // 2 + 1)
        out.append(((2.0 * np.cos(2.0 * np.pi * k / n) - 2.0)
                    / h[d] ** 2).astype(np.float32))
    return out


def _fd_laplacian_eigs(shape, h):
    """DFT eigenvalues of the periodic N-D 2nd-order Laplacian, inverted
    with the zero mode zeroed (pressure gauge). numpy, rfft layout on the
    last axis. Prefer ``_inv_laplacian_on_device`` in traced code at
    large shapes (see ``_fd_laplacian_eigs_1d``)."""
    ndim = len(shape)
    lam = np.zeros(tuple(shape[:-1]) + (shape[-1] // 2 + 1,), dtype=np.float64)
    for d, vec in enumerate(_fd_laplacian_eigs_1d(shape, h)):
        sh = [1] * ndim
        sh[d] = len(vec)
        lam = lam + vec.astype(np.float64).reshape(sh)
    lam[(0,) * ndim] = 1.0
    inv = np.where(lam == 0.0, 0.0, 1.0 / lam)
    inv[(0,) * ndim] = 0.0
    return inv.astype(np.float32)


def _inv_laplacian_on_device(shape, h, dtype):
    """Inverse FD-Laplacian eigenvalues assembled on device from tiny 1-D
    constants (broadcast sum + reciprocal). Every per-axis term is <= 0
    and equals 0 only at that axis' k=0, so the sum is 0 exactly at the
    all-zero mode and strictly negative elsewhere — the ``== 0`` gauge
    mask is exact in f32."""
    ndim = len(shape)
    lam = None
    for d, vec in enumerate(_fd_laplacian_eigs_1d(shape, h)):
        sh = [1] * ndim
        sh[d] = len(vec)
        term = jnp.asarray(vec, dtype=dtype).reshape(sh)
        lam = term if lam is None else lam + term
    return jnp.where(lam == 0.0, 0.0, 1.0 / jnp.where(lam == 0.0, 1.0, lam))


def pressure_projection_nd(vel: Tuple[jax.Array, ...], h) -> Tuple[jax.Array, ...]:
    """Project staggered velocities onto the divergence-free subspace
    (N-D generalization of models/learned_interpolation.pressure_projection)."""
    ndim = len(vel)
    shape = vel[0].shape[-ndim:]
    axes = tuple(range(-ndim, 0))
    div = sum(
        (v - _roll(v, 1, ax)) / h[d] for d, (v, ax) in enumerate(zip(vel, axes))
    )
    inv_lam = _inv_laplacian_on_device(shape, h, vel[0].dtype)
    dr, di = rfftn_pair(div, axes=axes)
    p = irfftn_pair(dr * inv_lam, di * inv_lam, s=shape, axes=axes)
    return tuple(
        v - (_roll(p, -1, ax) - p) / h[d]
        for d, (v, ax) in enumerate(zip(vel, axes))
    )


def kolmogorov_forcing_fv(
    grid, constant_magnitude: float = 1.0, constant_wavenumber: int = 4,
    linear_coefficient: float = 0.0,
):
    """``simple_turbulence_forcing`` equivalent for the FV solver: a
    ``sin(k * y)`` body force on the first velocity component plus a
    linear term on every component."""
    ndim = grid.ndim
    # y coordinate at the u-face locations: offset 0.5 along axis 1.
    y = grid.axes(offset=0.5)[1].astype(np.float32)
    sh = [1] * ndim
    sh[1] = len(y)
    fu_const = (constant_magnitude * np.sin(constant_wavenumber * y)).reshape(sh)

    def forcing(*vel):
        out = [linear_coefficient * v for v in vel]
        out[0] = out[0] + jnp.asarray(fu_const, dtype=vel[0].dtype)
        return tuple(out)

    return forcing


def forward_euler():
    """Sentinel for the default single-stage stepper (config parity with
    ``jax_cfd.base.time_stepping.forward_euler``)."""
    return "euler"


def classic_rk4():
    """Sentinel for the projected classic Runge-Kutta-4 stepper (config
    parity with ``jax_cfd.base.time_stepping.classic_rk4``, used by
    reference:data/kolmogorov/compare_methods/downsampling/projection_rk4/
    *.yaml via the ``time_stepper`` key)."""
    return "rk4"


def _stepper_name(time_stepper) -> str:
    if time_stepper is None:
        return "euler"
    if isinstance(time_stepper, str):
        name = time_stepper
    elif callable(time_stepper):
        # ${get_method:...classic_rk4} resolves to the sentinel above.
        name = time_stepper()
    else:
        raise TypeError(f"unsupported time_stepper {time_stepper!r}")
    if name not in ("euler", "rk4"):
        raise ValueError(f"unknown time_stepper {name!r}")
    return name


def _van_leer_flux(c, u, dt, hh, ax):
    """Upwind MUSCL flux of cell quantity ``c`` advected by velocity ``u``
    co-located at the FORWARD face along ``ax`` (between ``c[j]`` and
    ``c[j+1]``), with the Van Leer (harmonic-mean) slope limiter and the
    forward-Euler Courant correction ``0.5 * (1 - |u| dt/h)`` — the scheme
    behind jax-cfd's default convection (``base/advection.py::
    advect_van_leer``), which the reference's projection configs rely on
    for stability (central advection under forward Euler is unconditionally
    unstable at cell-Reynolds >> 2; measured blowup by step 50 at 64^3)."""
    dc = _roll(c, -1, ax) - c  # slope across this face
    dc_back = c - _roll(c, 1, ax)  # slope behind donor j
    dc_fwd = _roll(dc, -1, ax)  # slope ahead of donor j+1

    def limited(a, b):
        # Van Leer limiter: harmonic mean of adjacent slopes when they
        # agree in sign, else 0 (local extremum -> first-order upwind).
        prod = a * b
        denom = a + b
        safe = jnp.where(jnp.abs(denom) > 1e-30, denom, 1.0)
        return jnp.where(prod > 0.0, 2.0 * prod / safe, 0.0)

    cfl = u * (dt / hh)
    flux_pos = u * (c + 0.5 * (1.0 - cfl) * limited(dc, dc_back))
    flux_neg = u * (_roll(c, -1, ax) - 0.5 * (1.0 + cfl) * limited(dc, dc_fwd))
    return jnp.where(u >= 0.0, flux_pos, flux_neg)


def semi_implicit_navier_stokes(
    density: float = 1.0,
    viscosity: float = 1e-3,
    dt: float = 1e-3,
    grid=None,
    forcing: Optional[Callable] = None,
    time_stepper=None,
    convect: Optional[str] = None,
    **kwargs,
):
    """Return ``step_fn(vel_tuple) -> vel_tuple`` advancing one dt:
    explicit flux-form advection + explicit diffusion + forcing, then
    pressure projection (jax-cfd ``semi_implicit_navier_stokes``
    equivalent; config target parity via TARGET_TRANSLATION).

    ``time_stepper`` selects forward Euler (default) or projected classic
    RK4 — each RK stage state is projected before evaluating the explicit
    terms, matching jax-cfd's ``navier_stokes_rk4`` semantics where the
    incompressibility projection is applied per stage.

    ``convect`` selects the advection scheme: ``'van_leer'`` (limited
    upwind MUSCL, jax-cfd's default — TVD-stable under forward Euler at
    CFL <= courant) or ``'linear'`` (flux-form central interpolation,
    jax-cfd ``convect_linear`` — 2nd-order, non-diffusive, but only
    neutrally stable so it needs a stepper whose stability region covers
    the imaginary axis). Default: ``'van_leer'`` under Euler (matching
    jax-cfd's stability behavior) and ``'linear'`` under RK4 (limiters are
    non-smooth and would waste RK4's order; RK4 contains central advection
    at CFL 0.5)."""
    if isinstance(forcing, dict):
        from ..config import instantiate

        forcing = instantiate(forcing)
    stepper = _stepper_name(time_stepper)
    if convect is None:
        convect = "van_leer" if stepper == "euler" else "linear"
    if convect not in ("van_leer", "linear"):
        raise ValueError(f"unknown convect scheme {convect!r}")
    ndim = grid.ndim
    h = [s for s in grid.step]
    axes = tuple(range(-ndim, 0))
    nu = viscosity / density

    def laplacian(phi):
        val = 0.0
        for d, ax in enumerate(axes):
            val = val + (_roll(phi, 1, ax) + _roll(phi, -1, ax) - 2.0 * phi) / h[d] ** 2
        return val

    def advect_component_linear(vel, i):
        """Flux divergence of component i: sum_d d(c_d * v_i)/dx_d with
        central-interpolated fluxes at the corners/centers between the
        staggered locations."""
        vi = vel[i]
        ax_i = axes[i]
        total = 0.0
        for d, ax_d in enumerate(axes):
            if d == i:
                # Flux at cell centers along axis i: (v_i interpolated back
                # half a cell) squared.
                vc = 0.5 * (vi + _roll(vi, 1, ax_i))  # at centers
                flux = vc * vc
                total = total + (_roll(flux, -1, ax_i) - flux) / h[d]
            else:
                # Advecting velocity v_d interpolated to the corner shared
                # with v_i's face; v_i interpolated half a cell along d.
                vd = vel[d]
                ax_d_ = axes[d]
                # v_d at (face_i, face_d) corners:
                vd_c = 0.5 * (vd + _roll(vd, -1, ax_i))
                vi_f = 0.5 * (vi + _roll(vi, -1, ax_d_))
                flux = vd_c * vi_f
                total = total + (flux - _roll(flux, 1, ax_d_)) / h[d]
        return total

    def advect_component_van_leer(vel, i):
        """Same flux locations as the linear scheme (forward faces of
        v_i's control volume along each axis), with the advected value
        upwind-reconstructed instead of centrally interpolated."""
        vi = vel[i]
        ax_i = axes[i]
        total = 0.0
        for d, ax_d in enumerate(axes):
            if d == i:
                # Advecting velocity = v_i interpolated to its forward face.
                u = 0.5 * (vi + _roll(vi, -1, ax_i))
            else:
                # v_d at the corner shared with v_i's face (already at the
                # forward face of v_i's control volume along d).
                u = 0.5 * (vel[d] + _roll(vel[d], -1, ax_i))
            flux = _van_leer_flux(vi, u, dt, h[d], ax_d)
            total = total + (flux - _roll(flux, 1, ax_d)) / h[d]
        return total

    advect_component = (
        advect_component_van_leer if convect == "van_leer"
        else advect_component_linear
    )

    def explicit_rhs(vel):
        f = forcing(*vel) if forcing is not None else None
        return tuple(
            -advect_component(vel, i)
            + nu * laplacian(v)
            + (f[i] if f is not None else 0.0)
            for i, v in enumerate(vel)
        )

    def euler_step(vel):
        vel = tuple(vel)
        dv = explicit_rhs(vel)
        new = tuple(v + dt * d for v, d in zip(vel, dv))
        return pressure_projection_nd(new, h)

    def rk4_step(vel):
        u = tuple(vel)

        def stage(coeff, k):
            return pressure_projection_nd(
                tuple(v + dt * coeff * ki for v, ki in zip(u, k)), h
            )

        k1 = explicit_rhs(u)
        k2 = explicit_rhs(stage(0.5, k1))
        k3 = explicit_rhs(stage(0.5, k2))
        k4 = explicit_rhs(stage(1.0, k3))
        new = tuple(
            v + (dt / 6.0) * (a + 2.0 * b + 2.0 * c + d)
            for v, a, b, c, d in zip(u, k1, k2, k3, k4)
        )
        return pressure_projection_nd(new, h)

    return rk4_step if stepper == "rk4" else euler_step


def potential_noise_3d(key, grid, peak_wavenumber: float = 4.0):
    """One spectrally-filtered white-noise scalar field — a vector-
    potential component of ``filtered_velocity_field_3d``, exposed so big
    grids can build the IC in bounded per-component dispatches (a fused
    512^3 IC would be a single multi-minute dispatch, which kills the TPU
    worker; see the verify skill's ~1-minute dispatch rule).

    The envelope is real and even in k, so filtering white noise with it
    commutes with the real-pair transform — no complex arrays are ever
    materialized (eager complex arithmetic is UNIMPLEMENTED on axon, and
    this is called eagerly by probe/IC scripts as well as under jit). Only
    the per-axis k^2 VECTORS are trace-time numpy constants; the N-D array
    is assembled on device — a materialized 512^3 envelope constant
    (270 MB) exceeds the relay's compile-payload limit (HTTP 413,
    measured)."""
    shape = grid.shape
    lengths = [d[1] - d[0] for d in grid.domain]
    ks = [np.fft.fftfreq(n, d=l / n) for n, l in zip(shape, lengths)]
    ks[-1] = ks[-1][: shape[-1] // 2 + 1]
    kp = peak_wavenumber / lengths[0]
    kmag2 = None
    for d, k in enumerate(ks):
        sh = [1] * len(shape)
        sh[d] = len(k)
        term = jnp.asarray((k**2).astype(np.float32)).reshape(sh)
        kmag2 = term if kmag2 is None else kmag2 + term
    u2 = kmag2 / jnp.float32(kp**2)  # = (|k| / kp)^2
    env = u2 * jnp.exp(-u2 / 2.0)

    x = jax.random.normal(key, shape, jnp.float32)
    zr, zi = rfftn_pair(x, axes=(0, 1, 2))
    return irfftn_pair(zr * env, zi * env, s=shape, axes=(0, 1, 2))


def velocity_from_potential_3d(a, grid, maximum_velocity: float = 7.0):
    """curl(A) of a 3-component vector potential via centered differences
    (divergence-free up to FD error; one projection pass removes the
    rest), rescaled to ``maximum_velocity``. Second half of
    ``filtered_velocity_field_3d``."""
    h = grid.step

    def ddx(f, ax, hh):
        return (_roll(f, -1, ax) - _roll(f, 1, ax)) / (2 * hh)

    u = ddx(a[2], -2, h[1]) - ddx(a[1], -1, h[2])
    v = ddx(a[0], -1, h[2]) - ddx(a[2], -3, h[0])
    w = ddx(a[1], -3, h[0]) - ddx(a[0], -2, h[1])
    u, v, w = pressure_projection_nd((u, v, w), list(h))
    speed = jnp.sqrt(u**2 + v**2 + w**2)
    scale = maximum_velocity / jnp.maximum(jnp.max(speed), 1e-12)
    return u * scale, v * scale, w * scale


def filtered_velocity_field_3d(
    key, grid, maximum_velocity: float = 7.0, peak_wavenumber: float = 4.0
):
    """Random divergence-free 3D velocity: curl of a smooth random vector
    potential with the energy peak near ``peak_wavenumber``, rescaled to
    ``maximum_velocity`` (jax-cfd filtered_velocity_field equivalent for
    the 3D projection path). Exactly divergence-free in the FD sense after
    one projection. For grids >=512^3 call ``potential_noise_3d`` per
    component + ``velocity_from_potential_3d`` in separate jit dispatches
    instead (same keys, same result) to stay under the relay's dispatch
    limit."""
    keys = jax.random.split(key, 3)
    a = [potential_noise_3d(k, grid, peak_wavenumber) for k in keys]
    return velocity_from_potential_3d(a, grid, maximum_velocity)
