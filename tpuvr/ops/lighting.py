"""Hemisphere-sampled single-scatter lighting (C4, BASELINE.json:9).

The reference's lighting kernel marches N=16 secondary rays per primary
sample (reconstructed ``kernels/*.cl`` lighting pass, SURVEY.md §2.1). A
per-sample secondary march is a gather storm on TPU, so the TPU-native
formulation precomputes a **light volume** once per grid update:

  L(voxel) = sky_intensity * (1/N) * sum_w exp(-tau_w(voxel))

where tau_w is the optical depth from the voxel to the sky along hemisphere
direction w. Each directional tau is a slab sweep from the sky side
inward — the recurrence

  tau_k = shift_D(tau_{k+1} + dt * sigma_{k+1}),   D = (wx, wy)/|wz|

is one bilinear *translation* resample per slice (two banded matmuls, the
same machinery as the render sweep; zero-padding = vacuum outside). Note
the recurrence re-resamples the accumulated tau every slice, which smooths
oblique shadows slightly (the classic shear-warp shadow approximation —
tau error up to a few tenths for steep density gradients; the exact
per-sample marcher below is the quality reference). The
16 directions are a deterministic Fibonacci hemisphere (no MC noise in
tests, per SURVEY.md §4 "deterministic sample set => exact oracle").

Lit rendering then multiplies L into the emission channels at the voxels
(`apply_lighting`), so the primary sweep kernels are unchanged and the lit
radiance field is still a single trilinear field. L is detached from
gradients by default (detached-shadows; SURVEY.md §7 M5).

The exact per-sample secondary marcher (`light_at_points_ref`) is kept as
the tolerance oracle.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

from tpuvr.config import LightingConfig
from tpuvr.kernels.sweep import _interp_matrices, sweep_dot
from tpuvr.ref.march import GRID_PERM, PT_PERM
from tpuvr.ref.sample import trilinear


def hemisphere_dirs(n: int, up=(0.0, 0.0, 1.0)) -> np.ndarray:
    """Deterministic Fibonacci-spiral hemisphere directions around ``up``.

    Returns (n, 3) unit vectors with dir . up > 0.
    """
    up = np.asarray(up, dtype=np.float64)
    up = up / np.linalg.norm(up)
    golden = (1.0 + math.sqrt(5.0)) / 2.0
    i = np.arange(n, dtype=np.float64)
    # Uniform on the hemisphere around +z.
    z = (i + 0.5) / n          # cos(theta) in (0, 1)
    phi = 2.0 * math.pi * i / golden
    r = np.sqrt(1.0 - z * z)
    local = np.stack([r * np.cos(phi), r * np.sin(phi), z], axis=-1)
    # Rotate +z to `up`.
    a = np.asarray([0.0, 0.0, 1.0])
    if np.allclose(up, a):
        rot = np.eye(3)
    elif np.allclose(up, -a):
        rot = np.diag([1.0, -1.0, -1.0])
    else:
        v = np.cross(a, up)
        c = float(a @ up)
        vx = np.asarray(
            [[0, -v[2], v[1]], [v[2], 0, -v[0]], [-v[1], v[0], 0]]
        )
        rot = np.eye(3) + vx + vx @ vx / (1.0 + c)
    return local @ rot.T


@functools.lru_cache(maxsize=None)
def _tau_op(d_y: float, d_x: float, dt: float, precision: str):
    """Differentiable Pallas tau sweep (custom VJP).

    The adjoint of the shift-scan recurrence is another directional sweep
    with the transposed (= negated-offset) shift, run plane-ascending —
    ``tpuvr.kernels.lighting.tau_sweep_adj``. Residual: just sigma (for
    the relu mask); no per-plane activations are stored (C8 discipline).
    """
    from tpuvr.kernels.lighting import tau_sweep, tau_sweep_adj

    @jax.custom_vjp
    def op(sig_p):
        return tau_sweep(sig_p, d_y=d_y, d_x=d_x, dt=dt,
                         precision=precision)

    def fwd(sig_p):
        return op(sig_p), sig_p

    def bwd(sig_p, g):
        ds = tau_sweep_adj(g, d_y=d_y, d_x=d_x, dt=dt, precision=precision)
        dsig = jnp.where(sig_p > 0.0, ds, 0.0)
        # Match the primal input's vma type (see tpuvr.ops.vjp.op_bwd).
        vma = lambda x: getattr(jax.typeof(x), "vma", frozenset())
        extra = tuple(sorted(vma(dsig) - vma(sig_p)))
        if extra:
            dsig = jax.lax.psum(dsig, extra)
        return (dsig,)

    op.defvjp(fwd, bwd)
    return op


def _directional_tau(sigma, w, precision="highest", impl=None):
    """Optical depth to the sky along direction ``w`` for every voxel.

    Args:
      sigma: (Z, Y, X) density.
      w: unit (x, y, z) direction pointing *toward the sky*.
      impl: 'pallas' (tpuvr.kernels.lighting.tau_sweep), 'xla' (lax.scan
        twin), or None for the backend default.

    Returns:
      (Z, Y, X) tau field (same layout as sigma).
    """
    from tpuvr.ops.vjp import resolve_impl

    axis = int(np.argmax(np.abs(w)))
    perm = GRID_PERM[axis][:3]
    sig_p = jnp.transpose(sigma, perm)           # (S, Y, X)
    wp = np.asarray(w, dtype=np.float64)[list(PT_PERM[axis])]
    flip = wp[2] < 0
    if flip:
        sig_p = sig_p[::-1]
    dz = abs(float(wp[2]))
    d_x = float(wp[0]) / dz
    d_y = float(wp[1]) / dz
    dt = 1.0 / dz  # |w| == 1
    s, n_y, n_x = sig_p.shape
    dtype = sigma.dtype

    if resolve_impl(impl) == "pallas":
        tau_p = _tau_op(d_y, d_x, dt, precision)(sig_p)
    else:
        mat_a, mat_b = _interp_matrices(
            jnp.asarray(1.0, dtype), jnp.asarray(d_y, dtype),
            jnp.asarray(1.0, dtype), jnp.asarray(d_x, dtype),
            n_y, n_y, n_x, n_x, dtype,
        )

        def shift(f):
            # f(y + d_y, x + d_x), zero outside.
            tmp = sweep_dot(mat_a, f, precision, dtype)
            return sweep_dot(tmp, mat_b, precision, dtype)

        def step(tau_next, sig_next):
            tau = shift(tau_next + dt * jnp.maximum(sig_next, 0.0))
            return tau, tau

        # Sweep from the sky-side inward: plane S-1 sees only vacuum
        # (tau 0); consuming sigma slices S-1..1 yields taus[i] = tau at
        # plane S-2-i.
        tau_init = jnp.zeros((n_y, n_x), dtype)
        _, taus = jax.lax.scan(step, tau_init, sig_p[:0:-1])
        tau_p = jnp.concatenate(
            [taus[::-1], jnp.zeros((1, n_y, n_x), dtype)], axis=0
        )  # (S, Y, X), tau_p[k] = tau at plane k
    if flip:
        tau_p = tau_p[::-1]
    inv_perm = np.argsort(perm)
    return jnp.transpose(tau_p, inv_perm)


def light_volume(sigma, cfg: LightingConfig = LightingConfig(),
                 precision: str = "highest", impl=None):
    """Sky-light volume L (Z, Y, X): mean hemisphere transmittance.

    Directions accumulate behind ``optimization_barrier``s: without the
    chain XLA schedules many of the N per-direction tau volumes
    concurrently — at 512^3 that was 10+ live 511 MB buffers and a 4 GB
    HBM overshoot in the c5 lit train step (caught round 5). The
    barrier pins each tau's lifetime to its accumulation (~2 live
    volumes with prefetch), at no arithmetic cost.
    """
    dirs = hemisphere_dirs(cfg.n_samples, cfg.up)
    total = jnp.zeros_like(sigma)
    for w in dirs:
        total = total + jnp.exp(
            -_directional_tau(sigma, w, precision, impl=impl)
        )
        total = jax.lax.optimization_barrier(total)
    return (cfg.sky_intensity / cfg.n_samples) * total


def light_volume_exact(sigma, cfg: LightingConfig = LightingConfig(),
                       chunk_planes: int = 1):
    """Exact per-voxel hemisphere light volume (the 'persample' mode).

    Marches ``cfg.n_samples`` true secondary rays from every voxel center
    through the trilinear field with step ``cfg.secondary_dt`` — no
    shear-resample approximation. O(voxels * N * steps) trilinear gathers:
    the quality/oracle path, orders of magnitude slower than
    :func:`light_volume`'s sweeps; use for ground truth and small grids.
    Differentiable by plain autodiff (static-bound loops).
    """
    z_dim, y_dim, x_dim = sigma.shape
    ay = jnp.arange(y_dim, dtype=sigma.dtype)
    axx = jnp.arange(x_dim, dtype=sigma.dtype)
    yy, xx = jnp.meshgrid(ay, axx, indexing="ij")

    def plane(z):
        pts = jnp.stack([xx, yy, jnp.full_like(xx, z)], axis=-1)
        return light_at_points_ref(sigma, pts, cfg, dt=cfg.secondary_dt)

    return jax.lax.map(
        plane, jnp.arange(z_dim, dtype=sigma.dtype),
        batch_size=chunk_planes,
    )


def apply_lighting(grid, cfg: LightingConfig = LightingConfig(),
                   precision: str = "highest", detach: bool | None = None,
                   impl=None):
    """Multiply the sky-light volume into the emission/albedo channels.

    Returns a lit (Z, Y, X, 4) grid; density unchanged. With detach
    (default from ``cfg.detach``) no gradient flows through the light
    volume (detached shadows); ``detach=False`` differentiates shadows
    too — the tau sweeps carry a custom VJP on the Pallas path
    (:func:`_tau_op`) and are plain autodiff on the XLA path.

    ``cfg.mode`` selects the light-volume builder: 'lightvolume' (N
    directional shear sweeps — the TPU fast path) or 'persample' (exact
    per-voxel secondary marches — the oracle path).
    """
    if detach is None:
        detach = cfg.detach
    if cfg.mode == "lightvolume":
        ell = light_volume(grid[..., 0], cfg, precision, impl=impl)
    elif cfg.mode == "persample":
        ell = light_volume_exact(grid[..., 0], cfg)
    else:
        raise ValueError(f"unknown lighting mode: {cfg.mode!r}")
    if detach:
        ell = jax.lax.stop_gradient(ell)
    return jnp.concatenate(
        [grid[..., :1], grid[..., 1:4] * ell[..., None]], axis=-1
    )


def light_at_points_ref(sigma, pts, cfg: LightingConfig = LightingConfig(),
                        dt: float = 0.25):
    """Exact per-sample hemisphere lighting (the tolerance oracle).

    Marches N secondary rays per point with step ``dt`` through the
    trilinear density field (support [-1, N] per axis).

    Args:
      sigma: (Z, Y, X) density.
      pts: (..., 3) points (x, y, z).

    Returns:
      (...,) light values.
    """
    z_dim, y_dim, x_dim = sigma.shape
    field = sigma[..., None]  # reuse trilinear's channel dim
    dirs = hemisphere_dirs(cfg.n_samples, cfg.up)
    diag = math.sqrt((x_dim + 1) ** 2 + (y_dim + 1) ** 2 + (z_dim + 1) ** 2)
    n_steps = int(math.ceil(diag / dt)) + 1
    total = 0.0
    for w in dirs:
        wj = jnp.asarray(w, dtype=sigma.dtype)

        def body(i, tau):
            p = pts + wj * ((i + 0.5) * dt)
            return tau + dt * jnp.maximum(trilinear(field, p)[..., 0], 0.0)

        tau = jax.lax.fori_loop(
            0, n_steps, body, jnp.zeros(pts.shape[:-1], sigma.dtype)
        )
        total = total + jnp.exp(-tau)
    return (cfg.sky_intensity / cfg.n_samples) * total
