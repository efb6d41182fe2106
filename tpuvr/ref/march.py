"""Pure-jnp reference ray marchers — the oracle for every kernel (C12).

Two discretizations of the same emission-absorption integral:

- :func:`render_fixed_dt` — the classic per-pixel march with a fixed step
  ``dt`` along each ray (semantics of the reference's OpenCL render kernel,
  SURVEY.md §1.1/§3.1); samples are trilinear gathers at arbitrary points.
- :func:`render_plane_sweep` — samples exactly where each ray crosses the
  integer planes of the sweep axis. Each step then touches a *single* grid
  slice (the trilinear z-weight is identically zero for the far slice),
  which is what makes the TPU kernel a sequence of per-slice MXU matmuls
  with dense per-slice gradients. Per-ray step length is the constant
  ``1/|d_axis|``.

Both converge to the same integral as the step size shrinks; the Pallas
kernels are validated bit-for-bit (to f32 tolerance) against
``render_plane_sweep`` and convergence-tested against ``render_fixed_dt``.

Early ray termination (C6) only drops contributions with transmittance
below ``early_stop_eps``, so the exact (no-ERT) oracle differs from an
ERT-enabled kernel by at most ``eps * max_emission`` — tests budget for it.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from tpuvr.config import RenderConfig
from tpuvr.ref.sample import trilinear

# Axis-permutation tables for the plane sweep: ``GRID_PERM[axis]`` transposes
# the (Z, Y, X, C) grid so the sweep axis becomes dim 0, and ``PT_PERM[axis]``
# is the matching permutation of (x, y, z) point/direction components such
# that trilinear(permuted_grid, permuted_pts) == trilinear(grid, pts).
GRID_PERM = {0: (2, 1, 0, 3), 1: (1, 0, 2, 3), 2: (0, 1, 2, 3)}
PT_PERM = {0: (2, 1, 0), 1: (0, 2, 1), 2: (0, 1, 2)}


def permute_for_sweep(grid, origins, dirs, axis: int):
    """Rotate grid + rays so the sweep axis is the leading grid dim."""
    grid_p = jnp.transpose(grid, GRID_PERM[axis])
    pp = list(PT_PERM[axis])
    return grid_p, origins[..., pp], dirs[..., pp]


def intersect_aabb(origins, dirs, lo, hi, eps: float = 1e-9):
    """Slab-method ray/AABB intersection.

    Returns (t_enter, t_exit) per ray; empty intersections have
    t_enter > t_exit.
    """
    inv = jnp.where(jnp.abs(dirs) < eps, 1.0 / eps, 1.0 / dirs)
    t0 = (lo - origins) * inv
    t1 = (hi - origins) * inv
    t_near = jnp.max(jnp.minimum(t0, t1), axis=-1)
    t_far = jnp.min(jnp.maximum(t0, t1), axis=-1)
    return t_near, t_far


def render_fixed_dt(grid, origins, dirs, cfg: RenderConfig = RenderConfig()):
    """Fixed-step trilinear ray march (the reference-semantics oracle).

    Args:
      grid: (Z, Y, X, 4) voxel field, channels (sigma, r, g, b).
      origins/dirs: (..., 3) rays, (x, y, z) components; dirs need not be
        normalized — ``dt`` is measured in units of ``|dirs|``.
      cfg: render config (mode fields ``step_dt``/``max_steps``/``tmin``).

    Returns:
      (rgb (..., 3), transmittance (...,)).
    """
    batch_shape = origins.shape[:-1]
    o = origins.reshape(-1, 3)
    d = dirs.reshape(-1, 3)
    dtype = grid.dtype
    z_dim, y_dim, x_dim = grid.shape[0], grid.shape[1], grid.shape[2]
    # The zero-padded trilinear field has support [-1, N] per axis (it
    # decays linearly over the one-voxel margin beyond the outermost voxel
    # centers); the march must cover all of it.
    lo = jnp.full((3,), -1.0, dtype)
    hi = jnp.asarray([x_dim, y_dim, z_dim], dtype)

    t_near, t_far = intersect_aabb(o, d, lo, hi)
    t_near = jnp.maximum(t_near, cfg.tmin)

    dt = cfg.step_dt
    if cfg.max_steps is None:
        diag = math.sqrt((x_dim + 1) ** 2 + (y_dim + 1) ** 2
                         + (z_dim + 1) ** 2)
        n_steps = int(math.ceil(diag / dt)) + 1
    else:
        n_steps = cfg.max_steps

    def step(carry, i):
        color, trans = carry
        t = t_near + (i + 0.5) * dt
        valid = t < t_far
        pts = o + d * t[:, None]
        s = trilinear(grid, pts)
        # Density is rectified *after* interpolation (renderer semantics:
        # negative raw values — which appear mid-optimization — are vacuum).
        sigma = jnp.maximum(s[:, 0], 0.0) * cfg.sigma_scale
        sigma = jnp.where(valid, sigma, 0.0)
        att = jnp.exp(-sigma * dt)
        color = color + (trans * (1.0 - att))[:, None] * s[:, 1:4]
        trans = trans * att
        return (color, trans), None

    # Inits derive from the (possibly device-varying) rays so shard_map's
    # scan carry typing is satisfied (see tpuvr/kernels/sweep_xla.py).
    zero_r = 0.0 * o[:, 0]
    init = (
        jnp.zeros((o.shape[0], 3), dtype) + zero_r[:, None],
        jnp.ones((o.shape[0],), dtype) + zero_r,
    )
    (color, trans), _ = jax.lax.scan(
        step, init, jnp.arange(n_steps, dtype=dtype)
    )
    return color.reshape(*batch_shape, 3), trans.reshape(batch_shape)


def render_plane_sweep(
    grid, origins, dirs, axis: int = 2, cfg: RenderConfig = RenderConfig()
):
    """Plane-sweep trilinear march: one sample per integer-plane crossing.

    Args:
      grid: (Z, Y, X, 4) voxel field.
      origins/dirs: (..., 3) rays (x, y, z). Rays whose component along the
        sweep axis is (near) zero never cross the planes; their dt blows up
        but every sample is masked out (t outside [tmin, inf) or weight 0),
        matching the "parallel ray misses all planes" semantics.
      axis: sweep axis, 0=x 1=y 2=z (pick with
        :func:`tpuvr.ref.camera.dominant_axis`).
      cfg: render config (``tmin``, ``sigma_scale``).

    Returns:
      (rgb (..., 3), transmittance (...,)).
    """
    batch_shape = origins.shape[:-1]
    grid_p, o, d = permute_for_sweep(
        grid, origins.reshape(-1, 3), dirs.reshape(-1, 3), axis
    )
    dtype = grid.dtype
    n_planes = grid_p.shape[0]

    oz, dz = o[:, 2], d[:, 2]
    eps = jnp.asarray(1e-12, dtype)
    safe_dz = jnp.where(jnp.abs(dz) < eps, eps, dz)
    inv_dz = 1.0 / safe_dz
    dt = jnp.abs(inv_dz)
    ascending = dz > 0

    def step(carry, k):
        color, trans = carry
        # Visit planes front-to-back along each ray.
        k_eff = jnp.where(ascending, k, n_planes - 1 - k).astype(dtype)
        t = (k_eff - oz) * inv_dz
        valid = (t > cfg.tmin) & (jnp.abs(dz) >= eps)
        px = o[:, 0] + d[:, 0] * t
        py = o[:, 1] + d[:, 1] * t
        pts = jnp.stack([px, py, k_eff], axis=-1)
        s = trilinear(grid_p, pts)
        sigma = jnp.where(
            valid, jnp.maximum(s[:, 0], 0.0) * cfg.sigma_scale, 0.0
        )
        att = jnp.exp(-sigma * dt)
        color = color + (trans * (1.0 - att))[:, None] * s[:, 1:4]
        trans = trans * att
        return (color, trans), None

    zero_r = 0.0 * o[:, 0]
    init = (
        jnp.zeros((o.shape[0], 3), dtype) + zero_r[:, None],
        jnp.ones((o.shape[0],), dtype) + zero_r,
    )
    (color, trans), _ = jax.lax.scan(step, init, jnp.arange(n_planes))
    return color.reshape(*batch_shape, 3), trans.reshape(batch_shape)
