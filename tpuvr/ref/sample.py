"""Trilinear grid sampling and its transpose (C3, C8).

Conventions (used everywhere in tpuvr):
  - the voxel grid is ``grid[z, y, x, c]`` with channels
    ``c = (sigma, r, g, b)``;
  - voxel centers sit at integer coordinates; world space == grid space;
  - points are ``(x, y, z)`` vectors;
  - outside the slab ``[0, N_axis - 1]`` the field is vacuum: corners beyond
    the grid contribute zero (zero-padding semantics), so interpolation
    decays linearly to 0 over the one-voxel margin.

The transpose ``trilinear_scatter_add`` is the VJP of ``trilinear`` w.r.t.
the grid; the reference's CUDA-style port would need atomics for this — the
Pallas design avoids it entirely (plane-sweep gradients are dense per-slice
matmuls), but the scatter-add remains the oracle for gradcheck
(SURVEY.md §3.3).
"""

from __future__ import annotations

import jax.numpy as jnp


def _corner_data(grid, pts):
    """Shared corner indices/weights for trilinear gather & scatter.

    Args:
      grid: (Z, Y, X, C).
      pts: (..., 3) sample points ordered (x, y, z).

    Returns:
      (idx_z, idx_y, idx_x, weights): lists of 8 index arrays per axis and
      the 8 corner weights (...,), with out-of-range corners masked to
      weight 0 and index clamped in range.
    """
    z_dim, y_dim, x_dim = grid.shape[0], grid.shape[1], grid.shape[2]
    x, y, z = pts[..., 0], pts[..., 1], pts[..., 2]
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    z0 = jnp.floor(z)
    fx, fy, fz = x - x0, y - y0, z - z0
    x0 = x0.astype(jnp.int32)
    y0 = y0.astype(jnp.int32)
    z0 = z0.astype(jnp.int32)

    idx_z, idx_y, idx_x, weights = [], [], [], []
    for dz in (0, 1):
        for dy in (0, 1):
            for dx in (0, 1):
                ix, iy, iz = x0 + dx, y0 + dy, z0 + dz
                w = (
                    jnp.where(dx, fx, 1.0 - fx)
                    * jnp.where(dy, fy, 1.0 - fy)
                    * jnp.where(dz, fz, 1.0 - fz)
                )
                valid = (
                    (ix >= 0) & (ix < x_dim)
                    & (iy >= 0) & (iy < y_dim)
                    & (iz >= 0) & (iz < z_dim)
                )
                w = jnp.where(valid, w, 0.0)
                idx_x.append(jnp.clip(ix, 0, x_dim - 1))
                idx_y.append(jnp.clip(iy, 0, y_dim - 1))
                idx_z.append(jnp.clip(iz, 0, z_dim - 1))
                weights.append(w)
    return idx_z, idx_y, idx_x, weights


def trilinear(grid, pts):
    """Trilinear interpolation of ``grid`` at points ``pts``.

    Args:
      grid: (Z, Y, X, C) voxel field.
      pts: (..., 3) points ordered (x, y, z) in grid space.

    Returns:
      (..., C) interpolated values; zero outside the grid.
    """
    idx_z, idx_y, idx_x, weights = _corner_data(grid, pts)
    out = 0.0
    for iz, iy, ix, w in zip(idx_z, idx_y, idx_x, weights):
        out = out + w[..., None] * grid[iz, iy, ix]
    return out


def trilinear_scatter_add(grid_shape, pts, values, dtype=jnp.float32):
    """Transpose of :func:`trilinear`: scatter ``values`` into a zero grid.

    ``jnp.vjp(lambda g: trilinear(g, pts))`` equals this by construction;
    used as the gradcheck oracle for kernel backward passes.

    Args:
      grid_shape: (Z, Y, X, C).
      pts: (..., 3) points (x, y, z).
      values: (..., C) cotangents at each point.

    Returns:
      (Z, Y, X, C) accumulated gradient grid.
    """
    grid = jnp.zeros(grid_shape, dtype=dtype)
    idx_z, idx_y, idx_x, weights = _corner_data(grid, pts)
    for iz, iy, ix, w in zip(idx_z, idx_y, idx_x, weights):
        grid = grid.at[iz, iy, ix].add(w[..., None] * values)
    return grid
