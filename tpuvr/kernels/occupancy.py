"""Coarse occupancy structure for empty-space skipping (C6).

The reference keeps a coarse max-density grid to skip empty bricks
(reconstructed occupancy structure, SURVEY.md §2.1). In the sweep design
the natural skip granularity is the *slice* (a whole march step), so the
occupancy feeds per-slice enables; the brick field is also exposed for
diagnostics and for the fixed-dt oracle's t-range clamping.

Skipping is lossless by construction: a slice/brick is skipped only when
its maximum density is <= 0, in which case rectified density contributes
exactly nothing (see tpuvr/ops/render.py slice_enables).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def build_occupancy(grid, brick: int = 8):
    """Max-pool the density channel into bricks.

    Args:
      grid: (Z, Y, X, 4) voxel field (or (Z, Y, X) density).
      brick: pooling edge (voxels); dims need not divide evenly (edge
        bricks pool the remainder).

    Returns:
      (ceil(Z/b), ceil(Y/b), ceil(X/b)) max-density field.
    """
    sigma = grid[..., 0] if grid.ndim == 4 else grid
    z, y, x = sigma.shape
    pads = [(-d) % brick for d in (z, y, x)]
    sigma = jnp.pad(
        sigma, [(0, pads[0]), (0, pads[1]), (0, pads[2])],
        constant_values=-jnp.inf,
    )
    return jax.lax.reduce_window(
        sigma,
        -jnp.inf,
        jax.lax.max,
        window_dimensions=(brick, brick, brick),
        window_strides=(brick, brick, brick),
        padding="VALID",
    )


def slice_enables_from_occupancy(occ, n_slices: int, brick: int,
                                 reverse: bool, dtype=jnp.float32):
    """Per-slice 0/1 enables from a brick occupancy field.

    ``occ`` must be pooled over the *sweep-permuted* grid (dim 0 = sweep
    axis). Each slice inherits its containing brick layer's max.
    """
    layer_max = jnp.max(occ, axis=(1, 2))            # (ceil(S/b),)
    idx = jnp.arange(n_slices) // brick
    enables = (layer_max[idx] > 0.0).astype(dtype)
    if reverse:
        enables = enables[::-1]
    return jax.lax.stop_gradient(enables)


def occupancy_fraction(occ) -> jnp.ndarray:
    """Fraction of bricks containing density (diagnostic for skip gains)."""
    return jnp.mean((occ > 0.0).astype(jnp.float32))


def slice_brick_max(grid_sc, brick: int = 8):
    """Per-slice 2-D brick max of the density channel.

    Args:
      grid_sc: (S, 4, Y, X) sweep-layout grid.
      brick: in-plane pooling edge (RenderConfig.occupancy_brick).

    Returns:
      (S, ceil(Y/b), ceil(X/b)) max-density field, gradient-detached.
      This is the per-grid-update half of banded-tile empty-space
      skipping (C6): the per-(slice, output-tile) gate bits are derived
      per view by :func:`tile_occupancy`.
    """
    sigma = grid_sc[:, 0, :, :]
    s, y, x = sigma.shape
    pads = [(-y) % brick, (-x) % brick]
    sigma = jnp.pad(
        sigma, [(0, 0), (0, pads[0]), (0, pads[1])],
        constant_values=-jnp.inf,
    )
    pooled = jax.lax.reduce_window(
        sigma, -jnp.inf, jax.lax.max,
        window_dimensions=(1, brick, brick),
        window_strides=(1, brick, brick),
        padding="VALID",
    )
    return jax.lax.stop_gradient(pooled)


def tile_occupancy(brickmax, coeffs, n_v: int, n_u: int, brick: int,
                   plane_shape, tile: int = 128):
    """Per-(traversal slice, output tile) occupancy gates (S, Tv, Tu).

    Mirrors the banded kernels' window arithmetic
    (tpuvr.kernels.sweep._band_window) in plain jnp: output tile
    (vt, ut) of slice k contracts the slice window
    [r0(k,vt), r0+tile) x [c0(k,ut), c0+tile); its gate is the max of
    ``brickmax`` over the bricks covering that window (conservatively
    over-covered at brick edges). A zero-density window contributes
    exactly nothing, so gating the tile off is lossless (C6) — this is
    what slice-level skipping cannot see: a hollow shell whose every
    slice touches density still has mostly-empty windows.

    Args:
      brickmax: (S, Yb, Xb) from :func:`slice_brick_max`, in TRAVERSAL
        order (flip slices for reverse sweeps before calling).
      coeffs: (ay, by, ax, bx) traversal-order (S,) arrays.
      n_v/n_u: intermediate image extents (tile-multiples for the banded
        kernel; remainder tiles are not gated).
      brick: the pooling edge used for ``brickmax``.
      plane_shape: the slice's true (Y, X) — the window clamp must match
        the kernel's exactly, and brickmax may be edge-padded.
    """
    ay, by, ax, bx = coeffs
    s, yb, xb = brickmax.shape
    n_y, n_x = plane_shape
    t = tile
    tv, tu = max(n_v // t, 1), max(n_u // t, 1)
    nb = -(-t // brick) + 1  # brick rows covering a window (+ align slack)

    def window_starts(a, b, n_out, extent):
        o0 = jnp.arange(n_out, dtype=a.dtype) * t
        f_first = o0[None, :] * a[:, None] + b[:, None]      # (S, T*)
        f_last = f_first + (t - 1) * a[:, None]
        lo = jnp.minimum(f_first, f_last)
        r0 = jnp.clip(jnp.floor(lo), 0, max(extent - t, 0))
        r0 = (r0.astype(jnp.int32) // 8) * 8
        return r0 // brick                                    # brick row

    rb0 = window_starts(ay, by, tv, n_y)                      # (S, Tv)
    cb0 = window_starts(ax, bx, tu, n_x)                      # (S, Tu)
    steps = jnp.arange(nb)

    # Max over the row window: (S, Tv, Xb).
    ridx = jnp.clip(rb0[..., None] + steps, 0, yb - 1)        # (S, Tv, nb)
    rows = jnp.take_along_axis(
        jnp.broadcast_to(brickmax[:, None], (s, tv, yb, xb)),
        jnp.broadcast_to(ridx[..., None], (s, tv, nb, xb)),
        axis=2,
    )  # (S, Tv, nb, Xb)
    row_max = jnp.max(rows, axis=2)                           # (S, Tv, Xb)

    # Max over the col window: (S, Tv, Tu).
    cidx = jnp.clip(cb0[..., None] + steps, 0, xb - 1)        # (S, Tu, nb)
    cols = jnp.take_along_axis(
        jnp.broadcast_to(row_max[:, :, None], (s, tv, tu, xb)),
        jnp.broadcast_to(cidx[:, None], (s, tv, tu, nb)),
        axis=3,
    )  # (S, Tv, Tu, nb)
    occ = (jnp.max(cols, axis=3) > 0.0).astype(brickmax.dtype)
    return jax.lax.stop_gradient(occ)
