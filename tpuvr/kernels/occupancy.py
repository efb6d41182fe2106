"""Coarse occupancy structure for empty-space skipping (C6).

The reference keeps a coarse max-density grid to skip empty bricks
(reconstructed occupancy structure, SURVEY.md §2.1). In the sweep design
the natural skip granularity is the *slice* (a whole march step), so the
occupancy feeds per-slice enables; the brick field is also exposed for
diagnostics and for the fixed-dt oracle's t-range clamping. (A
per-(slice, 128^2-tile) gate layer existed through round 4 and was
REMOVED in round 5: measured 1.7x SLOWER even on its designed best
case, a 512^3 hollow shell viewed on-axis (BASELINE.md r5 row);
the per-tile branches defeat Mosaic's cross-slice pipelining.)

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
