"""Ray re-tiling with ``all_to_all`` — the Ulysses analog (SURVEY.md §2.2).

The z-sharded path (:mod:`tpuvr.dist.sharded_grid`) has every device sweep
*all* intermediate-image rows through its slab and then composite segments
over the 'z' axis. Its ``all_gather`` fold replicates every segment to
every device: O(n) receive volume and an O(n)-deep fold on all of them.

This module re-tiles instead: after the local slab sweep, one
``jax.lax.all_to_all`` swaps the layout "my slab x all rows" into
"all slabs x my row tile" — each device then folds its own 1/n of the
image front-to-back locally. Same wire volume per device as all_gather,
but the fold state and output are sharded, so memory and fold compute drop
by the 'z' axis size. This is exactly the sequence-parallel Ulysses move
(all_to_all between a "heads"-sharded and "sequence"-sharded layout), with
rays as the sequence and grid slabs as the heads.

Everything here is differentiable: ``all_to_all`` transposes to itself
(reversed), so grid gradients flow back slab-sharded with no extra
collectives, matching the sharded-grid gradient story (C11).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from tpuvr.config import RenderConfig
from tpuvr.ops.geometry import (
    band_bounds,
    plan_sweep,
    plan_valid_mask,
    ray_dt,
    slice_coeffs,
    warp_to_pixels,
)
from tpuvr.ops.render import grid_to_sweep_layout
from tpuvr.ops.vjp import resolve_impl, sweep_op
from tpuvr.ref.camera import dominant_axis


def retile_rows_to_slabs(x, axis_name: str, row_axis: int):
    """(my slab, all rows) -> (all slabs, my row tile).

    Splits ``row_axis`` into axis-size chunks, exchanges them over
    ``axis_name``, and stacks the received per-slab pieces on a new
    leading axis in ring (= traversal) order.
    """
    n = jax.lax.axis_size(axis_name)
    out = jax.lax.all_to_all(
        x, axis_name, split_axis=row_axis, concat_axis=0, tiled=True
    )
    # tiled=True concatenates source-device blocks along axis 0; split
    # them back out as a leading slab axis.
    return out.reshape((n, out.shape[0] // n) + out.shape[1:])


def fold_segments_retiled(rgb_d, t_d, axis_name: str,
                          reverse: bool = False):
    """Composite per-slab segments into this device's row tile.

    Args:
      rgb_d: (3, V, U) this slab's color segment over all rows.
      t_d:   (V, U) this slab's transmittance segment.
      reverse: device ring order is REVERSED traversal order (reverse
        sweeps: slab d covers traversal steps from the far end), so the
        front-to-back fold walks the received segments backwards.

    Returns:
      (rgb (3, V/n, U), trans (V/n, U)) for this device's row tile, where
      n is the 'z' axis size. Front-to-back fold with the associative
      composite (C1,T1) + (T1*C2, T1*T2).
    """
    c_segs = retile_rows_to_slabs(rgb_d, axis_name, row_axis=1)
    t_segs = retile_rows_to_slabs(t_d, axis_name, row_axis=0)
    n = c_segs.shape[0]
    order = range(n - 1, -1, -1) if reverse else range(n)
    order = list(order)
    color, trans = c_segs[order[0]], t_segs[order[0]]
    for i in order[1:]:
        color = color + trans[None] * c_segs[i]
        trans = trans * t_segs[i]
    return color, trans


def render_view_retiled(
    grid,
    cam,
    mesh: Mesh,
    cfg: RenderConfig = RenderConfig(),
    impl: Optional[str] = None,
):
    """z-sharded render with the all_to_all (Ulysses-analog) fold.

    Like :func:`tpuvr.dist.sharded_grid.render_view_zsharded` but the
    segment fold is sharded: output rows are sharded over ('data', 'z').
    Returns (rgb (H, W, 3), trans (H, W)) fully assembled on the host
    process (addressable as a sharded jax.Array under jit).
    """
    if cfg.early_stop_eps:
        cfg = dataclasses.replace(cfg, early_stop_eps=0.0)
    axis = dominant_axis(cam)
    plan, uv_pixel = plan_sweep(cam, grid.shape, axis)
    dtype = grid.dtype
    n_z = mesh.shape["z"]
    n_data = mesh.shape["data"]
    if plan.n_planes % n_z:
        raise ValueError(
            f"{plan.n_planes} slices not divisible by z-mesh {n_z}"
        )
    if plan.n_v % (n_data * n_z):
        raise ValueError(
            f"{plan.n_v} rows not divisible by mesh {n_data}x{n_z}"
        )
    rows_data = plan.n_v // n_data

    grid_sc = grid_to_sweep_layout(grid, axis)
    if plan.reverse:
        grid_sc = grid_sc[::-1]
    ay, by, ax, bx = slice_coeffs(plan, dtype)
    valid = plan_valid_mask(plan, dtype)
    dt_map = ray_dt(plan, dtype)
    op = sweep_op(
        False, cfg.sigma_scale, 0.0, resolve_impl(impl), cfg.precision,
        band=band_bounds(plan),
    )

    def local(grid_slab, ay, by, ax, bx, valid, dt_tile):
        row_off = (jax.lax.axis_index("data") * rows_data).astype(dtype)
        slice_max = jnp.max(grid_slab[:, 0, :, :], axis=(1, 2))
        enables = jax.lax.stop_gradient(
            (slice_max > 0.0).astype(dtype)
            if cfg.use_occupancy
            else jnp.ones_like(slice_max)
        ) * valid
        rgb_d, t_d = op(
            grid_slab, (ay, by + row_off * ay, ax, bx), enables, dt_tile
        )
        return fold_segments_retiled(rgb_d, t_d, "z")

    rgb, trans = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(
            P("z"), P("z"), P("z"), P("z"), P("z"), P("z"),
            P("data", None),
        ),
        out_specs=(
            P(None, ("data", "z"), None),
            P(("data", "z"), None),
        ),
    )(grid_sc, ay, by, ax, bx, valid, dt_map)

    inter = jnp.transpose(jnp.concatenate([rgb, trans[None]], 0), (1, 2, 0))
    img = warp_to_pixels(inter, plan, uv_pixel)
    return img[..., :3], img[..., 3]
