"""Replicated-grid data parallelism: ray tiles sharded over the mesh (C10).

This is the renderer's DP: the "batch" is rays (intermediate-image rows),
the "parameters" are the voxel grid. The row-affine sweep factorization
makes ray-tile sharding free — a device's row tile only changes the
per-slice row-interp intercept by ``row_offset * ay``, a scalar fixup done
inside ``shard_map`` from ``axis_index`` (no ray data movement at all).

Gradients w.r.t. the replicated grid are all-reduced over ICI by
``shard_map``'s transpose of the replicated capture (an XLA ``psum``),
matching BASELINE.json:5 "voxel-grid parameter gradients are all-reduced
over ICI".
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from tpuvr.config import RenderConfig
from tpuvr.ops.geometry import (
    band_bounds, plan_sweep, plan_valid_mask, ray_dt, slice_coeffs,
    warp_to_pixels,
)
from tpuvr.ops.render import grid_to_sweep_layout, slice_enables
from tpuvr.ops.vjp import resolve_impl, sweep_op
from tpuvr.ref.camera import dominant_axis


def data_mesh(n_devices: Optional[int] = None) -> Mesh:
    """1-D mesh over local (or all) devices: axis 'data' shards rays."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), ("data",))


def render_view_dp(
    grid,
    cam,
    mesh: Mesh,
    cfg: RenderConfig = RenderConfig(),
    impl: Optional[str] = None,
):
    """Forward render with intermediate-image rows sharded over 'data'.

    Each device sweeps its own (V/n, U) ray tile against the full
    (replicated) grid; the intermediate image is reassembled by the
    out-sharding and warped to pixels outside the sharded region.

    Returns (rgb (H, W, 3), trans (H, W)) as a global array.
    """
    axis = dominant_axis(cam)
    plan, uv_pixel = plan_sweep(cam, grid.shape, axis)
    n_shards = mesh.shape["data"]
    if plan.n_v % n_shards:
        raise ValueError(
            f"intermediate rows {plan.n_v} not divisible by mesh size "
            f"{n_shards}"
        )
    rows_local = plan.n_v // n_shards
    dtype = grid.dtype
    grid_sc = grid_to_sweep_layout(grid, axis)
    ay, by, ax, bx = slice_coeffs(plan, dtype)
    dt_map = ray_dt(plan, dtype)
    enables = slice_enables(grid_sc, plan.reverse, cfg.use_occupancy)
    enables = enables * plan_valid_mask(plan, dtype)

    op = sweep_op(
        plan.reverse,
        cfg.sigma_scale,
        cfg.early_stop_eps,
        resolve_impl(impl),
        cfg.precision,
        band=band_bounds(plan),
    )

    def local(grid_sc, ay, by, ax, bx, enables, dt_tile):
        row_off = (jax.lax.axis_index("data") * rows_local).astype(dtype)
        rgb, trans = op(
            grid_sc, (ay, by + row_off * ay, ax, bx), enables, dt_tile
        )
        return rgb, trans

    rgb, trans = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(), P(), P(), P(), P(), P(), P("data", None)),
        out_specs=(P(None, "data", None), P("data", None)),
    )(grid_sc, ay, by, ax, bx, enables, dt_map)

    inter = jnp.transpose(jnp.concatenate([rgb, trans[None]], 0), (1, 2, 0))
    img = warp_to_pixels(inter, plan, uv_pixel)
    return img[..., :3], img[..., 3]
