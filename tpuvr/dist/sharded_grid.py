"""Spatially-sharded grid rendering: slab sharding + segment compositing
(C11; SURVEY.md §3.4, §5 "long-context").

When the grid outgrows one device's HBM, it shards along the sweep axis:
device d owns a contiguous slab of slices *in traversal order*. Each device
sweeps its slab over all (or its row-tile of) intermediate rays, producing
a ray segment ``(C_d, T_d)``; segments fold front-to-back with the
associative composite ``(C1,T1) ⊕ (C2,T2) = (C1 + T1*C2, T1*T2)`` — the
ring-attention analog for rays (online-softmax-style partials). Because
plane-sweep samples touch exactly one slice, slabs need **no halo
exchange**.

Two composition strategies over the 'z' mesh axis:
  - ``fold='all_gather'``: gather the (small) segment images and fold
    locally — one collective, O(n) memory;
  - ``fold='ring'``: pass a running prefix around the ring with
    ``ppermute`` (n-1 hops, minimal footprint; the ICI-friendly form that
    pipelines across frames).

Gradients: the per-slab sweep uses the custom VJP; grid gradients stay
*sharded* (each device only gets its slab's gradient — no all-reduce), per
BASELINE.json:5's sharded-grid path. Early ray termination is disabled
here (a slab cannot see upstream transmittance); occupancy skipping still
applies per slab.

Supports a 2-D ('data', 'z') mesh: rays row-sharded over 'data' (C10)
*and* the grid slab-sharded over 'z'.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from tpuvr.config import RenderConfig
from tpuvr.ops.geometry import band_bounds, plan_sweep, ray_dt, slice_coeffs, warp_to_pixels
from tpuvr.ops.render import grid_to_sweep_layout
from tpuvr.ops.vjp import resolve_impl, sweep_op
from tpuvr.ref.camera import dominant_axis


def grid_mesh(n_data: int = 1, n_z: int = 1) -> Mesh:
    """('data', 'z') mesh over the first n_data*n_z local devices."""
    devs = np.asarray(jax.devices()[: n_data * n_z]).reshape(n_data, n_z)
    return Mesh(devs, ("data", "z"))


def _fold_gathered(c_segs, t_segs):
    """Front-to-back fold of (n, 3, V, U) / (n, V, U) segment stacks."""
    n = c_segs.shape[0]
    color = c_segs[0]
    trans = t_segs[0]
    for i in range(1, n):
        color = color + trans[None] * c_segs[i]
        trans = trans * t_segs[i]
    return color, trans


def _ring_compose(rgb_d, t_d, axis_name: str):
    """Prefix-compose segments around the 'z' ring with ppermute.

    After n-1 hops every device holds the full composite (each hop ships
    the accumulated prefix one device down the traversal order while a
    running suffix comes up — implemented here as the simple linear form:
    accumulate the prefix from upstream, then broadcast the final result).
    """
    n = jax.lax.axis_size(axis_name)
    idx = jax.lax.axis_index(axis_name)
    # Running prefix (C, T) marching down the ring: after step s, device d
    # holds the composite of segments [d-s-1 .. d] clipped to >= 0.
    color, trans = rgb_d, t_d
    for s in range(1, n):
        perm = [(i, (i + 1) % n) for i in range(n)]
        c_up = jax.lax.ppermute(color, axis_name, perm)
        t_up = jax.lax.ppermute(trans, axis_name, perm)
        # Devices whose window would cross the ring seam keep theirs.
        take = idx >= s
        new_c = jnp.where(take, c_up + t_up * rgb_d, color)
        new_t = jnp.where(take, t_up * t_d, trans)
        # Re-fold: the recurrence needs the prefix ending at d each step:
        color, trans = new_c, new_t
    # Device n-1 now holds the full composite; broadcast it (psum of a
    # single-contributor sum — ppermute cannot express one-to-all).
    last = (idx == n - 1).astype(color.dtype)
    full_c = jax.lax.psum(color * last, axis_name)
    full_t = jax.lax.psum(trans * last, axis_name)
    return full_c, full_t


def render_view_zsharded(
    grid,
    cam,
    mesh: Mesh,
    cfg: RenderConfig = RenderConfig(),
    impl: Optional[str] = None,
    fold: str = "all_gather",
):
    """Render with the grid slab-sharded over 'z' (and rays over 'data').

    Args:
      mesh: a Mesh with axes ('data', 'z') (either may have size 1).
      fold: 'all_gather' or 'ring' segment composition.

    Returns (rgb (H, W, 3), trans (H, W)) replicated.
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
    if plan.n_v % n_data:
        raise ValueError(
            f"{plan.n_v} rows not divisible by data-mesh {n_data}"
        )
    rows_local = plan.n_v // n_data

    # Pre-orient everything in traversal order so slab d is the d-th
    # segment front-to-back and each local sweep runs forward.
    grid_sc = grid_to_sweep_layout(grid, axis)
    if plan.reverse:
        grid_sc = grid_sc[::-1]
    ay, by, ax, bx = slice_coeffs(plan, dtype)  # already traversal order
    dt_map = ray_dt(plan, dtype)
    op = sweep_op(
        False, cfg.sigma_scale, 0.0, resolve_impl(impl), cfg.precision,
        band=band_bounds(plan),
    )

    def local(grid_slab, ay, by, ax, bx, dt_tile):
        row_off = (jax.lax.axis_index("data") * rows_local).astype(dtype)
        slice_max = jnp.max(grid_slab[:, 0, :, :], axis=(1, 2))
        enables = jax.lax.stop_gradient(
            (slice_max > 0.0).astype(dtype)
            if cfg.use_occupancy
            else jnp.ones_like(slice_max)
        )
        rgb_d, t_d = op(
            grid_slab, (ay, by + row_off * ay, ax, bx), enables, dt_tile
        )
        if fold == "ring":
            color, trans = _ring_compose(rgb_d, t_d, "z")
        elif fold == "all_gather":
            c_segs = jax.lax.all_gather(rgb_d, "z")
            t_segs = jax.lax.all_gather(t_d, "z")
            color, trans = _fold_gathered(c_segs, t_segs)
        else:
            raise ValueError(f"unknown fold: {fold}")
        return color, trans

    rgb, trans = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(
            P("z"), P("z"), P("z"), P("z"), P("z"), P("data", None),
        ),
        out_specs=(P(None, "data", None), P("data", None)),
        # The folded segments are value-replicated over 'z' (all_gather or
        # final psum-broadcast), but the vma type system can't infer it.
        check_vma=False,
    )(grid_sc, ay, by, ax, bx, dt_map)

    inter = jnp.transpose(jnp.concatenate([rgb, trans[None]], 0), (1, 2, 0))
    img = warp_to_pixels(inter, plan, uv_pixel)
    return img[..., :3], img[..., 3]
