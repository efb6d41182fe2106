"""Spatially-sharded grid rendering: slab sharding + segment compositing
(C11; SURVEY.md §3.4, §5 "long-context").

When the grid outgrows one device's HBM, it shards along the sweep axis:
device d owns a contiguous slab of slices *in traversal order*. Each device
sweeps its slab over its row-tile of intermediate rays, producing a ray
segment ``(C_d, T_d)``; segments fold front-to-back with the associative
composite ``(C1,T1) ⊕ (C2,T2) = (C1 + T1*C2, T1*T2)`` — the ring-attention
analog for rays (online-softmax-style partials). Because plane-sweep
samples touch exactly one slice, slabs need **no halo exchange**.

Two composition strategies over the 'z' mesh axis, both producing each
device's row-tile of the final composite (rows end up sharded over
('data', 'z'); shard_map's out sharding reassembles the image):

  - ``fold='all_gather'``: gather the segment images and fold locally —
    one collective shipping 4*(n-1)*|img| floats per device, O(n) live
    segments, the whole fold recomputed on every device.
  - ``fold='ring'``: pipelined ring **reduce-scatter** with the ordered
    ⊕ — per hop each device ships one 1/n row-tile's two-sided partial
    (8*|img|/n floats), n-1 hops => 8*(n-1)/n*|img| total: n/2 x less
    wire traffic than all_gather, O(1) live state, fold FLOPs sharded.
    The ⊕ fold is order-sensitive, so the in-flight partial carries a
    (left, right) pair: devices before the ring seam extend the right
    fold, devices after it the left, and the final value is L ⊕ R.

Gradients: the per-slab sweep uses the custom VJP; grid gradients stay
*sharded* over 'z' (each device only gets its slab's gradient — no
all-reduce over 'z'; the op's bwd psums only over 'data' ray tiles), per
BASELINE.json:5's sharded-grid path. Early ray termination is disabled
here (a slab cannot see upstream transmittance); occupancy skipping still
applies per slab.

Supports a 2-D ('data', 'z') mesh: rays row-sharded over 'data' (C10)
*and* the grid slab-sharded over 'z'. All shard_maps run with vma
checking on (check_vma defaults True); see tpuvr.ops.vjp.op_bwd for the
typed grid-cotangent rule.

Measured on the 8-device CPU mesh (32^3 @ 64^2, 2026-08-18): all_gather
6.3 ms/frame vs ring 8.4 ms/frame — the n-1 sequential ppermute hops cost
more than one fused collective when "wire traffic" is memcpy inside one
process. ``all_gather`` therefore stays the default; 'ring' is the
ICI-friendly form whose n/2 x per-device traffic advantage can only
materialize on real multi-chip ICI at n >= 4 slabs.
"""

from __future__ import annotations

import dataclasses
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


def _row_tile(color, trans, idx, r):
    """Rows [idx*r, idx*r + r) of a (3, V, U) / (V, U) pair."""
    return (
        jax.lax.dynamic_slice_in_dim(color, idx * r, r, axis=1),
        jax.lax.dynamic_slice_in_dim(trans, idx * r, r, axis=0),
    )


def _ring_compose_rs(rgb_d, t_d, axis_name: str):
    """Ordered ring reduce-scatter of ray segments with ⊕.

    Device d's segment covers all (locally-'data'-sharded) rows; the
    output is d's 1/n row-tile of the FULL front-to-back composite.
    Tile j's partial starts at device j+1 and travels the ring absorbing
    each device's segment; because ⊕ is associative but not commutative,
    the partial is a (left, right) pair split at the ring seam: devices
    with index > tile extend R (they compose after the seam start in
    traversal order is wrong side)... concretely, for tile c the partial
    visits devices c+1, .., n-1 (extend R = fold(c+1..)), wraps, then
    0, .., c (extend L = fold(0..)); the finished tile is L ⊕ R =
    fold(0..n-1). Per hop each device ships 8*rows/n*U floats (two (C,T)
    pairs of one tile) — n/2 x less total traffic than all_gather.
    """
    n = jax.lax.axis_size(axis_name)
    idx = jax.lax.axis_index(axis_name)
    rows = t_d.shape[0]
    if rows % n:
        raise ValueError(f"{rows} local rows not divisible by ring size {n}")
    r = rows // n
    if n == 1:
        return rgb_d, t_d

    # Init: device d starts tile c0 = (d-1) mod n with its own segment.
    c0 = (idx - 1) % n
    sc, st = _row_tile(rgb_d, t_d, c0, r)
    wrapped = idx <= c0  # only idx == 0 wraps at init
    zc, ot = jnp.zeros_like(sc), jnp.ones_like(st)
    l_c = jnp.where(wrapped, sc, zc)
    l_t = jnp.where(wrapped, st, ot)
    r_c = jnp.where(wrapped, zc, sc)
    r_t = jnp.where(wrapped, ot, st)

    perm = [(i, (i + 1) % n) for i in range(n)]
    for s in range(n - 1):
        l_c, l_t, r_c, r_t = (
            jax.lax.ppermute(x, axis_name, perm)
            for x in (l_c, l_t, r_c, r_t)
        )
        c = (idx - 2 - s) % n
        sc, st = _row_tile(rgb_d, t_d, c, r)
        right = idx > c  # pre-seam in traversal order: extend the R fold
        r_c = jnp.where(right, r_c + r_t[None] * sc, r_c)
        r_t = jnp.where(right, r_t * st, r_t)
        l_c = jnp.where(right, l_c, l_c + l_t[None] * sc)
        l_t = jnp.where(right, l_t, l_t * st)
    # Device d now holds tile d: finish with L ⊕ R.
    return l_c + l_t[None] * r_c, l_t * r_t


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
      fold: 'all_gather' or 'ring' segment composition (see module doc).

    Returns (rgb (H, W, 3), trans (H, W)) with intermediate rows sharded
    over ('data', 'z') and reassembled by the out sharding.
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
    rows_local = plan.n_v // n_data

    # Pre-orient everything in traversal order so slab d is the d-th
    # segment front-to-back and each local sweep runs forward.
    grid_sc = grid_to_sweep_layout(grid, axis)
    if plan.reverse:
        grid_sc = grid_sc[::-1]
    ay, by, ax, bx = slice_coeffs(plan, dtype)  # already traversal order
    valid = plan_valid_mask(plan, dtype)        # traversal order too
    dt_map = ray_dt(plan, dtype)
    op = sweep_op(
        False, cfg.sigma_scale, 0.0, resolve_impl(impl), cfg.precision,
        band=band_bounds(plan),
    )

    def local(grid_slab, ay, by, ax, bx, valid, dt_tile):
        row_off = (jax.lax.axis_index("data") * rows_local).astype(dtype)
        slice_max = jnp.max(grid_slab[:, 0, :, :], axis=(1, 2))
        enables = jax.lax.stop_gradient(
            (slice_max > 0.0).astype(dtype)
            if cfg.use_occupancy
            else jnp.ones_like(slice_max)
        ) * valid
        rgb_d, t_d = op(
            grid_slab, (ay, by + row_off * ay, ax, bx), enables, dt_tile
        )
        if fold == "ring":
            return _ring_compose_rs(rgb_d, t_d, "z")
        if fold == "all_gather":
            c_segs = jax.lax.all_gather(rgb_d, "z")
            t_segs = jax.lax.all_gather(t_d, "z")
            color, trans = _fold_gathered(c_segs, t_segs)
            # Every device holds the full composite (typed z-varying);
            # return this device's z row-tile — the out sharding
            # reassembles, and no varying->invariant cast is needed.
            return _row_tile(
                color, trans, jax.lax.axis_index("z"), rows_local // n_z
            )
        raise ValueError(f"unknown fold: {fold}")

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
