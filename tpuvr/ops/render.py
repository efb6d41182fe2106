"""User-facing differentiable render op (C1-C6; VJP added by tpuvr.ops.vjp).

``render_view(grid, cam)`` is the TPU-native equivalent of the reference's
``main -> enqueue render kernel -> read framebuffer`` path (SURVEY.md §3.1):
it factors the camera into a sweep plan (host-side, trace-time), streams the
grid through the Pallas sweep kernel, and applies the final pixel warp.
Jit it with ``cam``/``cfg`` static::

    step = jax.jit(render_view, static_argnames=("cam", "cfg"))
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from tpuvr.config import LightingConfig, RenderConfig
from tpuvr.ops.geometry import (
    band_bounds,
    plan_sweep,
    plan_valid_mask,
    ray_dt,
    slice_coeffs,
    warp_to_pixels,
)
from tpuvr.ops.vjp import chunked_sweep, resolve_impl, sweep_op
from tpuvr.ref.camera import dominant_axis
from tpuvr.ref.march import GRID_PERM


def grid_to_sweep_layout(grid, axis: int):
    """(Z, Y, X, 4) -> (S, 4, Y, X) kernel layout for the given sweep axis."""
    grid_p = jnp.transpose(grid, GRID_PERM[axis])
    return jnp.transpose(grid_p, (0, 3, 1, 2))


def sweep_layout_to_grid(grid_sc, axis: int):
    """Inverse of :func:`grid_to_sweep_layout` (every GRID_PERM is an
    involution, so the same permutation undoes it)."""
    g = jnp.transpose(grid_sc, (0, 2, 3, 1))
    return jnp.transpose(g, GRID_PERM[axis])


def slice_enables(grid_sc, reverse: bool, use_occupancy: bool):
    """Per-traversal-slice 0/1 compute flags from slice occupancy.

    A slice whose max density is <= 0 contributes exactly nothing to the
    march, so skipping it is lossless empty-space skipping (C6). The flags
    feed kernel control flow only — gradients don't flow through them.
    """
    import jax

    s = grid_sc.shape[0]
    if not use_occupancy:
        return jnp.ones((s,), dtype=grid_sc.dtype)
    slice_max = jnp.max(grid_sc[:, 0, :, :], axis=(1, 2))
    enables = (slice_max > 0.0).astype(grid_sc.dtype)
    if reverse:
        enables = enables[::-1]
    return jax.lax.stop_gradient(enables)


def _grid_shape_from_sweep(axis: int, gsc_shape):
    """Invert :func:`grid_to_sweep_layout`: (S, 4, Y', X') -> (Z, Y, X, 4)."""
    s, _, yp, xp = gsc_shape
    if axis == 0:
        return (xp, yp, s, 4)
    if axis == 1:
        return (yp, s, xp, 4)
    return (s, yp, xp, 4)


def prepare_grid(
    grid,
    axes=(0, 1, 2),
    lighting: Optional[LightingConfig] = None,
    precision: str = "highest",
    impl: Optional[str] = None,
):
    """Per-grid-update preprocessing for the frame loop (C6 + layout).

    The reference renderer uploads the volume once and then renders frames
    against it (reconstructed ``main -> loop{enqueue render}`` shell,
    SURVEY.md §3); the TPU-native equivalents of that upload step are the
    sweep-layout transpose, the occupancy scan, and the lighting bake —
    all O(grid) HBM passes that don't belong in the per-frame path. This
    returns a pytree ``{axis: (grid_sc, slice_max)}`` consumed by
    :func:`render_prepared`; rebuild it whenever the grid (or lighting)
    changes. Differentiable w.r.t. ``grid`` (transposes + the lighting
    bake's VJP; the occupancy fields are detached).

    Args:
      axes: which sweep axes to prepare (a camera with dominant axis not
        in ``axes`` cannot be rendered from this prep). Cameras in a known
        orbit usually need only one or two axes.
    """
    if lighting is not None and lighting.mode != "none":
        from tpuvr.ops.lighting import apply_lighting

        grid = apply_lighting(grid, lighting, precision, impl=impl)
    prep = {}
    for axis in axes:
        grid_sc = grid_to_sweep_layout(grid, axis)
        slice_max = jax.lax.stop_gradient(
            jnp.max(grid_sc[:, 0, :, :], axis=(1, 2))
        )
        prep[int(axis)] = (grid_sc, slice_max)
    return prep


def render_prepared(
    prep,
    cam,
    cfg: RenderConfig = RenderConfig(),
    impl: Optional[str] = None,
):
    """Render one view from a :func:`prepare_grid` result.

    This is the per-frame hot path: all O(grid) preprocessing lives in
    ``prepare_grid``, so a frame costs exactly the sweep kernel plus the
    O(pixels) final warp — the TPU-native analog of the reference's
    per-frame "enqueue render kernel on the resident volume".

    Returns:
      (rgb (res_y, res_x, 3), transmittance (res_y, res_x)).
    """
    axis = dominant_axis(cam)
    if axis not in prep:
        raise ValueError(
            f"camera sweeps axis {axis}, but prepare_grid was built for "
            f"axes {sorted(prep)}"
        )
    grid_sc, slice_max = prep[axis]
    plan, uv_pixel = plan_sweep(
        cam, _grid_shape_from_sweep(axis, grid_sc.shape), axis,
        oversample=cfg.oversample,
    )
    dtype = grid_sc.dtype
    coeffs = slice_coeffs(plan, dtype)
    dt_map = ray_dt(plan, dtype)
    if cfg.use_occupancy:
        enables = (slice_max > 0.0).astype(dtype)
        if plan.reverse:
            enables = enables[::-1]
    else:
        enables = jnp.ones((grid_sc.shape[0],), dtype)
    # Fly-through cameras: gate planes behind the eye to zero (lossless,
    # same mechanism as empty-space skipping).
    enables = enables * plan_valid_mask(plan, dtype)
    op = sweep_op(
        plan.reverse,
        cfg.sigma_scale,
        cfg.early_stop_eps,
        resolve_impl(impl),
        cfg.precision,
        band=band_bounds(plan),
    )
    rgb, trans = chunked_sweep(
        op, grid_sc, coeffs, enables, dt_map,
        max_rows=cfg.max_rows_per_call,
        ert_chunks=cfg.ert_chunks, reverse=plan.reverse,
        eps=cfg.early_stop_eps,
    )
    inter = jnp.concatenate([rgb, trans[None]], axis=0)
    inter = jnp.transpose(inter, (1, 2, 0))  # (V, U, 4)
    img = warp_to_pixels(inter, plan, uv_pixel)
    return img[..., :3], img[..., 3]


def render_view(
    grid,
    cam,
    cfg: RenderConfig = RenderConfig(),
    lighting: Optional[LightingConfig] = None,
    impl: Optional[str] = None,
):
    """Render one view of a (Z, Y, X, 4) voxel grid with the sweep kernel.

    Differentiable w.r.t. ``grid`` (custom VJP, recompute backward).
    Convenience wrapper: ``render_prepared(prepare_grid(grid), cam)``. For
    many frames of the same grid, call :func:`prepare_grid` once instead.

    Args:
      impl: 'pallas' (TPU kernels), 'xla' (scan fallback), or None/'auto'.
      lighting: optional LightingConfig; mode='lightvolume' multiplies the
        hemisphere sky-light volume into the emission channels before the
        sweep (C4) — the lit radiance stays one trilinear field, so the
        kernels are unchanged.

    ``cfg.mode='fixed_dt'`` routes to the classic per-pixel fixed-step
    marcher (the reference-semantics oracle, ``tpuvr.ref.march``) — exact
    but XLA-scan slow; the production path is 'plane_sweep'.

    Returns:
      (rgb (res_y, res_x, 3), transmittance (res_y, res_x)).
    """
    if cfg.mode == "fixed_dt":
        from tpuvr.ref.camera import camera_rays
        from tpuvr.ref.march import render_fixed_dt

        if lighting is not None and lighting.mode != "none":
            from tpuvr.ops.lighting import apply_lighting

            grid = apply_lighting(grid, lighting, cfg.precision, impl=impl)
        origins, dirs = camera_rays(cam, dtype=grid.dtype)
        return render_fixed_dt(grid, origins, dirs, cfg)
    if cfg.mode != "plane_sweep":
        raise ValueError(f"unknown render mode: {cfg.mode!r}")
    axis = dominant_axis(cam)
    prep = prepare_grid(
        grid, axes=(axis,), lighting=lighting, precision=cfg.precision,
        impl=impl,
    )
    return render_prepared(prep, cam, cfg, impl=impl)


def render_with_geom(
    grid,
    geom,
    axis: int,
    reverse: bool,
    cfg: RenderConfig = RenderConfig(),
    impl: Optional[str] = None,
    mesh=None,
    band: Optional[tuple] = None,
):
    """Render from precomputed per-view geometry arrays (training path).

    ``geom`` is the dict from :func:`tpuvr.ops.geometry.view_geometry`
    (``band`` its static band bound, if the caller tracked one).
    With ``mesh`` (a 1-D 'data' Mesh), intermediate-image rows are sharded
    across devices inside shard_map and the grid stays replicated — the
    C10 ray-tile DP; gradients w.r.t. grid psum automatically through
    shard_map's transpose.
    """
    import jax
    from jax.sharding import PartitionSpec as P

    from tpuvr.ops.geometry import warp_to_pixels_dynamic

    grid_sc = grid_to_sweep_layout(grid, axis)
    enables = slice_enables(grid_sc, reverse, cfg.use_occupancy)
    if "valid" in geom:
        enables = enables * geom["valid"]
    op = sweep_op(
        reverse, cfg.sigma_scale, cfg.early_stop_eps, resolve_impl(impl),
        cfg.precision, band=band,
    )
    coeffs = geom["coeffs"]
    ay, by, ax, bx = coeffs[0], coeffs[1], coeffs[2], coeffs[3]
    dt_map = geom["dt"]

    if mesh is None:
        rgb, trans = op(grid_sc, (ay, by, ax, bx), enables, dt_map)
    else:
        n_shards = mesh.shape["data"]
        rows_local = dt_map.shape[0] // n_shards
        if dt_map.shape[0] % n_shards:
            raise ValueError(
                f"intermediate rows {dt_map.shape[0]} not divisible by "
                f"mesh size {n_shards}"
            )

        def local(grid_sc, ay, by, ax, bx, enables, dt_tile):
            off = (jax.lax.axis_index("data") * rows_local).astype(
                dt_tile.dtype
            )
            return op(grid_sc, (ay, by + off * ay, ax, bx), enables, dt_tile)

        rgb, trans = jax.shard_map(
            local,
            mesh=mesh,
            in_specs=(P(), P(), P(), P(), P(), P(), P("data", None)),
            out_specs=(P(None, "data", None), P("data", None)),
        )(grid_sc, ay, by, ax, bx, enables, dt_map)

    inter = jnp.transpose(jnp.concatenate([rgb, trans[None]], 0), (1, 2, 0))
    img = warp_to_pixels_dynamic(inter, geom["lattice"], geom["uv"])
    return img[..., :3], img[..., 3]


def render(grid, cams, cfg: RenderConfig = RenderConfig(), **kw):
    """Render a list of views; returns stacked (N, H, W, 3) and (N, H, W)."""
    rgbs, ts = [], []
    for cam in cams:
        rgb, t = render_view(grid, cam, cfg, **kw)
        rgbs.append(rgb)
        ts.append(t)
    return jnp.stack(rgbs), jnp.stack(ts)
