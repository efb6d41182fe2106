"""Inverse rendering: recover a voxel grid from posed views (C9).

``fit_grid`` runs Adam on the grid against L2 image loss over posed views
(BASELINE.json:10: 256^3 from 64 views). TPU-native structure:

- views are grouped by their static sweep signature (axis, reverse); all
  per-view geometry is *data* (tpuvr.ops.geometry.view_geometry), so there
  is exactly one compiled train-step program per group — not per camera;
- each step renders a static-size minibatch of views from one group
  (round-robin) through the differentiable sweep op and updates the grid;
- with a mesh, every view's rays are row-sharded across devices and grid
  gradients all-reduce over ICI via shard_map's transpose (C10);
- density is parameterized through softplus by default so the optimizer
  never fights the renderer's rectifier (dead-relu voxels).

Checkpoint/resume via orbax every ``ckpt_every`` steps; metrics stream to
JSONL (SURVEY.md §5).
"""

from __future__ import annotations

import functools
import logging
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from tpuvr.config import RenderConfig, TrainConfig
from tpuvr.ops.geometry import view_geometry
from tpuvr.train.ckpt import Checkpointer
from tpuvr.utils.metrics import MetricsLogger, psnr

log = logging.getLogger("tpuvr")

_SOFTPLUS_INV_001 = float(np.log(np.expm1(0.01)))  # raw init -> sigma 0.01


def params_to_grid(params, density_softplus: bool):
    """Map raw optimization parameters to the rendered voxel grid."""
    if not density_softplus:
        return params
    sigma = jax.nn.softplus(params[..., :1])
    return jnp.concatenate([sigma, params[..., 1:]], axis=-1)


def init_params(grid_shape, density_softplus: bool, dtype=jnp.float32):
    params = jnp.zeros(grid_shape, dtype)
    if density_softplus:
        params = params.at[..., 0].set(_SOFTPLUS_INV_001)
    params = params.at[..., 1:].set(0.5)
    return params


def group_views(cams, grid_shape, dtype=jnp.float32,
                rays_per_view: Optional[int] = None, n_shards: int = 1):
    """Group cameras by static sweep signature; stack their geometry.

    Returns {(axis, reverse, tiles): (view_indices, stacked_geom, band,
    warp)} with ``band`` the group-wide static (max |ay|, max |ax|,
    min |ay|, min |ax|) bound for the banded kernel and ``warp`` the
    group's static :class:`tpuvr.ops.warp.WarpTiling` (or None: gather
    fallback) — the per-view footprint origins are stacked into the
    geometry dict as ``wvb``/``wub`` so the traced view pick indexes
    them like any other per-view data.

    ``tiles`` is the PER-VIEW banded tile class
    (tpuvr.kernels.sweep.band_tiles: (128, 128), (64, 64), ... or () =
    dense) computed from the rows a train step will ACTUALLY sweep —
    the ``rays_per_view`` band height divided over ``n_shards`` DP row
    shards — so the key matches sweep_fwd/sweep_bwd's runtime routing
    (which recomputes band_tiles from the runtime row count). Grouping
    on it keeps a whole orbit from being dragged to the dense kernel by
    its few most-oblique views: sub-128-slope views stay in banded
    view-batchable classes while steeper views (the 128/64 tiers are
    the only banded ones left; steeper falls back to dense, which
    measured FASTER than a 32-tile tier at the c4 config) form their
    own dense-batched class.
    """
    import os

    from tpuvr.kernels.sweep import band_tiles
    from tpuvr.ops.warp import (
        lattice_positions,
        plan_group_warp_tiling,
        plan_row_warp,
        warp_enabled,
    )
    from tpuvr.ref.march import GRID_PERM

    groups: Dict[Tuple[int, bool, tuple], Tuple[List, List, List]] = {}
    for i, cam in enumerate(cams):
        axis, reverse, geom, band = view_geometry(cam, grid_shape, dtype)
        n_v, n_u = geom["dt"].shape
        dims_p = [grid_shape[d] for d in GRID_PERM[axis][:3]]
        # Key on the tile class of the rows the step will actually
        # sweep (rays_per_view band, split over the DP row shards) so
        # the grouping matches the kernels' runtime routing.
        rows = band_rows(rays_per_view, n_v, n_u, n_shards)
        v_swept = max((rows if rows is not None else n_v) // n_shards, 1)
        tiles = band_tiles(band, v_swept, n_u, dims_p[1], dims_p[2])
        # () = dense class; a tuple keeps mixed-class key lists sortable.
        key = (axis, reverse, tiles or ())
        groups.setdefault(key, ([], [], []))
        groups[key][0].append(i)
        groups[key][1].append(geom)
        groups[key][2].append(band)
    out = {}
    for key, (idxs, geoms, bands) in groups.items():
        band = (max(b[0] for b in bands), max(b[1] for b in bands),
                min(b[2] for b in bands), min(b[3] for b in bands))
        tiling = None
        if warp_enabled():
            pos_views = []
            for g in geoms:
                n_vu = g["dt"].shape  # (V, U)
                y_pos, x_pos = lattice_positions(
                    tuple(np.asarray(g["lattice"])),
                    np.asarray(g["uv"]), n_vu[0], n_vu[1],
                )
                pos_views.append((y_pos, x_pos))
            # TPUVR_WARP=rows selects the Pallas tile-warp kernel
            # (tpuvr.kernels.warp): traced per-view footprint origins
            # ride SMEM scalar windows in one pipelined kernel instead
            # of an XLA while loop of dynamic slices. MEASURED SLOWER
            # at the judged c4 shape (21.3 vs 18.5 ms/step, 2026-08-20
            # — the 64 small per-tile grid steps of the steep groups
            # cost more than the XLA while loop they replace), so the
            # tiled warp stays the default; the kernel remains
            # available and tested for shapes with row-coherent
            # lattices (row blocks, f_v ~ 16).
            planned_rows = None
            if os.environ.get("TPUVR_WARP", "tiled") == "rows":
                planned_rows = plan_row_warp(
                    pos_views, n_vu[0], n_vu[1]
                )
            if planned_rows is not None:
                tiling, rvb, ry, rx = planned_rows
                for g, vb, yy, xx in zip(geoms, rvb, ry, rx):
                    g["rwvb"] = jnp.asarray(vb)
                    g["rwy"] = jnp.asarray(yy)
                    g["rwx"] = jnp.asarray(xx)
            else:
                planned = plan_group_warp_tiling(
                    pos_views, n_vu[0], n_vu[1]
                )
                if planned is not None:
                    tiling, wvb, wub = planned
                    for g, vb, ub in zip(geoms, wvb, wub):
                        g["wvb"] = jnp.asarray(vb)
                        g["wub"] = jnp.asarray(ub)
        stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *geoms)
        out[key] = (idxs, stacked, band, tiling)
    return out


def band_rows(rays_per_view: Optional[int], n_v: int, n_u: int,
              n_shards: int = 1) -> Optional[int]:
    """Static intermediate-row-band height for ray subsampling.

    ``TrainConfig.rays_per_view`` asks for ~that many rays per view per
    step; the row-affine sweep makes a contiguous row band the natural
    (and free) subsampling unit — a band is the full sweep with
    ``by += r0 * ay``. Rounds up to a lane/shard-friendly multiple
    (128 keeps the banded kernel eligible); None means "render all rows".
    """
    if rays_per_view is None:
        return None
    import math

    q = 128 if n_v % 128 == 0 else 8
    q = q * n_shards // math.gcd(q, n_shards)
    rows = -(-rays_per_view // n_u)
    rows = min(n_v, -(-rows // q) * q)
    return None if rows >= n_v else rows


def _slice_band(geom_batch, r0s, rows: int):
    """Row-band view of stacked geometry: by-shift + dt band per view."""
    coeffs = geom_batch["coeffs"]  # (n_views, 4, S)
    dtm = geom_batch["dt"]         # (n_views, V, U)
    by = coeffs[:, 1] + r0s[:, None].astype(dtm.dtype) * coeffs[:, 0]
    coeffs = coeffs.at[:, 1].set(by)
    dt_band = jax.vmap(
        lambda d, r: jax.lax.dynamic_slice(
            d, (r, jnp.zeros((), r.dtype)), (rows, d.shape[1])
        )
    )(dtm, r0s)
    return dict(geom_batch, coeffs=coeffs, dt=dt_band)


def make_train_step(
    key,
    n_views: int,
    opt,
    render_cfg: RenderConfig,
    density_softplus: bool,
    impl: Optional[str],
    mesh,
    grad_buckets: int = 4,
    band: Optional[tuple] = None,
    rows: Optional[int] = None,
    warp_tiling=None,
    view_batch: bool = False,
    bwd_chunks: int = 1,
    prestage: bool = False,
    kernel_softplus: bool = False,
    grad_ring: bool = False,
    lighting=None,
):
    """One jitted train step for a view group (axis, reverse static).

    Without a mesh: plain value_and_grad over the view minibatch.

    With a 'data' mesh (C10): the whole forward+backward runs inside
    shard_map with each device sweeping its row tile of every view's
    intermediate image; the (small) intermediate images are all_gather'd
    for the pixel warp + loss, and the grid gradient is all-reduced in
    ``grad_buckets`` bucketed psums so XLA can overlap early buckets with
    remaining backward work (BASELINE.json:5 "overlapped with the backward
    sweep").

    ``rows`` (from :func:`band_rows`): render only a ``rows``-high
    intermediate row band per view per step (TrainConfig.rays_per_view);
    the step then takes per-view band offsets ``r0s``. The loss is the
    masked mean over pixels whose bilinear support lies inside the band.

    ``view_batch`` (decided statically by :func:`view_batch_eligible`):
    march the whole minibatch through ONE view-batched sweep — the grid
    streams from HBM once per step instead of ``n_views`` times. At
    256^3 that is 268 MB of grid traffic per view per direction; the
    looped step is HBM-bound on exactly that re-streaming.

    ``bwd_chunks`` > 1 (mesh path only): slab-chunk the backward sweep
    and all-reduce each chunk's grid gradient inside the op as soon as
    its kernel finishes (sweep_op ``bwd_chunks``/``axis_name`` — the
    C10 allreduce/backward overlap). The gradient then comes out of
    autodiff already reduced, so the step differentiates the plain
    (invariant) params and skips the trailing bucketed psum.

    ``kernel_softplus`` (the FUSED-SOFTPLUS path): the step's
    ``params`` argument is the raw parameter grid ALREADY IN THIS
    GROUP'S SWEEP LAYOUT (S, 4, Y, X); the kernels apply softplus to
    the density channel per streamed slice (sweep_op ``softplus``) and
    emit raw-parameter gradients directly in that layout — no
    materialized softplus, no layout transposes, no slice_enables
    reduction anywhere in the step (softplus density is positive
    everywhere, so slice occupancy is vacuously all-live). fit_grid
    keeps the whole training state resident in the current group's
    layout across a steps_per_call block and re-lays it out only on
    group switches (see fit_grid).

    ``prestage``: the step takes the WHOLE group's device-resident
    geometry/targets plus a (n_views,) ``pick`` index vector and
    gathers the minibatch INSIDE the jit — signature
    ``step(params, opt_state, geom_all, targets_all, pick, r0s)``.
    Per-view leaf indexing on the host costs ~8 separate dispatches
    per step; through the axon tunnel that was half the measured c4
    step time (151.7 -> 74.8 ms isolated, 2026-08-19).
    """
    from jax.sharding import PartitionSpec as P

    from tpuvr.dist.init import bucketed_psum_grads
    from tpuvr.ops.geometry import (
        warp_to_pixels_band,
        warp_to_pixels_dynamic,
    )
    from tpuvr.ops.render import grid_to_sweep_layout, slice_enables
    from tpuvr.ops.vjp import resolve_impl, sweep_op
    from tpuvr.ops.warp import RowWarpPlan, row_warp_image, row_warp_op

    axis, reverse = key[0], key[1]
    # grad_ring (MeshConfig.grad_ring): the C10 overlap via the
    # IN-KERNEL RDMA ring backward (kernels/ring_bwd.py) — the grad
    # all-reduce rides remote DMAs between the backward kernel's own
    # grid steps instead of XLA psums scheduled next to it. The op's
    # gradient comes out already reduced; the step differentiates the
    # plain params (as in the chunked branch) and the shard_map runs
    # check_vma=False (the type system cannot see through the
    # in-kernel collective).
    ringed = mesh is not None and grad_ring
    chunked = mesh is not None and bwd_chunks > 1 and not ringed
    op = sweep_op(
        reverse, render_cfg.sigma_scale, render_cfg.early_stop_eps,
        resolve_impl(impl), render_cfg.precision, band=band,
        views=n_views if view_batch else 1,
        bwd_chunks=bwd_chunks if chunked else 1,
        axis_name="data" if chunked else None,
        softplus=kernel_softplus,
        ring=(("data", mesh.shape["data"], max(bwd_chunks, 1))
              if ringed else None),
    )

    if lighting is not None and getattr(lighting, "mode", "none") != "none" \
            and kernel_softplus:
        raise ValueError(
            "lit training needs the canonical-grid path; fused "
            "kernel_softplus keeps params layout-resident (set "
            "TPUVR_FUSED_SOFTPLUS=0 or density_softplus=False)"
        )

    def grid_and_enables(params):
        """Sweep-layout grid + slice enables from the raw parameters."""
        if kernel_softplus:
            # params ARE the sweep-layout raw grid; softplus density is
            # positive everywhere so every slice is occupied.
            return params, jnp.ones((params.shape[0],), params.dtype)
        grid = params_to_grid(params, density_softplus)
        if lighting is not None and getattr(lighting, "mode", "none") != "none":
            # LIT inverse rendering (the c5 training shape): bake the
            # sky-transmittance volume from the CURRENT density and
            # multiply it into emission before the sweep. Gradients
            # flow through the emission product (and, with
            # lighting.detach=False, through the tau sweeps' adjoints).
            from tpuvr.ops.lighting import apply_lighting

            grid = apply_lighting(grid, lighting, render_cfg.precision,
                                  impl=resolve_impl(impl))
        grid_sc = grid_to_sweep_layout(grid, axis)
        enables = slice_enables(
            grid_sc, reverse, render_cfg.use_occupancy
        )
        return grid_sc, enables

    # Row-block Pallas warp (see group_views): the full-rows loss runs
    # channels-first end to end — no (V, U, 4) transpose anywhere.
    row_op = (
        row_warp_op(warp_tiling.f_v, resolve_impl(impl))
        if isinstance(warp_tiling, RowWarpPlan) and rows is None
        else None
    )

    def finalize(step_batch):
        if not prestage:
            return jax.jit(step_batch, donate_argnums=(0, 1))

        def step_pick(params, opt_state, geom_all, targets_all, pick,
                      r0s):
            gb = jax.tree.map(lambda a: a[pick], geom_all)
            return step_batch(params, opt_state, gb, targets_all[pick],
                              r0s)

        return jax.jit(step_pick, donate_argnums=(0, 1))

    def warp_loss(inter, geom_i, target, r0):
        """Pixel warp + masked image MSE from an intermediate image.

        Row-warp mode: ``inter`` is channels-first (4, V, U) and the
        loss compares channels-first images (one small target
        transpose instead of an 8 MB lattice transpose per view)."""
        if rows is None:
            if row_op is not None:
                out = row_op(inter, geom_i["rwy"], geom_i["rwx"],
                             geom_i["rwvb"])
                img3 = row_warp_image(out[:3], warp_tiling)
                t_cf = jnp.transpose(target, (2, 0, 1))
                return jnp.mean((img3 - t_cf) ** 2)
            img = warp_to_pixels_dynamic(
                inter, geom_i["lattice"], geom_i["uv"],
                tiling=warp_tiling, vbase=geom_i.get("wvb"),
                ubase=geom_i.get("wub"),
            )[..., :3]
            return jnp.mean((img - target) ** 2)
        img, mask = warp_to_pixels_band(
            inter, geom_i["lattice"], geom_i["uv"], r0
        )
        err = jnp.mean((img[..., :3] - target) ** 2, axis=-1)
        return jnp.sum(err * mask) / jnp.maximum(jnp.sum(mask), 1.0)

    def view_loss(grid_sc, enables, geom_i, target, r0, extra_row_off=None):
        """Render one view('s band) and return its masked image MSE."""
        c = geom_i["coeffs"]
        ay, by, ax, bx = c[0], c[1], c[2], c[3]
        if extra_row_off is not None:
            by = by + extra_row_off * ay
        if "valid" in geom_i:
            enables = enables * geom_i["valid"]
        rgb_t, t_t = op(grid_sc, (ay, by, ax, bx), enables, geom_i["dt"])
        if row_op is not None:
            inter = jnp.concatenate([rgb_t, t_t[None]], 0)  # (4, V, U)
            if extra_row_off is not None:
                inter = jax.lax.all_gather(
                    inter, "data", axis=1, tiled=True
                )
        else:
            inter = jnp.transpose(
                jnp.concatenate([rgb_t, t_t[None]], 0), (1, 2, 0)
            )
            if extra_row_off is not None:
                inter = jax.lax.all_gather(
                    inter, "data", axis=0, tiled=True
                )
        return warp_loss(inter, geom_i, target, r0)

    def batched_inters(grid_sc, enables, geom_batch, extra_row_off=None):
        """All views' intermediate images from ONE batched sweep.

        Returns a LIST of n_views (V, U, 4) planes, each assembled from
        a static row slice of the stacked kernel outputs exactly like
        the per-view loop builds its plane. Materializing one stacked
        (n_views, V, U, 4) array instead blocked XLA's fusion of the
        transpose into the warp's tile gathers: the warp while-loops +
        their dynamic-update-slices measured 13.3 ms/step against the
        loop path's 5.3 at the c4 shape (xplane trace, 2026-08-20,
        tools/profile_c4.py --trace) — more than the batched sweep's
        whole gradient-traffic win."""
        c = geom_batch["coeffs"]  # (n_views, 4, S)
        ay, by, ax, bx = c[:, 0], c[:, 1], c[:, 2], c[:, 3]
        if extra_row_off is not None:
            by = by + extra_row_off * ay
        en = enables[None, :] * geom_batch["valid"]
        dt = geom_batch["dt"]  # (n_views, V, U)
        k, v_pv, n_u = dt.shape
        rgb_t, t_t = op(
            grid_sc, (ay, by, ax, bx), en, dt.reshape(k * v_pv, n_u)
        )
        outs = []
        for i in range(k):
            vs = slice(i * v_pv, (i + 1) * v_pv)
            if row_op is not None:
                outs.append(jnp.concatenate(
                    [rgb_t[:, vs], t_t[vs][None]], 0
                ))
            else:
                outs.append(jnp.transpose(
                    jnp.concatenate([rgb_t[:, vs], t_t[vs][None]], 0),
                    (1, 2, 0),
                ))
        return outs

    if mesh is None:

        def step(params, opt_state, geom_batch, targets, r0s):
            if rows is not None:
                geom_batch = _slice_band(geom_batch, r0s, rows)

            def loss_fn(params):
                grid_sc, enables = grid_and_enables(params)
                total = 0.0
                if view_batch:
                    inters = batched_inters(grid_sc, enables, geom_batch)
                    for i in range(n_views):
                        geom_i = jax.tree.map(lambda a: a[i], geom_batch)
                        total = total + warp_loss(
                            inters[i], geom_i, targets[i], r0s[i]
                        )
                else:
                    for i in range(n_views):
                        geom_i = jax.tree.map(lambda a: a[i], geom_batch)
                        total = total + view_loss(
                            grid_sc, enables, geom_i, targets[i], r0s[i]
                        )
                return total / n_views

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = opt.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, loss

        return finalize(step)

    n_shards = mesh.shape["data"]

    def local(params, geom_batch, targets, r0s):
        dtype = params.dtype
        rows_local = geom_batch["dt"].shape[1]
        row_off = (jax.lax.axis_index("data") * rows_local).astype(dtype)

        def loss_local(params):
            grid_sc, enables = grid_and_enables(params)
            total = 0.0
            if view_batch:
                inters = batched_inters(
                    grid_sc, enables, geom_batch, extra_row_off=row_off
                )
                gather_axis = 1 if row_op is not None else 0
                inters = [
                    jax.lax.all_gather(x, "data", axis=gather_axis,
                                       tiled=True)
                    for x in inters
                ]
                for i in range(n_views):
                    geom_i = jax.tree.map(lambda a: a[i], geom_batch)
                    total = total + warp_loss(
                        inters[i], geom_i, targets[i], r0s[i]
                    )
                return total / n_views
            for i in range(n_views):
                geom_i = jax.tree.map(lambda a: a[i], geom_batch)
                total = total + view_loss(
                    grid_sc, enables, geom_i, targets[i], r0s[i],
                    extra_row_off=row_off,
                )
            return total / n_views

        if chunked or ringed:
            # Overlap mode: the op's backward already all-reduced each
            # slab chunk's gradient over 'data' (chunked: collectives
            # scheduled between the chunked backward kernels; ringed:
            # remote DMAs inside ONE backward kernel); differentiate
            # the plain invariant params and do NOT re-reduce.
            loss, grads = jax.value_and_grad(loss_local)(params)
            loss = jax.lax.psum(loss, "data") / n_shards
            return loss, grads
        # COMM-MINIMAL grad reduction (bwd_chunks == 1): grads
        # accumulate across views locally and psum ONCE per step
        # (n_views x less ICI traffic than a per-view psum), split into
        # ``grad_buckets`` collectives — which all land AFTER the last
        # backward kernel by construction. The chunked branch above is
        # the overlap path (per-chunk psums interleaved between the
        # chunked backward kernels; see tools/overlay_evidence.py —
        # XLA:TPU still emits them synchronously next to Pallas
        # custom-calls, so interleaved-not-hidden is the measured
        # round-3 state). Differentiating a pcast-varying view of the
        # params keeps the reduction ours (op_bwd skips its implicit
        # psum).
        params_v = jax.lax.pcast(params, ("data",), to="varying")
        loss, grads = jax.value_and_grad(loss_local)(params_v)
        grads = bucketed_psum_grads(grads, "data", grad_buckets)
        # Per-device losses are equal post-all_gather but typed varying;
        # the scalar psum/n is the cheapest invariant-typed equivalent.
        loss = jax.lax.psum(loss, "data") / n_shards
        return loss, grads

    def step(params, opt_state, geom_batch, targets, r0s):
        if rows is not None:
            geom_batch = _slice_band(geom_batch, r0s, rows)
        loss, grads = jax.shard_map(
            local,
            mesh=mesh,
            in_specs=(P(), _geom_specs(geom_batch), P(), P()),
            out_specs=(P(), P()),
            check_vma=not ringed,
        )(params, geom_batch, targets, r0s)
        updates, opt_state = opt.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return finalize(step)


def view_batch_eligible(k_views: int, band, grid_shape, axis: int,
                        v_per_view: int, n_u: int) -> bool:
    """Can this view group's step use the view-batched sweep?

    Always, for a real minibatch: sweep_fwd routes a view batch to the
    full-128 banded batched kernel when the group's band qualifies and
    to the DENSE batched kernel (position-vector A side) otherwise, so
    there is no shape constraint left. The XLA impl routes to a
    semantically identical per-view loop twin (so the batched call
    shape is exercised on CPU meshes too); the single-stream win is the
    Pallas kernels'. ``TPUVR_VIEW_BATCH=0`` is the escape hatch back to
    the view loop.
    """
    import os

    del band, grid_shape, axis, v_per_view, n_u  # routing is internal
    if k_views <= 1:
        return False
    return os.environ.get("TPUVR_VIEW_BATCH", "1") != "0"


def _geom_specs(geom_batch):
    """Row-sharding specs matching the ACTUAL stacked-geometry keys.

    'wvb'/'wub' are only present when group_views planned a warp tiling
    (TPUVR_WARP=gather or an undividable resolution omits them), so the
    specs must be derived from the batch, not hard-coded — a fixed dict
    would fail shard_map's pytree-structure check for the gather path.
    Only 'dt' is ray-row data; everything else is per-view scalars.
    """
    from jax.sharding import PartitionSpec as P

    return {
        k: (P(None, "data", None) if k == "dt" else P())
        for k in geom_batch
    }


def make_train_step_zsharded(
    key,
    n_views: int,
    opt,
    render_cfg: RenderConfig,
    density_softplus: bool,
    impl: Optional[str],
    mesh,
    grad_buckets: int = 4,
    band: Optional[tuple] = None,
    rows: Optional[int] = None,
    warp_tiling=None,
    prestage: bool = False,
):
    """Train step with the grid (and optimizer state) slab-sharded over
    'z' and rays row-sharded over 'data' — C11 completed for *training*:
    grids too big to replicate are exactly the ones you fit.

    Requirements:
      - ('data', 'z') mesh; params (Z, Y, X, 4) sharded P('z') on dim 0;
      - every camera in the group sweeps the grid's z axis (axis == 2), so
        the stored Z sharding IS the sweep-slab sharding (no per-step grid
        re-tiling). Cross-axis groups would need an all_to_all of the full
        grid every step — use the replicated DP trainer for those.

    Mechanics: each ('data' i, 'z' d) device sweeps its slab over its row
    tile producing a ray segment; segments fold over 'z' with the
    RETILE all_to_all (tpuvr.dist.retile: the Ulysses-analog fold), so
    the fold state, the pixel warp, AND the loss stay row-sharded over
    ('data', 'z') — each device warps only its own row block (plus a
    one-row ppermute halo) and contributes a disjoint masked partial
    loss. At the 512^3 @ 1024^2 scale this trainer exists for, the old
    full-image all_gather cost 4 x n_z x the necessary bytes and
    O(image) redundant warp work per device. Gradients w.r.t. the slab
    stay z-local (no collective over 'z') and are bucket-psum'd over
    'data' only. (The rays_per_view band path keeps the gathered-band
    loss: its band is already small.)
    Traversal-order bookkeeping: slab d covers traversal steps
    [d*sz, (d+1)*sz) for forward views and [(n-1-d)*sz, (n-d)*sz) for
    reverse views (the local sweep itself runs with the group's reverse
    flag against the ascending-z slab).
    """
    from jax.sharding import PartitionSpec as P

    from tpuvr.dist.init import bucketed_psum_grads
    from tpuvr.dist.retile import fold_segments_retiled
    from tpuvr.dist.sharded_grid import _fold_gathered
    from tpuvr.ops.geometry import (
        warp_to_pixels_band,
        warp_to_pixels_owned,
    )
    from tpuvr.ops.render import grid_to_sweep_layout, slice_enables
    from tpuvr.ops.vjp import resolve_impl, sweep_op

    axis, reverse = key[0], key[1]
    if axis != 2:
        raise ValueError(
            "z-sharded training requires cameras whose dominant sweep "
            f"axis is the grid z axis (got axis={axis}); render those "
            "views with the replicated DP trainer instead"
        )
    n_z = mesh.shape["z"]
    n_data = mesh.shape["data"]
    # Slabs cannot see upstream transmittance: ERT off inside the op.
    op = sweep_op(
        reverse, render_cfg.sigma_scale, 0.0,
        resolve_impl(impl), render_cfg.precision, band=band,
    )

    def local(params, geom_batch, targets, r0s):
        dtype = params.dtype
        rows_local = geom_batch["dt"].shape[1]
        row_off = (jax.lax.axis_index("data") * rows_local).astype(dtype)
        zi = jax.lax.axis_index("z")

        def loss_local(params_v):
            grid = params_to_grid(params_v, density_softplus)
            grid_sc = grid_to_sweep_layout(grid, axis)  # (sz, 4, Y, X)
            sz = grid_sc.shape[0]
            occ = slice_enables(grid_sc, reverse, render_cfg.use_occupancy)
            slab = (n_z - 1 - zi) if reverse else zi
            k0 = slab * sz  # this slab's first traversal step

            def sl(a):  # traversal-step slice of a per-view (..., S) array
                return jax.lax.dynamic_slice_in_dim(a, k0, sz, axis=-1)

            total = 0.0
            for i in range(n_views):
                geom_i = jax.tree.map(lambda a: a[i], geom_batch)
                c = geom_i["coeffs"]
                ay, by, ax, bx = (sl(c[j]) for j in range(4))
                by = by + row_off * ay
                en = occ * sl(geom_i["valid"])
                rgb_d, t_d = op(
                    grid_sc, (ay, by, ax, bx), en, geom_i["dt"]
                )
                if rows is None:
                    # Sharded fold + sharded loss: fold over 'z' via the
                    # retile all_to_all (device ring order is reversed
                    # traversal order for reverse sweeps), one-row halo
                    # over the ('data','z') row-block ring, disjoint
                    # ownership-masked partial MSE.
                    color, trans = fold_segments_retiled(
                        rgb_d, t_d, "z", reverse=reverse
                    )
                    inter_sub = jnp.transpose(
                        jnp.concatenate([color, trans[None]], 0),
                        (1, 2, 0),
                    )  # (rows_sub, U, 4)
                    rows_sub = rows_local // n_z
                    n_blocks = n_data * n_z
                    halo = jax.lax.ppermute(
                        inter_sub[:1], ("data", "z"),
                        [(b, b - 1) for b in range(1, n_blocks)],
                    )
                    inter_halo = jnp.concatenate([inter_sub, halo], 0)
                    r0 = (jax.lax.axis_index("data") * rows_local
                          + zi * rows_sub).astype(jnp.int32)
                    img, mask = warp_to_pixels_owned(
                        inter_halo, geom_i["lattice"], geom_i["uv"],
                        r0, rows_sub, rows_local * n_data,
                    )
                    err = jnp.mean(
                        (img[..., :3] - targets[i]) ** 2, axis=-1
                    )
                    npix = targets[i].shape[0] * targets[i].shape[1]
                    total = total + jnp.sum(err * mask) / npix
                else:
                    c_segs = jax.lax.all_gather(rgb_d, "z")
                    t_segs = jax.lax.all_gather(t_d, "z")
                    if reverse:  # device order reverses traversal
                        c_segs, t_segs = c_segs[::-1], t_segs[::-1]
                    color, trans = _fold_gathered(c_segs, t_segs)
                    inter_t = jnp.transpose(
                        jnp.concatenate([color, trans[None]], 0),
                        (1, 2, 0),
                    )
                    inter = jax.lax.all_gather(
                        inter_t, "data", axis=0, tiled=True
                    )
                    img, mask = warp_to_pixels_band(
                        inter, geom_i["lattice"], geom_i["uv"], r0s[i]
                    )
                    err = jnp.mean(
                        (img[..., :3] - targets[i]) ** 2, axis=-1
                    )
                    total = total + jnp.sum(err * mask) / jnp.maximum(
                        jnp.sum(mask), 1.0
                    )
            return total / n_views

        params_v = jax.lax.pcast(params, ("data",), to="varying")
        loss, grads = jax.value_and_grad(loss_local)(params_v)
        grads = bucketed_psum_grads(grads, "data", grad_buckets)
        if rows is None:
            # Disjoint masked partials: the psum IS the global mean.
            loss = jax.lax.psum(loss, ("data", "z"))
        else:
            loss = jax.lax.psum(loss, ("data", "z")) / (n_data * n_z)
        return loss, grads

    def step(params, opt_state, geom_batch, targets, r0s):
        if rows is not None:
            geom_batch = _slice_band(geom_batch, r0s, rows)
        loss, grads = jax.shard_map(
            local,
            mesh=mesh,
            in_specs=(P("z"), _geom_specs(geom_batch), P(), P()),
            out_specs=(P(), P("z")),
        )(params, geom_batch, targets, r0s)
        updates, opt_state = opt.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    if not prestage:
        return jax.jit(step, donate_argnums=(0, 1))

    def step_pick(params, opt_state, geom_all, targets_all, pick, r0s):
        gb = jax.tree.map(lambda a: a[pick], geom_all)
        return step(params, opt_state, gb, targets_all[pick], r0s)

    return jax.jit(step_pick, donate_argnums=(0, 1))


def fit_grid(
    targets,
    cams,
    grid_shape,
    cfg: TrainConfig = TrainConfig(),
    render_cfg: RenderConfig = RenderConfig(),
    mesh=None,
    impl: Optional[str] = None,
    run_dir: Optional[str] = None,
    resume: bool = False,
    grad_buckets: int = 4,
    bwd_chunks: int = 1,
    grad_ring: bool = False,
    lighting=None,
    params_init=None,
    opt=None,
):
    """Optimize a voxel grid to reproduce ``targets`` from ``cams``.

    Args:
      targets: (N, H, W, 3) posed view images.
      cams: list of N cameras.
      grid_shape: (Z, Y, X, 4) of the grid to recover.
      cfg/render_cfg: training and renderer configs.
      mesh: optional 1-D 'data' Mesh for ray-sharded DP (C10).
      run_dir: metrics/checkpoint directory (defaults to cfg.ckpt_dir).
      grad_buckets: MeshConfig.grad_buckets — bucketed grid-grad psum
        count (mesh path only; the non-overlapped reduction).
      bwd_chunks: MeshConfig.bwd_chunks — slab-chunk the backward and
        all-reduce each chunk's gradient between backward kernels (the
        C10 overlap; replicated-grid mesh path only). 1 = one psum
        after the full backward.
      grad_ring: MeshConfig.grad_ring — replace the grad psums with
        the in-kernel RDMA ring backward (kernels/ring_bwd.py): the
        all-reduce's remote DMAs issue between the backward kernel's
        own grid steps, hiding the wire time behind slab recompute
        (the full C10 overlap). Replicated-grid mesh path only;
        bwd_chunks doubles as the ring's slab count.
      lighting: optional LightingConfig for LIT inverse rendering (the
        c5 training shape, BASELINE.json:11): each step bakes the sky
        light volume from the current density and multiplies it into
        emission before the sweep (detached by default; detach=False
        differentiates the shadows through the tau-sweep adjoints).
        Disables the fused layout-resident mode (the bake needs the
        canonical grid).
      params_init: optional (Z, Y, X, 4) raw-parameter warm start
        (default: init_params — note density_softplus=False zeros give
        DEAD gradients through the relu'd density; pass a small
        positive density to train without the softplus
        parameterization).
      opt: optional optax optimizer (default: optax.adam(cfg.lr)) —
        e.g. optax.adam(lr, mu_dtype=jnp.bfloat16) shaves a full-grid
        f32 moment at 512^3 (tools/c5_train.py's HBM budget).

    Returns:
      (grid (rendered-space), params, history dict)
    """
    targets = np.asarray(targets)  # host-side until per-group staging
    run_dir = run_dir or cfg.ckpt_dir
    metrics = MetricsLogger(run_dir)
    opt = opt if opt is not None else optax.adam(cfg.lr)
    params = (jnp.asarray(params_init) if params_init is not None
              else init_params(grid_shape, cfg.density_softplus))
    z_sharded = (
        mesh is not None
        and "z" in getattr(mesh, "axis_names", ())
        and mesh.shape["z"] > 1
    )
    if z_sharded:
        # Slab-shard the raw params over 'z' (dim 0 = Z); optimizer
        # moments inherit the sharding from opt.init, so the whole
        # training state lives sharded — C11's point: grids too big to
        # replicate can still be *fitted*.
        from jax.sharding import NamedSharding, PartitionSpec as P

        if grid_shape[0] % mesh.shape["z"]:
            raise ValueError(
                f"grid Z={grid_shape[0]} not divisible by z-mesh "
                f"{mesh.shape['z']}"
            )
        params = jax.device_put(params, NamedSharding(mesh, P("z")))
    opt_state = opt.init(params)
    start_step = 0

    ckpt = Checkpointer(f"{run_dir}/ckpt") if cfg.ckpt_every else None
    if resume and ckpt is not None and ckpt.latest_step() is not None:
        abstract = jax.tree.map(
            lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype),
            {"params": params, "opt_state": opt_state},
        )
        step_no, state = ckpt.restore(abstract)
        params, opt_state = state["params"], state["opt_state"]
        start_step = step_no + 1
        log.info("resumed from checkpoint at step %d", step_no)

    # Build geometry on the HOST, then ship each group's stacked tree in
    # ONE transfer: building it directly on the accelerator dispatches
    # hundreds of small array ops through the (high-latency, on this
    # box tunneled) transport — measured minutes of staging at c4.
    n_shards = mesh.shape["data"] if mesh is not None else 1
    with jax.default_device(jax.devices("cpu")[0]):
        groups = group_views(cams, grid_shape,
                             rays_per_view=cfg.rays_per_view,
                             n_shards=n_shards)
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        stage = NamedSharding(mesh, P())
    else:
        stage = jax.devices()[0]
    groups = {
        k: (v[0], jax.device_put(v[1], stage), v[2], v[3])
        for k, v in groups.items()
    }
    group_keys = sorted(groups.keys())
    # FUSED-SOFTPLUS layout-resident training: with softplus density
    # the materialized per-step softplus + sweep-layout transpose (and
    # their backward twins) are 4 full-grid HBM passes that the kernels
    # can absorb per streamed slice (sweep_op ``softplus``). The whole
    # training state (params + Adam moments) then lives IN the current
    # group's sweep layout; group switches re-lay it out once per
    # steps_per_call block (3 transposes amortized over K steps), so
    # the mode needs K > 1 unless there is only one group.
    import os as _os

    lit = lighting is not None and getattr(lighting, "mode", "none") != "none"
    fused = (
        cfg.density_softplus
        and not z_sharded
        and not lit  # the lighting bake needs the canonical grid
        and _os.environ.get("TPUVR_FUSED_SOFTPLUS", "1") != "0"
        and (max(int(cfg.steps_per_call), 1) > 1 or len(group_keys) == 1)
    )
    steps_fns, rows_by_key = {}, {}
    for key in group_keys:
        idxs, stacked, band, warp_tiling = groups[key]
        k_views = min(cfg.views_per_batch, len(idxs))
        n_v, n_u = stacked["dt"].shape[1], stacked["dt"].shape[2]
        rows = band_rows(cfg.rays_per_view, n_v, n_u, n_shards)
        rows_by_key[key] = (rows, n_v)
        maker = make_train_step_zsharded if z_sharded else make_train_step
        kw = {}
        if not z_sharded:
            v_pv = (rows if rows is not None else n_v) // n_shards
            kw["view_batch"] = view_batch_eligible(
                k_views, band, grid_shape, key[0], v_pv, n_u
            )
            kw["bwd_chunks"] = bwd_chunks
            kw["kernel_softplus"] = fused
            kw["grad_ring"] = grad_ring
            kw["lighting"] = lighting
        steps_fns[key] = maker(
            key, k_views, opt, render_cfg, cfg.density_softplus, impl,
            mesh, grad_buckets=grad_buckets, band=band, rows=rows,
            warp_tiling=warp_tiling, prestage=True, **kw,
        )

    # Layout movers for the fused mode: src/dst None = canonical
    # (Z, Y, X, 4); an axis = that group's (S, 4, Y, X) sweep layout.
    from tpuvr.ops.render import (
        grid_to_sweep_layout as _to_sc,
        sweep_layout_to_grid as _from_sc,
    )

    _rl_cache = {}

    def relayout_state(params, opt_state, src, dst, donate=True):
        if src == dst:
            return params, opt_state
        fkey = (src, dst, donate)
        if fkey not in _rl_cache:
            def f(tree):
                def cv(x):
                    if getattr(x, "ndim", 0) != 4:
                        return x  # Adam count etc.
                    g = _from_sc(x, src) if src is not None else x
                    return _to_sc(g, dst) if dst is not None else g
                return jax.tree.map(cv, tree)
            _rl_cache[fkey] = jax.jit(
                f, donate_argnums=(0,) if donate else ()
            )
        return _rl_cache[fkey]((params, opt_state))

    # The whole group's geometry/targets live on device once; each step
    # ships only (pick, r0s) and gathers the minibatch inside the jit
    # (host-side leaf indexing = ~8 tunnel dispatches/step — measured at
    # half the c4 step time). The loss fetch is pipelined one step
    # behind so the device never idles on the host sync.
    targets_by_key = {
        k: jax.device_put(
            np.asarray(targets)[np.asarray(groups[k][0])], stage
        )
        for k in group_keys
    }
    # steps_per_call > 1: chain K steps of ONE group inside a jitted
    # lax.scan per dispatch (groups rotate between blocks) — the host
    # round trip amortizes over the block. K = 1 keeps per-step
    # round-robin with the loss fetch pipelined one step behind.
    K = max(int(cfg.steps_per_call), 1)
    scan_fns = {}

    def scanned_step(key):
        if key not in scan_fns:
            inner = steps_fns[key]

            @functools.partial(jax.jit, donate_argnums=(0, 1))
            def multi(params, opt_state, geom_all, targets_all, picks,
                      r0s_all):
                def body(carry, xs):
                    p, o = carry
                    p, o, loss = inner(p, o, geom_all, targets_all,
                                       xs[0], xs[1])
                    return (p, o), loss

                (params, opt_state), losses = jax.lax.scan(
                    body, (params, opt_state), (picks, r0s_all)
                )
                return params, opt_state, losses

            scan_fns[key] = multi
        return scan_fns[key]

    rng = np.random.default_rng(cfg.seed + start_step)
    history = {"loss": []}
    pending = None  # (step_nos, key, device losses) awaiting readback

    def drain(rec):
        step_is, key_i, loss_dev = rec
        for step_i, loss_f in zip(step_is, np.atleast_1d(
                np.asarray(loss_dev, np.float64))):
            history["loss"].append(float(loss_f))
            metrics.write(step_i, loss=float(loss_f), group=str(key_i))

    def draw(key, size=None):
        idxs = groups[key][0]
        k_views = min(cfg.views_per_batch, len(idxs))
        shape = (k_views,) if size is None else (size, k_views)
        pick = np.stack([
            rng.choice(len(idxs), size=k_views, replace=False)
            for _ in range(size or 1)
        ])
        pick = pick.reshape(shape)
        rows, n_v = rows_by_key[key]
        if rows is None:
            r0s = np.zeros(shape, np.int32)
        else:
            r0s = rng.integers(
                0, (n_v - rows) // 8 + 1, size=shape
            ).astype(np.int32) * 8
        return (jnp.asarray(pick, jnp.int32), jnp.asarray(r0s))

    step_no = start_step
    # Resume-aligned block rotation: an uninterrupted run visits group
    # blk % len(groups) at block blk, so a resumed run must start from
    # the block its start_step falls in (blk=0 would revisit groups —
    # and consume the per-block rng draws — in a different order).
    blk = start_step // K
    cur_layout = None  # fused mode: axis whose sweep layout state is in

    def ensure_layout(key):
        nonlocal params, opt_state, cur_layout
        if fused and cur_layout != key[0]:
            params, opt_state = relayout_state(
                params, opt_state, cur_layout, key[0]
            )
            cur_layout = key[0]

    while step_no < cfg.steps:
        if K == 1:
            key = group_keys[step_no % len(group_keys)]
            ensure_layout(key)
            pick, r0s = draw(key)
            params, opt_state, loss = steps_fns[key](
                params, opt_state, groups[key][1], targets_by_key[key],
                pick, r0s
            )
            if pending is not None:
                drain(pending)
            pending = ([step_no], key, loss)
            n_done = 1
        else:
            key = group_keys[blk % len(group_keys)]
            ensure_layout(key)
            n_done = min(K, cfg.steps - step_no)
            picks, r0s_all = draw(key, size=n_done)
            params, opt_state, losses = scanned_step(key)(
                params, opt_state, groups[key][1], targets_by_key[key],
                picks, r0s_all
            )
            if pending is not None:
                drain(pending)
            pending = (list(range(step_no, step_no + n_done)), key,
                       losses)
            blk += 1
        next_step = step_no + n_done
        if ckpt is not None and cfg.ckpt_every and (
            (next_step % cfg.ckpt_every) < n_done
            or next_step >= cfg.steps
        ):
            # Checkpoints are always canonical (Z, Y, X, 4) so resume
            # is layout-agnostic; non-donating copies in fused mode.
            p_c, o_c = relayout_state(
                params, opt_state, cur_layout, None, donate=False
            ) if fused else (params, opt_state)
            ckpt.save(next_step - 1,
                      {"params": p_c, "opt_state": o_c},
                      cast_bf16=cfg.ckpt_bf16)
        step_no = next_step
    if pending is not None:
        drain(pending)
    if ckpt is not None:
        ckpt.wait()
        ckpt.close()
    if fused and cur_layout is not None:
        params, opt_state = relayout_state(
            params, opt_state, cur_layout, None
        )
    grid = params_to_grid(params, cfg.density_softplus)
    return grid, params, history


def render_all_views(grid, cams, render_cfg=RenderConfig(), impl=None,
                     lighting=None):
    """Render every camera; returns (N, H, W, 3)."""
    from tpuvr.ops.render import render_view

    return jnp.stack(
        [render_view(grid, cam, render_cfg, impl=impl,
                     lighting=lighting)[0] for cam in cams]
    )


def render_views_grouped(grid, cams, render_cfg=RenderConfig(),
                         impl=None, lighting=None):
    """Render every camera with ONE compiled program per view group.

    ``render_all_views`` traces a fresh program per camera (the camera
    is static); for a 64-view orbit on a remote-compile backend that is
    64 multi-minute compiles. Here the per-view geometry is DATA (the
    training-path representation): one jitted render per (axis,
    reverse, tiles) group takes the stacked geometry and a traced view
    pick — 2-4 compiles for a full orbit. Returns (N, H, W, 3).
    """
    from tpuvr.ops.geometry import warp_to_pixels_dynamic
    from tpuvr.ops.render import grid_to_sweep_layout, slice_enables
    from tpuvr.ops.vjp import resolve_impl, sweep_op
    from tpuvr.ops.warp import RowWarpPlan, row_warp_image, row_warp_op

    if lighting is not None and getattr(lighting, "mode", "none") != "none":
        from tpuvr.ops.lighting import apply_lighting
        from tpuvr.ops.vjp import resolve_impl as _ri

        grid = jax.jit(lambda g: apply_lighting(
            g, lighting, render_cfg.precision, impl=_ri(impl)))(grid)
    with jax.default_device(jax.devices("cpu")[0]):
        groups = group_views(cams, grid.shape)
    out = [None] * len(cams)
    for key, (idxs, stacked, band, tiling) in groups.items():
        axis, reverse = key[0], key[1]
        stacked = jax.device_put(stacked)
        op = sweep_op(
            reverse, render_cfg.sigma_scale, render_cfg.early_stop_eps,
            resolve_impl(impl), render_cfg.precision, band=band,
        )
        row_op = (row_warp_op(tiling.f_v, resolve_impl(impl))
                  if isinstance(tiling, RowWarpPlan) else None)

        @jax.jit
        def render_one(grid, pick, stacked=stacked, axis=axis,
                       reverse=reverse, op=op, row_op=row_op,
                       tiling=tiling):
            geom_i = jax.tree.map(lambda a: a[pick], stacked)
            grid_sc = grid_to_sweep_layout(grid, axis)
            enables = slice_enables(
                grid_sc, reverse, render_cfg.use_occupancy
            )
            if "valid" in geom_i:
                enables = enables * geom_i["valid"]
            c = geom_i["coeffs"]
            rgb_t, t_t = op(grid_sc, (c[0], c[1], c[2], c[3]), enables,
                            geom_i["dt"])
            if row_op is not None:
                inter = jnp.concatenate([rgb_t, t_t[None]], 0)
                img = row_op(inter, geom_i["rwy"], geom_i["rwx"],
                             geom_i["rwvb"])
                img = row_warp_image(img[:3], tiling)
                return jnp.transpose(img, (1, 2, 0))
            inter = jnp.transpose(
                jnp.concatenate([rgb_t, t_t[None]], 0), (1, 2, 0)
            )
            return warp_to_pixels_dynamic(
                inter, geom_i["lattice"], geom_i["uv"], tiling=tiling,
                vbase=geom_i.get("wvb"), ubase=geom_i.get("wub"),
            )[..., :3]

        for j, i in enumerate(idxs):
            out[i] = render_one(grid, jnp.asarray(j, jnp.int32))
    return jnp.stack(out)


def evaluate_psnr(grid, cams, targets, render_cfg=RenderConfig(),
                  impl=None, lighting=None):
    preds = render_views_grouped(grid, cams, render_cfg, impl, lighting)
    return float(psnr(preds, jnp.asarray(targets)))
