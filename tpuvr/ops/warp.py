"""TPU-native final pixel warp: tiled tent-matrix bilinear resample.

The plane-sweep renderer's last step resamples the intermediate ray image
(a regular lattice on the base plane) at every pixel's base-plane point —
the classic shear-warp "2D warp". A per-pixel 4-tap gather is the natural
formulation on OpenCL-class hardware (the reference's framebuffer stage)
but a disaster on TPU: XLA lowers it to scalar gathers, measured at
12.0 ms of a 13.1 ms perspective frame at 256^3 @ 512^2 (BASELINE.md,
2026-08-19) — 11x the sweep kernel itself.

This module computes the *same taps with the same weights* in an
MXU/VPU-friendly tiling:

- the output image is cut into (ty, tx) tiles; for each tile, the 4-tap
  footprint in the intermediate image is a small (Fv, Fu) window whose
  integer origin is precomputed (host-side for static cameras — the
  positions are trace-time numpy);
- the window is fetched with one dynamic_slice per tile (a block gather,
  not a scalar gather);
- the longer footprint axis is contracted on the MXU against a tent
  (2-nonzero) interpolation matrix built on the fly from an iota — a
  banded one-hot matmul; the shorter axis is a 2-tap weighted reduce.

Tap-exactness: the tent row for a clipped position ``p`` is
``relu(1 - |k - p|)`` — nonzero exactly at ``floor(p)`` and
``floor(p) + 1`` with the bilinear weights ``1 - f`` / ``f``; every other
term of the contraction is an exact float zero, and ``x + 0.0 == x`` in
IEEE arithmetic, so the sums are exact. The only deviation from the
gather formulation is multiply associativity — ``(w_u * g) * w_v`` vs
``g * (w_v * w_u)`` — i.e. 1 ulp (tests assert <= 2e-7 in f32).
"""

from __future__ import annotations

import functools
import os
from typing import NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

_TILE_CANDIDATES: Tuple[Tuple[int, int], ...] = (
    (8, 128), (128, 8), (16, 64), (64, 16), (32, 32), (8, 8),
)


class WarpTiling(NamedTuple):
    """Static tiling of a pixel warp (all fields trace-time constants)."""

    ty: int
    tx: int
    f_v: int                 # footprint rows (v) per tile
    f_u: int                 # footprint cols (u) per tile
    vbase: np.ndarray        # (n_tiles,) int32 footprint origins
    ubase: np.ndarray        # (n_tiles,) int32
    res_y: int
    res_x: int


def lattice_positions(lattice, uv_pixel, n_v: int, n_u: int):
    """Pixel base-plane points -> clipped lattice-unit positions (Y, X)."""
    u0, du, v0, dv = lattice
    x = (uv_pixel[..., 0] - u0) / du
    y = (uv_pixel[..., 1] - v0) / dv
    if isinstance(uv_pixel, np.ndarray):
        clip = np.clip
    else:
        clip = jnp.clip
    return clip(y, 0, n_v - 1), clip(x, 0, n_u - 1)


def _tiles(arr: np.ndarray, ty: int, tx: int) -> np.ndarray:
    """(res_y, res_x) -> (n_tiles, ty*tx), row-major tile order."""
    gy, gx = arr.shape[0] // ty, arr.shape[1] // tx
    return (
        arr.reshape(gy, ty, gx, tx)
        .transpose(0, 2, 1, 3)
        .reshape(gy * gx, ty * tx)
    )


def _span(pos_t: np.ndarray, extent: int) -> Tuple[np.ndarray, int]:
    """Per-tile footprint origin + static size covering both taps."""
    lo = np.floor(pos_t.min(axis=1)).astype(np.int64)
    hi = np.minimum(
        np.floor(pos_t.max(axis=1)).astype(np.int64) + 1, extent - 1
    )
    size = int((hi - lo).max()) + 1
    size = min(-(-size // 8) * 8, extent)  # 8-align, never past extent
    base = np.clip(lo, 0, extent - size).astype(np.int32)
    return base, size


def plan_warp_tiling(
    y_pos: np.ndarray,
    x_pos: np.ndarray,
    n_v: int,
    n_u: int,
    candidates: Sequence[Tuple[int, int]] = _TILE_CANDIDATES,
) -> Optional[WarpTiling]:
    """Pick the output tiling minimizing footprint area (host-side).

    ``y_pos``/``x_pos`` are the CLIPPED lattice positions (concrete numpy
    — cameras are static). Returns None when no candidate tile divides the
    resolution (callers fall back to the gather warp).
    """
    res_y, res_x = y_pos.shape
    override = os.environ.get("TPUVR_WARP_TILE")
    if override:
        candidates = (tuple(int(s) for s in override.split("x")),)
    best = None
    for ty, tx in candidates:
        if res_y % ty or res_x % tx:
            continue
        vbase, f_v = _span(_tiles(y_pos, ty, tx), n_v)
        ubase, f_u = _span(_tiles(x_pos, ty, tx), n_u)
        # Cost: total contraction work is res^2 * Fv * Fu regardless of
        # tile shape, but the hardware pads the lane (last) dim to 128
        # and the sublane dim to 8, and tiles smaller than a (8, 128)
        # vreg waste the whole pipe. On-chip A/B at 256^3 @ 512^2 persp
        # (2026-08-19): 64x16 0.57 ms, 16x64 0.61, 32x32 0.70, 8x128
        # 0.76, 128x8 0.92, 8x8 6.6 — this model ranks the winner first.
        cost = (max(f_v, 8) * max(f_u, 128)
                * max(1, (8 * 128) // (ty * tx)))
        if best is None or cost < best[0]:
            best = (cost, WarpTiling(ty, tx, f_v, f_u, vbase, ubase,
                                     res_y, res_x))
    return None if best is None else best[1]


def plan_group_warp_tiling(
    pos_views,
    n_v: int,
    n_u: int,
    candidates: Sequence[Tuple[int, int]] = _TILE_CANDIDATES,
) -> Optional[Tuple[WarpTiling, np.ndarray, np.ndarray]]:
    """One tiling serving a whole view group (batched training steps).

    ``pos_views`` is a list of (y_pos, x_pos) concrete position maps, one
    per view. The tile shape and footprint sizes are chosen jointly (max
    span over views) so a single compiled train step handles every view;
    the per-view footprint origins are returned stacked as
    (n_views, n_tiles) int32 arrays — *data*, indexed by the traced view
    pick at step time.
    """
    res_y, res_x = pos_views[0][0].shape
    override = os.environ.get("TPUVR_WARP_TILE")
    if override:
        candidates = (tuple(int(s) for s in override.split("x")),)
    best = None
    for ty, tx in candidates:
        if res_y % ty or res_x % tx:
            continue
        vbs, ubs, f_v, f_u = [], [], 0, 0
        for y_pos, x_pos in pos_views:
            vb, fv = _span(_tiles(y_pos, ty, tx), n_v)
            ub, fu = _span(_tiles(x_pos, ty, tx), n_u)
            vbs.append(vb)
            ubs.append(ub)
            f_v, f_u = max(f_v, fv), max(f_u, fu)
        # Re-clip origins for the group-wide footprint sizes.
        vbs = [np.clip(v, 0, n_v - f_v) for v in vbs]
        ubs = [np.clip(u, 0, n_u - f_u) for u in ubs]
        cost = (max(f_v, 8) * max(f_u, 128)
                * max(1, (8 * 128) // (ty * tx)))
        if best is None or cost < best[0]:
            tiling = WarpTiling(ty, tx, f_v, f_u, vbs[0], ubs[0],
                                res_y, res_x)
            best = (cost, tiling, np.stack(vbs), np.stack(ubs))
    return None if best is None else best[1:]


def warp_tiled(intermediate, y_pos, x_pos, tiling: WarpTiling,
               vbase=None, ubase=None,
               chunk_bytes: int = 64 << 20):
    """Bilinear warp via per-tile footprint slices + tent contractions.

    Args:
      intermediate: (n_v, n_u, C).
      y_pos/x_pos: (res_y, res_x) clipped lattice positions (numpy or
        traced; must lie inside the tiling's footprints).
      tiling: from :func:`plan_warp_tiling` (static).
      vbase/ubase: optional (n_tiles,) int32 footprint origins overriding
        the tiling's — may be traced (the batched-training path indexes
        per-view origins with a traced view pick).
      chunk_bytes: bound on the materialized per-chunk footprint+partial
        buffers; tiles are processed in lax.map chunks of this size.

    Returns:
      (res_y, res_x, C), same dtype as ``intermediate``.
    """
    n_v, n_u, n_c = intermediate.shape
    ty, tx, f_v, f_u = tiling.ty, tiling.tx, tiling.f_v, tiling.f_u
    res_y, res_x = tiling.res_y, tiling.res_x
    gy, gx = res_y // ty, res_x // tx
    n_tiles, pix = gy * gx, ty * tx
    dtype = intermediate.dtype

    y_t = jnp.asarray(_tiles(np.asarray(y_pos), ty, tx)
                      if isinstance(y_pos, np.ndarray) else
                      _tiles_jnp(y_pos, ty, tx), dtype)
    x_t = jnp.asarray(_tiles(np.asarray(x_pos), ty, tx)
                      if isinstance(x_pos, np.ndarray) else
                      _tiles_jnp(x_pos, ty, tx), dtype)
    vb = jnp.asarray(tiling.vbase if vbase is None else vbase, jnp.int32)
    ub = jnp.asarray(tiling.ubase if ubase is None else ubase, jnp.int32)

    hp = jax.lax.Precision.HIGHEST

    def tile_one(args):
        vb_i, ub_i, y_i, x_i = args  # scalar, scalar, (P,), (P,)
        foot = jax.lax.dynamic_slice(
            intermediate, (vb_i, ub_i, jnp.zeros((), jnp.int32)),
            (f_v, f_u, n_c),
        )
        yr = y_i - vb_i.astype(dtype)
        xr = x_i - ub_i.astype(dtype)
        iota_v = jnp.arange(f_v, dtype=dtype)
        iota_u = jnp.arange(f_u, dtype=dtype)
        tent_v = jnp.maximum(0.0, 1.0 - jnp.abs(
            iota_v[None, :] - yr[:, None])).astype(dtype)   # (P, Fv)
        tent_u = jnp.maximum(0.0, 1.0 - jnp.abs(
            iota_u[None, :] - xr[:, None])).astype(dtype)   # (P, Fu)
        if f_u >= f_v:
            # Contract the long u axis on the MXU, 2-tap reduce over v.
            part = jnp.einsum("pu,vuc->pvc", tent_u, foot, precision=hp)
            return jnp.einsum("pv,pvc->pc", tent_v, part, precision=hp)
        part = jnp.einsum("pv,vuc->puc", tent_v, foot, precision=hp)
        return jnp.einsum("pu,puc->pc", tent_u, part, precision=hp)

    per_tile = (f_v * f_u + pix * min(f_v, f_u)) * n_c * 4
    batch = max(1, min(n_tiles, chunk_bytes // max(per_tile, 1)))
    if batch >= n_tiles:
        out = jax.vmap(lambda *a: tile_one(a))(vb, ub, y_t, x_t)
    else:
        out = jax.lax.map(tile_one, (vb, ub, y_t, x_t),
                          batch_size=batch)
    return (
        out.reshape(gy, gx, ty, tx, n_c)
        .transpose(0, 2, 1, 3, 4)
        .reshape(res_y, res_x, n_c)
    )


def _tiles_jnp(arr, ty: int, tx: int):
    gy, gx = arr.shape[0] // ty, arr.shape[1] // tx
    return (
        arr.reshape(gy, ty, gx, tx)
        .transpose(0, 2, 1, 3)
        .reshape(gy * gx, ty * tx)
    )


def warp_enabled() -> bool:
    """Escape hatch: TPUVR_WARP=gather restores the XLA-gather warp."""
    return os.environ.get("TPUVR_WARP", "tiled") != "gather"


# ---------------------------------------------------------------------------
# Row-block warp (Pallas): the training-path warp.
# ---------------------------------------------------------------------------


class RowWarpPlan(NamedTuple):
    """Static plan for the Pallas tile warp (see tpuvr.kernels.warp):
    output pixels are cut into (ty, tx) tiles; each tile reads an
    ``(f_v, U)`` sublane window of the lattice at a per-(view, tile)
    8-aligned origin — only the v side is windowed (the u side is a
    full-width tent contraction: its FLOPs are negligible, and lane
    windows would need Mosaic-hostile dynamic lane slicing)."""

    ty: int
    tx: int
    f_v: int
    res_y: int
    res_x: int


_ROW_WARP_CANDIDATES: Tuple[Tuple[int, int], ...] = (
    # row blocks (best when lattice rows track pixel rows) ...
    (8, 0), (16, 0), (32, 0), (64, 0),
    # ... and 2-D tiles for diagonal mappings (v varies along both
    # pixel axes — e.g. the steep 45-degree-azimuth orbit groups).
    (8, 128), (16, 64), (64, 16), (32, 32), (128, 8),
)


def plan_row_warp(pos_views, n_v: int, n_u: int,
                  candidates: Sequence[Tuple[int, int]] = _ROW_WARP_CANDIDATES):
    """Plan the Pallas tile warp for a view group.

    ``pos_views``: list of (y_pos, x_pos) concrete (res_y, res_x)
    position maps. Picks the pixel tile minimizing the v footprint F
    (total MXU work is res^2 * U * F; ties prefer fewer tiles).
    Returns ``(plan, vb (views, n_tiles) int32,
    y_flat (views, n_tiles, P), x_flat (views, n_tiles, P))`` or None
    when no candidate gives a sub-extent footprint (callers fall back
    to the tiled XLA warp).
    """
    res_y, res_x = pos_views[0][0].shape
    if n_v % 8:
        return None
    override = os.environ.get("TPUVR_WARP_ROWS")
    if override:
        ty, tx = (int(s) for s in override.split("x"))
        candidates = ((ty, tx),)
    best = None
    for ty, tx in candidates:
        tx = tx or res_x
        if res_y % ty or res_x % tx:
            continue
        n_tiles = (res_y // ty) * (res_x // tx)
        span = 0
        for y_pos, _ in pos_views:
            yb = _tiles(y_pos, ty, tx)
            lo = np.floor(yb.min(axis=1))
            hi = np.floor(yb.max(axis=1)) + 1
            span = max(span, int((hi - lo).max()) + 1)
        f_v = min(-(-(span + 7) // 8) * 8, n_v)
        key = (f_v, n_tiles)
        if best is None or key < best[0]:
            best = (key, RowWarpPlan(ty, tx, f_v, res_y, res_x))
    if best is None or best[1].f_v >= n_v:
        return None
    plan = best[1]
    vbs, ys, xs = [], [], []
    for y_pos, x_pos in pos_views:
        yb = _tiles(y_pos, plan.ty, plan.tx)
        lo = np.floor(yb.min(axis=1)).astype(np.int64)
        vb = np.clip((lo // 8) * 8, 0, n_v - plan.f_v).astype(np.int32)
        vbs.append(vb)
        ys.append(yb.astype(np.float32))
        xs.append(_tiles(x_pos, plan.ty, plan.tx).astype(np.float32))
    return plan, np.stack(vbs), np.stack(ys), np.stack(xs)


def row_warp_image(out, plan: RowWarpPlan):
    """(C, n_tiles, P) kernel output -> (C, res_y, res_x) image."""
    n_c = out.shape[0]
    gy, gx = plan.res_y // plan.ty, plan.res_x // plan.tx
    return (
        out.reshape(n_c, gy, gx, plan.ty, plan.tx)
        .transpose(0, 1, 3, 2, 4)
        .reshape(n_c, plan.res_y, plan.res_x)
    )


@functools.partial(jax.jit, static_argnames=("f_v",))
def _warp_rows_xla(inter_cvu, y_t, x_t, vbase, *, f_v: int):
    """jnp twin of the Pallas row-block warp (CPU test surface)."""
    n_c, n_v, n_u = inter_cvu.shape
    hp = jax.lax.Precision.HIGHEST

    def block(vb, ys, xs):
        foot = jax.lax.dynamic_slice(
            inter_cvu, (jnp.zeros((), jnp.int32), vb,
                        jnp.zeros((), jnp.int32)),
            (n_c, f_v, n_u),
        )
        dtype = inter_cvu.dtype
        tent_u = jnp.maximum(0.0, 1.0 - jnp.abs(
            jnp.arange(n_u, dtype=dtype)[None, :] - xs[:, None]))
        yr = ys - vb.astype(dtype)
        tent_v = jnp.maximum(0.0, 1.0 - jnp.abs(
            jnp.arange(f_v, dtype=dtype)[None, :] - yr[:, None]))
        part = jnp.einsum("pu,cfu->cpf", tent_u, foot, precision=hp)
        return jnp.einsum("pf,cpf->cp", tent_v, part, precision=hp)

    out = jax.vmap(block, in_axes=(0, 0, 0), out_axes=1)(
        vbase, y_t, x_t
    )
    return out  # (C, n_blocks, P)


@functools.lru_cache(maxsize=None)
def row_warp_op(f_v: int, impl: str, interpret: bool | None = None):
    """Differentiable row-block warp: (inter (C,V,U), y_t, x_t, vb) ->
    (C, n_blocks, P). Positions/origins are geometry (zero cotangents);
    the backward is the exact transpose kernel."""
    from tpuvr.kernels.warp import warp_rows_bwd, warp_rows_fwd

    def fwd_fn(inter, y_t, x_t, vb):
        if impl == "pallas":
            return warp_rows_fwd(inter, y_t, x_t, vb, f_v=f_v,
                                 interpret=interpret)
        return _warp_rows_xla(inter, y_t, x_t, vb, f_v=f_v)

    @jax.custom_vjp
    def op(inter, y_t, x_t, vb):
        return fwd_fn(inter, y_t, x_t, vb)

    def op_fwd(inter, y_t, x_t, vb):
        return fwd_fn(inter, y_t, x_t, vb), (
            inter.shape, y_t, x_t, vb
        )

    def op_bwd(res, d_out):
        shape, y_t, x_t, vb = res
        n_c, n_v, n_u = shape
        if impl == "pallas":
            d_inter = warp_rows_bwd(d_out, y_t, x_t, vb, n_v, n_u,
                                    f_v=f_v, interpret=interpret)
        else:
            # Transpose of the jnp twin via autodiff (CPU path). The
            # zero primal must carry the cotangent's device-varying
            # mesh axes under checked shard_map (a fresh jnp.zeros is
            # invariant and fails the vjp type check).
            zero = jnp.zeros(shape, d_out.dtype) + 0.0 * jnp.max(d_out)
            _, pull = jax.vjp(
                lambda g: _warp_rows_xla(g, y_t, x_t, vb, f_v=f_v), zero
            )
            (d_inter,) = pull(d_out)
        zero_like = lambda x: jnp.zeros_like(x)
        return (d_inter, zero_like(y_t), zero_like(x_t), zero_like(vb))

    op.defvjp(op_fwd, op_bwd)
    return op
