"""Sweep geometry: factor a camera into per-slice separable resamples.

This is the TPU-native replacement for the reference's per-pixel ray setup
(reconstructed camera/ray code, SURVEY.md §2.1), built on the shear-warp
factorization: in the permuted grid space (sweep axis last -> dim 0 of the
grid), every ray is parameterized by its intersection ``(u, v)`` with the
base plane (sweep coordinate 0). For both camera models the sample position
on plane ``p`` is then *affine in the lattice index* and identical for all
rays sharing a row/column:

  orthographic:  pos_x(j, p) = u_j + p * dx/dz            (translation)
  perspective:   pos_x(j, p) = u_j * s_p + ex * (1 - s_p) (scale+translate)
                 with s_p = 1 - p/ez   (eye at (ex, ey, ez))

so each march step is a separable slice resample — two banded interpolation
matrices applied with MXU matmuls in the Pallas kernel (tpuvr/kernels/sweep
.py) — instead of a per-ray trilinear gather (TPU has no texture units;
gathers are its weak spot, SURVEY.md §6).

The intermediate image is computed on a regular (u, v) lattice of base-plane
rays. When the pixel->base-plane map is itself a separable regular lattice
(axis-aligned cameras without roll) the intermediate image *is* the final
image. Otherwise a final 2D bilinear warp resamples intermediate rays to
pixel rays (:func:`warp_to_pixels`), outside the hot loop and fully
differentiable.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np

from tpuvr.ref.camera import OrthoCamera, PerspectiveCamera, _basis
from tpuvr.ref.march import GRID_PERM, PT_PERM


@dataclasses.dataclass(frozen=True)
class SweepPlan:
    """Static description of a sweep render (hashable; jit-static).

    Attributes:
      axis: sweep axis in (x=0, y=1, z=2).
      n_planes: number of planes (grid extent along axis).
      reverse: True if rays traverse planes in decreasing index order.
      lattice: (u0, du, v0, dv) base-plane lattice.
      n_u/n_v: intermediate image resolution.
      separable: True if the intermediate lattice equals the pixel grid
        (no final warp needed).
      ortho: True for orthographic cameras.
      cam_params: per-model parameters (ortho: (sx, sy) plane shear per unit
        plane index; perspective: permuted eye (ex, ey, ez)).
      valid: (first, last) inclusive PLANE-index range the camera can see.
        Differs from (0, n_planes-1) only for a perspective eye inside the
        sweep slab (fly-through): planes behind the eye are invalid — the
        sweep visits them with a mirrored affine map, so they are masked to
        exactly zero contribution via the enables vector
        (:func:`plan_valid_mask`).
    """

    axis: int
    n_planes: int
    reverse: bool
    lattice: Tuple[float, float, float, float]
    n_u: int
    n_v: int
    separable: bool
    ortho: bool
    cam_params: Tuple[float, ...]
    valid: Tuple[int, int] = (0, -1)


def _permuted_camera(cam, axis: int):
    """Camera basis and position with (x, y, z) permuted for the sweep."""
    pp = list(PT_PERM[axis])
    r, u, f = _basis(cam.forward, cam.up)
    r, u, f = r[pp], u[pp], f[pp]
    if isinstance(cam, OrthoCamera):
        pos = np.asarray(cam.center, dtype=np.float64)[pp]
    else:
        pos = np.asarray(cam.eye, dtype=np.float64)[pp]
    return r, u, f, pos


def plan_sweep(cam, grid_shape, axis: int, oversample: float = 1.0):
    """Build the :class:`SweepPlan` for a camera over a (Z, Y, X, C) grid.

    All computation is host-side float64 numpy: cameras are static.

    Returns:
      (plan, uv_pixel): ``uv_pixel`` is None when separable, else an
      (res_y, res_x, 2) float64 numpy array of each pixel ray's base-plane
      (u, v) for the final warp.
    """
    dims_p = [grid_shape[d] for d in GRID_PERM[axis][:3]]  # (S, Y, X)
    n_planes = dims_p[0]
    r, u, f, pos = _permuted_camera(cam, axis)
    if abs(f[2]) < 1e-6:
        raise ValueError("sweep axis must not be perpendicular to view dir")
    reverse = f[2] < 0

    # Pixel-corner NDC offsets (centers), v up.
    res_x, res_y = cam.res_x, cam.res_y
    jj = (np.arange(res_x) + 0.5) / res_x * 2.0 - 1.0
    ii = 1.0 - (np.arange(res_y) + 0.5) / res_y * 2.0
    uu, vv = np.meshgrid(jj, ii)

    valid = (0, n_planes - 1)
    if isinstance(cam, OrthoCamera):
        o = (
            pos[None, None, :]
            + uu[..., None] * (cam.width * 0.5) * r
            + vv[..., None] * (cam.height * 0.5) * u
        )
        d = np.broadcast_to(f, o.shape)
        ortho = True
        cam_params = (float(f[0] / f[2]), float(f[1] / f[2]))
    elif isinstance(cam, PerspectiveCamera):
        t = np.tan(cam.fov_y * 0.5)
        aspect = res_x / res_y
        d = f + uu[..., None] * (t * aspect) * r + vv[..., None] * t * u
        o = np.broadcast_to(pos, d.shape)
        ortho = False
        ez = float(pos[2])
        if abs(ez) < 1e-6:
            raise ValueError(
                "perspective eye on the sweep base plane (permuted z=0) "
                "degenerates the base-plane ray parameterization; nudge "
                "the camera"
            )
        if 0.0 <= ez <= n_planes - 1:
            # Fly-through: the eye sits inside the slab. The affine
            # per-plane map stays exact for planes in FRONT of the eye
            # (scale s_p = 1 - p/ez goes negative: the pencil re-diverges
            # past the eye); planes behind the eye are invisible and get
            # masked (see SweepPlan.valid).
            import math as _math

            if not reverse:  # rays march toward increasing plane index
                valid = (int(_math.floor(ez)) + 1, n_planes - 1)
            else:
                valid = (0, int(_math.ceil(ez)) - 1)
            if valid[0] > valid[1]:
                raise ValueError(
                    "camera looks out of the slab: no visible planes"
                )
        cam_params = (float(pos[0]), float(pos[1]), ez)
    else:
        raise TypeError(f"unknown camera type: {type(cam)}")

    # Base-plane intersection of every pixel ray: p + t*d with z = 0.
    tt = (0.0 - o[..., 2]) / d[..., 2]
    base_u = o[..., 0] + d[..., 0] * tt
    base_v = o[..., 1] + d[..., 1] * tt

    # Separable iff u varies only along image columns and v only along rows,
    # both with uniform spacing.
    du_col = np.diff(base_u, axis=1)
    dv_row = np.diff(base_v, axis=0)
    separable = (
        np.ptp(base_u, axis=0).max() < 1e-9 * max(1.0, np.abs(base_u).max())
        and np.ptp(base_v, axis=1).max()
        < 1e-9 * max(1.0, np.abs(base_v).max())
        and np.ptp(du_col) < 1e-9 * max(1.0, np.abs(du_col).max())
        and np.ptp(dv_row) < 1e-9 * max(1.0, np.abs(dv_row).max())
    )

    if separable:
        n_u, n_v = res_x, res_y
        u0, du = float(base_u[0, 0]), float(du_col[0, 0])
        v0, dv = float(base_v[0, 0]), float(dv_row[0, 0])
        uv_pixel = None
    else:
        n_u = int(round(res_x * oversample))
        n_v = int(round(res_y * oversample))
        # Lattice covers every pixel ray's base point (half-texel margin so
        # the warp never extrapolates).
        umin, umax = float(base_u.min()), float(base_u.max())
        vmin, vmax = float(base_v.min()), float(base_v.max())
        du = (umax - umin) / max(n_u - 1, 1)
        dv = (vmax - vmin) / max(n_v - 1, 1)
        u0, v0 = umin, vmin
        uv_pixel = np.stack([base_u, base_v], axis=-1)

    plan = SweepPlan(
        axis=axis,
        n_planes=n_planes,
        reverse=bool(reverse),
        lattice=(u0, du, v0, dv),
        n_u=n_u,
        n_v=n_v,
        separable=bool(separable),
        ortho=ortho,
        cam_params=cam_params,
        valid=valid,
    )
    return plan, uv_pixel


def plan_valid_mask(plan: SweepPlan, dtype=jnp.float32):
    """(S,) 0/1 mask of visible planes, in TRAVERSAL order.

    All-ones except for a fly-through camera (eye inside the slab), where
    planes behind the eye are masked; multiplied into the occupancy
    ``enables`` so masked slices contribute exactly zero (same lossless
    gating as empty-space skipping).
    """
    p = np.arange(plan.n_planes)
    mask = ((p >= plan.valid[0]) & (p <= plan.valid[1])).astype(np.float64)
    if plan.reverse:
        mask = mask[::-1]
    return jnp.asarray(mask, dtype=dtype)


def slice_coeffs(plan: SweepPlan, dtype=jnp.float32):
    """Per-traversal-step affine coefficients, as four (S,) arrays.

    For traversal step ``k`` visiting plane ``p(k)`` (ascending or reversed
    per ``plan.reverse``), the sample position of intermediate ray column
    ``j`` is ``pos_x = j * ax[k] + bx[k]`` and of row ``i`` is
    ``pos_y = i * ay[k] + by[k]``.
    """
    u0, du, v0, dv = plan.lattice
    s = plan.n_planes
    p = np.arange(s, dtype=np.float64)
    if plan.reverse:
        p = p[::-1]
    if plan.ortho:
        sx, sy = plan.cam_params
        ax = np.full(s, du)
        bx = u0 + p * sx
        ay = np.full(s, dv)
        by = v0 + p * sy
    else:
        ex, ey, ez = plan.cam_params
        sp = 1.0 - p / ez
        ax = du * sp
        bx = u0 * sp + ex * (1.0 - sp)
        ay = dv * sp
        by = v0 * sp + ey * (1.0 - sp)
    return tuple(
        jnp.asarray(a, dtype=dtype) for a in (ay, by, ax, bx)
    )


def band_bounds(plan: SweepPlan) -> Tuple[float, float, float, float]:
    """Static (max |ay|, max |ax|, min |ay|, min |ax|) over all slices.

    Feeds the banded Pallas kernels (tpuvr.kernels.sweep.band_ok): the
    per-slice interpolation matrices are 2-tap bands with these slopes,
    computable host-side because the plan is static (mirrors
    slice_coeffs). The maxima bound the forward-direction tap windows;
    the minima bound the transpose-direction (gradient) windows.
    """
    u0, du, v0, dv = plan.lattice
    if plan.ortho:
        return (abs(float(dv)), abs(float(du)),
                abs(float(dv)), abs(float(du)))
    ez = plan.cam_params[2]
    # Only visible planes constrain the bands: invalid (behind-the-eye)
    # planes are gated to exactly zero contribution, and the banded
    # kernels' window arithmetic is memory-safe for any slope (windows are
    # clamped; uncovered taps just drop), so their wilder slopes don't
    # disqualify the banded path for fly-through cameras.
    p_vis = np.arange(plan.valid[0], plan.valid[1] + 1, dtype=np.float64)
    sp = np.abs(1.0 - p_vis / ez)
    sp_max, sp_min = float(sp.max()), float(sp.min())
    return (abs(float(dv)) * sp_max, abs(float(du)) * sp_max,
            abs(float(dv)) * sp_min, abs(float(du)) * sp_min)


def ray_dt(plan: SweepPlan, dtype=jnp.float32):
    """Per-intermediate-ray step length (n_v, n_u), unit-speed rays.

    The march samples consecutive integer planes, so the per-ray segment
    length is the constant ``1/|d_z|`` of the unit direction — matching
    ``tpuvr.ref.march.render_plane_sweep``.
    """
    u0, du, v0, dv = plan.lattice
    uj = u0 + du * np.arange(plan.n_u, dtype=np.float64)
    vi = v0 + dv * np.arange(plan.n_v, dtype=np.float64)
    uu, vv = np.meshgrid(uj, vi)
    if plan.ortho:
        sx, sy = plan.cam_params
        # Unit direction z-component: 1/sqrt(1 + sx^2 + sy^2).
        dt = np.full_like(uu, np.sqrt(1.0 + sx * sx + sy * sy))
    else:
        ex, ey, ez = plan.cam_params
        dt = np.sqrt((uu - ex) ** 2 + (vv - ey) ** 2 + ez * ez) / abs(ez)
    return jnp.asarray(dt, dtype=dtype)


def intermediate_rays(plan: SweepPlan, dtype=jnp.float64):
    """Origins/dirs of the intermediate-lattice rays (oracle comparison).

    Rays are expressed in *permuted* space with origins pushed in front of
    the slab so every plane crossing has t > 0; pair with
    ``render_plane_sweep(grid_permuted, ..., axis=2)``.
    """
    u0, du, v0, dv = plan.lattice
    uj = u0 + du * np.arange(plan.n_u, dtype=np.float64)
    vi = v0 + dv * np.arange(plan.n_v, dtype=np.float64)
    uu, vv = np.meshgrid(uj, vi)
    base = np.stack([uu, vv, np.zeros_like(uu)], axis=-1)
    if plan.ortho:
        sx, sy = plan.cam_params
        sign = -1.0 if plan.reverse else 1.0
        d = np.asarray([sx, sy, 1.0]) * sign
        d = d / np.linalg.norm(d)
        d = np.broadcast_to(d, base.shape)
        o = base - d * (4.0 * plan.n_planes)
    else:
        ex, ey, ez = plan.cam_params
        eye = np.asarray([ex, ey, ez])
        d = base - eye
        d = d / np.linalg.norm(d, axis=-1, keepdims=True)
        # base - eye points TOWARD the base plane; the viewing direction's
        # z sign is set by plan.reverse. For a fly-through (or behind-slab)
        # eye the base plane sits behind the camera — flip so the marcher
        # sees the planes in front (t > 0), matching the masked sweep.
        want = -1.0 if plan.reverse else 1.0
        if float(d[0, 0, 2]) * want < 0:
            d = -d
        o = np.broadcast_to(eye, base.shape)
    return jnp.asarray(o, dtype=dtype), jnp.asarray(d, dtype=dtype)


def view_geometry(cam, grid_shape, dtype=jnp.float32, oversample=1.0):
    """Per-view sweep geometry as *arrays* (for batched training steps).

    Unlike :func:`plan_sweep` + :func:`slice_coeffs` (static per-camera),
    this packs everything dynamic into a dict of arrays so one compiled
    train step can iterate over many views of the same (axis, reverse)
    group (SURVEY.md §3.2: view minibatching):

    Returns:
      (axis, reverse, geom) with geom = {
        'coeffs': (4, S) [ay, by, ax, bx],
        'dt':     (V, U),
        'lattice':(4,)   [u0, du, v0, dv],
        'uv':     (H, W, 2) pixel base-plane coords (always present; the
                  final warp is an exact identity when the camera is
                  separable, so one code path serves both),
        'valid':  (S,) 0/1 plane-visibility mask in traversal order
                  (all-ones except fly-through cameras), to be multiplied
                  into the occupancy enables,
      }
    """
    from tpuvr.ref.camera import dominant_axis

    axis = dominant_axis(cam)
    plan, uv_pixel = plan_sweep(cam, grid_shape, axis, oversample=oversample)
    if uv_pixel is None:
        # Separable: pixel base coords ARE the lattice points.
        u0, du, v0, dv = plan.lattice
        uj = u0 + du * np.arange(plan.n_u)
        vi = v0 + dv * np.arange(plan.n_v)
        uu, vv = np.meshgrid(uj, vi)
        uv_pixel = np.stack([uu, vv], axis=-1)
    ay, by, ax, bx = slice_coeffs(plan, dtype)
    geom = {
        "coeffs": jnp.stack([ay, by, ax, bx]),
        "dt": ray_dt(plan, dtype),
        "lattice": jnp.asarray(plan.lattice, dtype=dtype),
        "uv": jnp.asarray(uv_pixel, dtype=dtype),
        "valid": plan_valid_mask(plan, dtype),
    }
    return axis, plan.reverse, geom, band_bounds(plan)


def warp_to_pixels_dynamic(intermediate, lattice, uv_pixel,
                           tiling=None, vbase=None, ubase=None):
    """Bilinear pixel warp with the lattice as a traced (4,) array.

    Same math as :func:`warp_to_pixels` but every per-view quantity is
    data, so a single compiled program serves a whole view group.

    With ``tiling`` (a static :class:`tpuvr.ops.warp.WarpTiling` chosen
    per view group by :func:`tpuvr.ops.warp.plan_group_warp_tiling`) plus
    per-view traced ``vbase``/``ubase`` origin arrays, the warp runs on
    the tiled tent-matmul path instead of the XLA gather — the same ~20x
    the static-camera path gets (and its VJP replaces the 4-tap scatter
    in the training backward).
    """
    n_v, n_u = intermediate.shape[0], intermediate.shape[1]
    if tiling is not None:
        from tpuvr.ops.warp import lattice_positions, warp_tiled

        y_pos, x_pos = lattice_positions(
            (lattice[0], lattice[1], lattice[2], lattice[3]),
            uv_pixel, n_v, n_u,
        )
        return warp_tiled(intermediate, y_pos, x_pos, tiling,
                          vbase=vbase, ubase=ubase)
    u0, du, v0, dv = lattice[0], lattice[1], lattice[2], lattice[3]
    x = (uv_pixel[..., 0] - u0) / du
    y = (uv_pixel[..., 1] - v0) / dv
    x0 = jnp.clip(jnp.floor(x), 0, n_u - 2).astype(jnp.int32)
    y0 = jnp.clip(jnp.floor(y), 0, n_v - 2).astype(jnp.int32)
    fx = jnp.clip(x - x0, 0.0, 1.0)
    fy = jnp.clip(y - y0, 0.0, 1.0)
    g = intermediate
    return (
        g[y0, x0] * ((1 - fy) * (1 - fx))[..., None]
        + g[y0, x0 + 1] * ((1 - fy) * fx)[..., None]
        + g[y0 + 1, x0] * (fy * (1 - fx))[..., None]
        + g[y0 + 1, x0 + 1] * (fy * fx)[..., None]
    )


def warp_to_pixels_band(inter_band, lattice, uv_pixel, r0):
    """Pixel warp from a row *band* of the intermediate image.

    Implements ``TrainConfig.rays_per_view`` ray subsampling: the sweep
    renders only intermediate rows ``[r0, r0 + rows)`` (the row-affine
    trick — a band is the full sweep with ``by += r0 * ay``), and the loss
    is restricted to pixels whose bilinear support lies inside the band.

    Args:
      inter_band: (rows, n_u, C) band of the intermediate image.
      lattice: (4,) [u0, du, v0, dv] as a traced array.
      uv_pixel: (H, W, 2) pixel base-plane coords.
      r0: scalar int32 global row index of the band's first row.

    Returns:
      (img (H, W, C), mask (H, W) bool) — ``img`` is valid where ``mask``.
    """
    rows, n_u = inter_band.shape[0], inter_band.shape[1]
    u0, du, v0, dv = lattice[0], lattice[1], lattice[2], lattice[3]
    x = (uv_pixel[..., 0] - u0) / du
    y = (uv_pixel[..., 1] - v0) / dv
    yb = y - r0.astype(y.dtype)
    mask = (yb >= 0.0) & (yb <= rows - 1)
    x0 = jnp.clip(jnp.floor(x), 0, n_u - 2).astype(jnp.int32)
    y0 = jnp.clip(jnp.floor(yb), 0, rows - 2).astype(jnp.int32)
    fx = jnp.clip(x - x0, 0.0, 1.0)
    fy = jnp.clip(yb - y0, 0.0, 1.0)
    g = inter_band
    img = (
        g[y0, x0] * ((1 - fy) * (1 - fx))[..., None]
        + g[y0, x0 + 1] * ((1 - fy) * fx)[..., None]
        + g[y0 + 1, x0] * (fy * (1 - fx))[..., None]
        + g[y0 + 1, x0 + 1] * (fy * fx)[..., None]
    )
    return img, mask


def warp_to_pixels_owned(inter_halo, lattice, uv_pixel, r0, rows_own: int,
                         n_v: int):
    """Pixel warp restricted to the intermediate rows this device OWNS.

    The sharded-loss z trainer folds segments with the retile
    (:func:`tpuvr.dist.retile.fold_segments_retiled`), leaving every
    device a contiguous ``rows_own``-row block of the intermediate image
    plus ONE halo row (the next block's first row, fetched with a single
    ppermute). Ownership is by the CLIPPED bilinear base row: pixels
    with ``y0 = clip(floor(y), 0, n_v - 2)`` in ``[r0, r0 + rows_own)``
    — a disjoint, exact cover of all pixels across blocks, with taps
    identical to :func:`warp_to_pixels_dynamic` (the last block's
    pixels never tap its unused halo row because of the n_v - 2 clip).

    Args:
      inter_halo: (rows_own + 1, n_u, C) own rows + halo row.
      lattice: (4,) [u0, du, v0, dv] traced array.
      uv_pixel: (H, W, 2) pixel base-plane coords.
      r0: scalar int32 global index of the block's first row.
      rows_own/n_v: static block height / global intermediate rows.

    Returns:
      (img (H, W, C), mask (H, W) bool): ``img`` valid where ``mask``;
      masks are disjoint and complete across the row blocks.
    """
    n_u = inter_halo.shape[1]
    u0, du, v0, dv = lattice[0], lattice[1], lattice[2], lattice[3]
    x = (uv_pixel[..., 0] - u0) / du
    y = (uv_pixel[..., 1] - v0) / dv
    x0 = jnp.clip(jnp.floor(x), 0, n_u - 2).astype(jnp.int32)
    y0 = jnp.clip(jnp.floor(y), 0, n_v - 2).astype(jnp.int32)
    mask = (y0 >= r0) & (y0 < r0 + rows_own)
    yl = jnp.clip(y0 - r0, 0, rows_own - 1)
    fx = jnp.clip(x - x0, 0.0, 1.0)
    fy = jnp.clip(y - y0, 0.0, 1.0)
    g = inter_halo
    img = (
        g[yl, x0] * ((1 - fy) * (1 - fx))[..., None]
        + g[yl, x0 + 1] * ((1 - fy) * fx)[..., None]
        + g[yl + 1, x0] * (fy * (1 - fx))[..., None]
        + g[yl + 1, x0 + 1] * (fy * fx)[..., None]
    )
    return img, mask


def warp_to_pixels(intermediate, plan: SweepPlan, uv_pixel):
    """Bilinearly resample the intermediate image at pixel base points.

    Args:
      intermediate: (n_v, n_u, C) intermediate-ray image.
      plan: the sweep plan.
      uv_pixel: (res_y, res_x, 2) pixel base-plane coords from
        :func:`plan_sweep` (None => identity).

    Returns:
      (res_y, res_x, C) pixel image. Linear in ``intermediate`` => exact
      VJP via autodiff.
    """
    if uv_pixel is None:
        return intermediate
    from tpuvr.ops.warp import (
        lattice_positions,
        plan_warp_tiling,
        warp_enabled,
        warp_tiled,
    )

    if warp_enabled() and isinstance(uv_pixel, np.ndarray):
        # TPU-native path: per-tile footprint slices + tent-matrix
        # contractions — tap-exact vs the gather below, ~12x faster on
        # TPU (BASELINE.md 2026-08-19 breakdown). Positions are host
        # numpy (cameras are static), so the tiling is a constant.
        # Positions computed in the intermediate dtype so the tap
        # weights round identically to the gather formulation below.
        y_pos, x_pos = lattice_positions(
            plan.lattice,
            uv_pixel.astype(np.dtype(intermediate.dtype)),
            plan.n_v, plan.n_u,
        )
        tiling = plan_warp_tiling(y_pos, x_pos, plan.n_v, plan.n_u)
        if tiling is not None:
            return warp_tiled(intermediate, y_pos, x_pos, tiling)
    u0, du, v0, dv = plan.lattice
    uvp = jnp.asarray(uv_pixel, dtype=intermediate.dtype)
    x = (uvp[..., 0] - u0) / du
    y = (uvp[..., 1] - v0) / dv
    x0 = jnp.clip(jnp.floor(x), 0, plan.n_u - 2).astype(jnp.int32)
    y0 = jnp.clip(jnp.floor(y), 0, plan.n_v - 2).astype(jnp.int32)
    fx = jnp.clip(x - x0, 0.0, 1.0)
    fy = jnp.clip(y - y0, 0.0, 1.0)
    g = intermediate
    out = (
        g[y0, x0] * ((1 - fy) * (1 - fx))[..., None]
        + g[y0, x0 + 1] * ((1 - fy) * fx)[..., None]
        + g[y0 + 1, x0] * (fy * (1 - fx))[..., None]
        + g[y0 + 1, x0 + 1] * (fy * fx)[..., None]
    )
    return out
