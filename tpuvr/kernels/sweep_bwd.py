"""Pallas backward sweep: analytic grid gradients by re-marching (C8).

The reference-class renderer would need an adjoint OpenCL kernel with
atomic scatter-adds into the gradient grid (SURVEY.md §3.3); here the
plane-sweep factorization makes the backward pass another slice sweep:

- re-run the forward march front-to-back with O(1) state (no stored
  per-step activations), reconstructing each step's transmittance T_k;
- maintain the color prefix sum; the *suffix* needed for the density
  gradient is ``C_final - prefix`` (the suffix-accumulator trick,
  SURVEY.md §3.3 — formulas verified against jax.grad in f64);
- per-slice gradients are dense matrices ``Aᵀ dS Bᵀ`` (two more MXU
  matmuls), written exactly once per slice — no scatter, no atomics.

Gradient formulas (s = sigma_scale, per intermediate ray, per step k):
  att_k       = exp(-s * relu(sig_k) * dt)
  d c_k       = dC * T_k (1 - att_k)
  d sig_k     = [sig_k > 0] * s * dt *
                ( sum_c dC_c (T_k att_k c_k - Suf_{k+1,c}) - dT * T_final )
  Suf_{k+1}   = C_final - sum_{i<=k} T_i (1-att_i) c_i

VMEM budget: the suffix term is kept as ONE channel-contracted running
plane ``q_k = sum_c dC_c * prefix_{k,c}`` instead of a 3-channel prefix,
and the constant ``sum_c dC_c C_final,c + dT T_final`` is folded into a
single precomputed ``dbias`` plane, so

  d sig_k = [sig_k>0] * s * dt * (sum_c dC_c T_k att_k c_k + q_k - dbias)

with 7 resident ray-planes total (dt, dbias, dC x3, q, T) — the full
256^3 @ 512^2 judged config fits the 16 MB scoped VMEM limit.

Early-terminated and occupancy-skipped slices receive exactly zero
gradient, mirroring the forward control flow bit-for-bit.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpuvr.kernels._compat import out_struct, use_interpret
from tpuvr.kernels.sweep import (
    _TILE,
    _att_exp,
    _band_window,
    _interp_matrices,
    _sigmoid,
    _softplus,
    band_tiles,
    sweep_dot,
)


def _sweep_bwd_kernel(
    ay_ref, by_ref, ax_ref, bx_ref, enable_ref,   # SMEM per-slice scalars
    slice_ref,   # (B, 4, Y, X) block of grid slices (recompute)
    dt_ref,      # (V, U)
    dbias_ref,   # (V, U) precomputed sum_c dC_c*C_fin_c + dT*T_fin
    d_c_ref,     # (3, V, U) cotangent on color
    trans0_ref,  # (V, U) carry in: transmittance entering this chunk
    q0_ref,      # (V, U) carry in: color-prefix contraction entering
    grad_ref,    # out: (B, 4, Y, X) per-slice grid gradients
    trans_ref,   # out (V, U): recomputed running transmittance (carry)
    q_ref,       # out (V, U): channel-contracted color prefix (carry)
    tmax_ref,    # scratch SMEM (1,): ERT state
    *,
    sigma_scale: float,
    early_stop_eps: float,
    precision: str,
    block: int,
    reverse: bool,
    softplus: bool = False,
):
    step = pl.program_id(0)
    n_v, n_u = trans_ref.shape
    n_y, n_x = slice_ref.shape[2], slice_ref.shape[3]
    dtype = trans_ref.dtype

    @pl.when(step == 0)
    def _init():
        # Slab chunking (tpuvr.ops.vjp.sweep_op chunked backward): the
        # recompute state enters from the previous chunk's carry outputs
        # (identity carry = (ones, zeros) for an unchunked call).
        trans_ref[...] = trans0_ref[...]
        q_ref[...] = q0_ref[...]
        tmax_ref[0] = jnp.max(trans0_ref[...])

    live = tmax_ref[0] >= early_stop_eps if early_stop_eps > 0.0 else True

    @pl.when(live)
    def _block():
        # As in the forward kernel: several slices per grid step with
        # arithmetic occupancy gating (sigma *= enable => att = 1, w = 0,
        # zero grads — bit-identical to skipping) lets Mosaic pipeline
        # the 16 matmuls/slice across the block.
        def slice_body(b):
            k = step * block + b
            i = block - 1 - b if reverse else b
            mat_a, mat_b = _interp_matrices(
                ay_ref[k], by_ref[k], ax_ref[k], bx_ref[k],
                n_v, n_y, n_x, n_u, dtype,
            )
            sl = slice_ref[i]
            en = enable_ref[k]

            def resample(c):
                src = sl[c]
                if softplus and c == 0:
                    src = _softplus(src)  # fused density transform
                tmp = sweep_dot(mat_a, src, precision, dtype)
                return sweep_dot(tmp, mat_b, precision, dtype)

            def grad_to_slice(d_vu):
                # A^T @ d @ B^T via transposed contractions.
                tmp = sweep_dot(
                    mat_a, d_vu, precision, dtype,
                    dims=(((0,), (0,)), ((), ())),
                )  # (Y, U)
                return sweep_dot(
                    tmp, mat_b, precision, dtype,
                    dims=(((1,), (1,)), ((), ())),
                )  # (Y, X)

            sig_raw = resample(0)
            sigma = jnp.maximum(sig_raw, 0.0) * en
            dt = dt_ref[...]
            att = _att_exp((sigma_scale * sigma) * dt, precision)
            trans = trans_ref[...]
            w = trans * (1.0 - att)      # weight of this slice's emission

            # Channel-contracted color prefix including this step.
            q = q_ref[...]
            dsig = -dbias_ref[...]
            for c in range(3):
                smp_c = resample(c + 1)
                d_c = d_c_ref[c]
                q = q + (d_c * w) * smp_c
                dsig = dsig + d_c * (trans * att) * smp_c
                grad_ref[i, c + 1] = grad_to_slice(d_c * w)  # d emission_c
            q_ref[...] = q
            dsig = (dsig + q) * (sigma_scale * dt)
            # relu mask + occupancy gate: skipped slices get zero grads.
            dsig = jnp.where(sig_raw > 0.0, dsig, 0.0) * en
            gs = grad_to_slice(dsig)
            if softplus:
                # Chain to raw density parameters: d softplus = sigmoid.
                gs = gs * _sigmoid(sl[0])
            grad_ref[i, 0] = gs
            trans_ref[...] = trans * att

        for b in range(block):
            slice_body(b)
        if early_stop_eps > 0.0:
            tmax_ref[0] = jnp.max(trans_ref[...])

    @pl.when(jnp.logical_not(live))
    def _skipped():
        grad_ref[...] = jnp.zeros_like(grad_ref)


def _sweep_bwd_dbatch_kernel(
    pos_ref,     # (B, V) per-(slice, output-row) positions (enables folded)
    ax_ref,      # SMEM (views, S)
    bx_ref,      # SMEM (views, S)
    slice_ref,   # (B, 4, Y, X) grid slices (recompute)
    dt_ref,      # (V, U)
    dbias_ref,   # (V, U)
    d_c_ref,     # (3, V, U)
    trans0_ref,  # (V, U) carry in
    q0_ref,      # (V, U) carry in
    grad_ref,    # out (B, 4, Y, X)
    trans_ref,   # out (V, U) carry out
    q_ref,       # out (V, U) carry out
    tmp_ref,     # scratch (4, V, X) y-side recompute partials
    e_ref,       # scratch (4, V, X) B-projected cotangent planes
    tmax_ref,    # SMEM (views,) PER-VIEW ERT state
    *,
    sigma_scale: float,
    early_stop_eps: float,
    precision: str,
    block: int,
    reverse: bool,
    views: int,
    softplus: bool = False,
):
    """DENSE view-batched backward (see _sweep_fwd_dbatch_kernel).

    Recompute: one (V_total, Y) position-vector tent matrix resamples
    the whole stacked batch per channel; the per-view u-side loops the
    (static) view count. The gradient projection
    ``sum_w A_w^T dS_w B_w^T`` is factored MXU-friendly: each view's
    B-side lands in a stacked scratch ``E[g] = [dS_w B_w^T]_w``
    (per-view (v_pv, U) @ (U, X) matmuls), then ONE deep contraction
    ``A_full^T @ E[g]`` (K = V_total) per channel writes the slice
    gradient — Sum_w a_w^T (dS_w B_w^T) == A_full^T E because each
    view's rows are disjoint in A_full. Same FLOPs as the per-view
    pair, but 4 big matmuls replace 32 small ones and the grad block
    is written exactly once (no per-view VMEM read-modify-write);
    the stacked-E rewrite measured 7.86 ms -> 6.0 ms for this kernel
    at the c4 shape (2026-08-20; rerun tools/kernel_tune.py for
    current numbers on the target chip).
    Parked (disabled) rows have all-zero tent weights => sig_raw = 0 =>
    the relu mask and w = 0 zero both density and emission gradients —
    identical lossless gating to the forward.

    ERT state is PER VIEW, mirroring _sweep_fwd_dbatch_kernel exactly:
    a terminated view's E rows are zero-filled, so it contributes zero
    gradient from that block on, matching the per-view loop kernel.
    """
    step = pl.program_id(0)
    n_v, n_u = trans_ref.shape
    n_y, n_x = slice_ref.shape[2], slice_ref.shape[3]
    dtype = trans_ref.dtype
    v_pv = n_v // views

    @pl.when(step == 0)
    def _init():
        trans_ref[...] = trans0_ref[...]
        q_ref[...] = q0_ref[...]
        for w in range(views):
            tmax_ref[w] = jnp.max(trans0_ref[w * v_pv:(w + 1) * v_pv])

    if early_stop_eps > 0.0:
        tall = tmax_ref[0]
        for w in range(1, views):
            tall = jnp.maximum(tall, tmax_ref[w])
        live = tall >= early_stop_eps
    else:
        live = True

    @pl.when(live)
    def _block():
        # Position arithmetic in f32 regardless of compute dtype; only
        # the tent weights are cast (see sweep._interp_matrices).
        f32 = jnp.float32
        yy = jax.lax.broadcasted_iota(
            jnp.int32, (n_v, n_y), 1).astype(f32)
        ju = jax.lax.broadcasted_iota(
            jnp.int32, (n_x, n_u), 1).astype(f32)
        xx = jax.lax.broadcasted_iota(
            jnp.int32, (n_x, n_u), 0).astype(f32)

        def slice_body(b):
            k = step * block + b
            i_sl = block - 1 - b if reverse else b
            pos = pos_ref[b, 0].astype(f32)
            mat_a = jnp.maximum(
                0.0, 1.0 - jnp.abs(pos[:, None] - yy)
            ).astype(dtype)
            sl = slice_ref[i_sl]
            for c in range(4):
                src = sl[c]
                if softplus and c == 0:
                    src = _softplus(src)  # fused density transform
                tmp_ref[c] = sweep_dot(mat_a, src, precision, dtype)

            def view_body(w):
                mat_b = jnp.maximum(
                    0.0,
                    1.0 - jnp.abs(ju * ax_ref[w, k].astype(f32)
                                  + bx_ref[w, k].astype(f32) - xx),
                ).astype(dtype)
                vs = slice(w * v_pv, (w + 1) * v_pv)

                def resample(c):
                    return sweep_dot(tmp_ref[c, vs, :], mat_b,
                                     precision, dtype)

                sig_raw = resample(0)
                sigma = jnp.maximum(sig_raw, 0.0)
                dt = dt_ref[vs]
                att = _att_exp((sigma_scale * sigma) * dt, precision)
                trans = trans_ref[vs]
                wgt = trans * (1.0 - att)
                q = q_ref[vs]
                dsig = -dbias_ref[vs]
                d_planes = []
                for c in range(3):
                    smp_c = resample(c + 1)
                    d_c = d_c_ref[c, vs, :]
                    q = q + (d_c * wgt) * smp_c
                    dsig = dsig + d_c * (trans * att) * smp_c
                    d_planes.append(d_c * wgt)
                q_ref[vs] = q
                dsig = (dsig + q) * (sigma_scale * dt)
                dsig = jnp.where(sig_raw > 0.0, dsig, 0.0)
                trans_ref[vs] = trans * att

                # B-side projection into the stacked scratch: the final
                # A_full^T contraction below folds all views at once.
                for g, d_vu in enumerate([dsig] + d_planes):
                    e_ref[g, vs] = sweep_dot(
                        d_vu, mat_b, precision, dtype,
                        dims=(((1,), (1,)), ((), ())),
                    )  # (v_pv, X)

            def view_dead(w):
                # Terminated view: zero its E rows (its gradient
                # contribution from this block on is exactly zero).
                vs = slice(w * v_pv, (w + 1) * v_pv)
                e_ref[:, vs] = jnp.zeros_like(e_ref[:, vs])

            for w in range(views):
                if early_stop_eps > 0.0:
                    alive_w = tmax_ref[w] >= early_stop_eps
                    pl.when(alive_w)(functools.partial(view_body, w))
                    pl.when(jnp.logical_not(alive_w))(
                        functools.partial(view_dead, w)
                    )
                else:
                    view_body(w)

            # One deep (K = V_total) contraction per channel: grad =
            # A_full^T @ E (per-view row blocks of A are disjoint).
            for g in range(4):
                gs = sweep_dot(
                    mat_a, e_ref[g], precision, dtype,
                    dims=(((0,), (0,)), ((), ())),
                )  # (Y, X)
                if softplus and g == 0:
                    gs = gs * _sigmoid(sl[0])  # chain to raw params
                grad_ref[i_sl, g] = gs

        for b in range(block):
            slice_body(b)
        if early_stop_eps > 0.0:
            for w in range(views):
                tmax_ref[w] = jnp.max(
                    trans_ref[w * v_pv:(w + 1) * v_pv]
                )

    @pl.when(jnp.logical_not(live))
    def _skipped():
        grad_ref[...] = jnp.zeros_like(grad_ref)


def _sweep_bwd_banded_kernel(
    ay_ref, by_ref, ax_ref, bx_ref, enable_ref,   # SMEM (n_vt, S) scalars
    slice_ref,   # (B, 4, Y, X) block of grid slices (recompute)
    dt_ref,      # (V, U)
    dbias_ref,   # (V, U)
    d_c_ref,     # (3, V, U)
    trans0_ref,  # (V, U) carry in: transmittance entering this chunk
    q0_ref,      # (V, U) carry in: color-prefix contraction entering
    grad_ref,    # out: (B, 4, Y, X)
    trans_ref,   # out (V, U): running transmittance (carry out)
    q_ref,       # out (V, U): color-prefix contraction (carry out)
    dsig_ref,    # scratch (V, U): assembled density cotangent plane
    w_ref,       # scratch (V, U): assembled emission weight plane
    tmp_ref,     # scratch (4, X, _TILE): transposed row-stage partials
    p_ref,       # scratch (Y, U): banded grad partial A^T dS
    pt_ref,      # scratch (U, Y): its transpose (u on sublanes)
    tmax_ref,    # scratch SMEM (1,)
    *,
    sigma_scale: float,
    early_stop_eps: float,
    precision: str,
    block: int,
    reverse: bool,
    w_u: int,
    tile_v: int = _TILE,
    tile_u: int = _TILE,
    view_tiles: int | None = None,
    softplus: bool = False,
):
    """Banded backward sweep.

    The recompute side is the banded forward pattern (half the dense MXU
    work — see _sweep_fwd_banded_kernel): per (v, u) output tile, the
    resamples contract over _TILE-wide slice windows, and the per-ray
    cotangent planes dsig = dL/d(sigma samples) and w = T(1-att) are
    assembled tile-by-tile into (V, U) scratches.

    The gradient projection A^T dS B^T is then banded in its own
    (transpose, downsampling) direction: the v-contraction accumulates
    _TILE-row tiles of dS into the (Y, U) partial P through _TILE-wide
    y-windows; P is transposed in-kernel so the u-contraction's tap
    window (width ``w_u`` ~ (_TILE+2)/|ax|, larger than the tile because
    the transpose direction has slope 1/|ax| > 1) is again a sublane
    slice; each _TILE-column grad tile is then one (w_u)-contraction.
    ``w_u == U`` statically disables that last banding (dense u-side).
    Same math as the dense kernel up to f32 summation order.

    Scalar arrays are (S, n_vt) per-(slice, v-tile), as in the forward.
    VIEW BATCHES (``view_tiles`` = v-tiles per view): stage 1 is
    unchanged (each v-tile reads its own affine), but the projection's
    u-contraction operator B^T differs per view, so stage 2 folds each
    view's v-tiles into P separately and ACCUMULATES that view's
    A^T dS B^T into the slice gradient — the grid (and its gradient
    output block) still stream exactly once for the whole batch.
    """
    step = pl.program_id(0)
    n_v, n_u = trans_ref.shape
    n_y, n_x = slice_ref.shape[2], slice_ref.shape[3]
    dtype = trans_ref.dtype
    t = _TILE  # window width (fixed); tile_v/tile_u are the output tiles
    n_vt = n_v // tile_v
    vt_pv = n_vt if view_tiles is None else view_tiles
    n_views = n_vt // vt_pv

    @pl.when(step == 0)
    def _init():
        # Carry in from the previous slab chunk (ones/zeros unchunked).
        trans_ref[...] = trans0_ref[...]
        q_ref[...] = q0_ref[...]
        tmax_ref[0] = jnp.max(trans0_ref[...])

    live = tmax_ref[0] >= early_stop_eps if early_stop_eps > 0.0 else True

    @pl.when(live)
    def _block():
        # Position arithmetic in f32 regardless of compute dtype; only
        # the tent weights are cast (see sweep._interp_matrices).
        f32 = jnp.float32
        ia = jax.lax.broadcasted_iota(
            jnp.int32, (tile_v, t), 0).astype(f32)
        ja = jax.lax.broadcasted_iota(
            jnp.int32, (tile_v, t), 1).astype(f32)
        jb = jax.lax.broadcasted_iota(
            jnp.int32, (t, tile_u), 0).astype(f32)
        ib = jax.lax.broadcasted_iota(
            jnp.int32, (t, tile_u), 1).astype(f32)

        def slice_body(b):
            k = step * block + b
            i_sl = block - 1 - b if reverse else b

            # Stage 1 (banded): recompute per-ray state tile-by-tile and
            # assemble the dsig / w cotangent planes.
            def row_stage(vt):
                ay, by = ay_ref[vt, k].astype(f32), by_ref[vt, k].astype(f32)
                v0 = vt * tile_v
                f0 = v0 * ay + by
                r0, boff = _band_window(
                    f0, f0 + (tile_v - 1) * ay, n_y, f32
                )
                mat_a = jnp.maximum(
                    0.0, 1.0 - jnp.abs(ia * ay + boff - ja)
                ).astype(dtype)
                for c in range(4):
                    src = slice_ref[i_sl, c, pl.ds(r0, t), :]
                    if softplus and c == 0:
                        src = _softplus(src)  # fused density transform
                    tmp_ref[c] = sweep_dot(
                        src, mat_a,
                        precision, dtype,
                        dims=(((0,), (1,)), ((), ())),
                    )

            def tile_stage(vt, ut):
                ax, bx = ax_ref[vt, k].astype(f32), bx_ref[vt, k].astype(f32)
                en = enable_ref[vt, k]
                v0, u0 = vt * tile_v, ut * tile_u
                g0 = u0 * ax + bx
                c0, coff = _band_window(
                    g0, g0 + (tile_u - 1) * ax, n_x, f32
                )
                mat_b = jnp.maximum(
                    0.0, 1.0 - jnp.abs(ib * ax + coff - jb)
                ).astype(dtype)

                def resample(c):
                    return sweep_dot(
                        tmp_ref[c, pl.ds(c0, t), :], mat_b, precision,
                        dtype, dims=(((0,), (0,)), ((), ())),
                    )

                vs = pl.ds(v0, tile_v)
                us = slice(u0, u0 + tile_u)
                sig_raw = resample(0)
                sigma = jnp.maximum(sig_raw, 0.0) * en
                dt = dt_ref[vs, us]
                att = _att_exp((sigma_scale * sigma) * dt, precision)
                trans = trans_ref[vs, us]
                w = trans * (1.0 - att)
                q = q_ref[vs, us]
                dsig = -dbias_ref[vs, us]
                for c in range(3):
                    smp_c = resample(c + 1)
                    d_c = d_c_ref[c, vs, us]
                    q = q + (d_c * w) * smp_c
                    dsig = dsig + d_c * (trans * att) * smp_c
                q_ref[vs, us] = q
                dsig = (dsig + q) * (sigma_scale * dt)
                dsig = jnp.where(sig_raw > 0.0, dsig, 0.0) * en
                dsig_ref[vs, us] = dsig
                w_ref[vs, us] = w
                trans_ref[vs, us] = trans * att

            def vt_stage1(vt):
                row_stage(vt)
                for ut in range(n_u // tile_u):
                    tile_stage(vt, ut)

            if n_vt > 8:
                # Many v-tiles (view batches): loop instead of unrolling
                # — the unrolled form exploded Mosaic compile time.
                jax.lax.fori_loop(
                    0, n_vt, lambda vt, c: (vt_stage1(vt), c)[1], 0,
                    unroll=False,
                )
            else:
                for vt in range(n_vt):
                    vt_stage1(vt)

            # Stage 2 (banded transpose): grad = sum over views of
            # A_w^T dS_w B_w^T from the assembled planes. Each view's
            # v-tiles fold into P under its own A; its B^T projection
            # then ACCUMULATES into the slice gradient (first view
            # writes). A single view reduces to one pass, written once.
            for g in range(4):

                def d_rows(v0):
                    s = (pl.ds(v0, tile_v), slice(None))
                    return (dsig_ref[s] if g == 0
                            else d_c_ref[g - 1, s[0], s[1]] * w_ref[s])

                def accum_rows(vt):
                    ay = ay_ref[vt, k].astype(f32)
                    by = by_ref[vt, k].astype(f32)
                    v0 = vt * tile_v
                    f0 = v0 * ay + by
                    r0, boff = _band_window(
                        f0, f0 + (tile_v - 1) * ay, n_y, f32
                    )
                    mat_a = jnp.maximum(
                        0.0, 1.0 - jnp.abs(ia * ay + boff - ja)
                    ).astype(dtype)
                    p_ref[pl.ds(r0, t), :] += sweep_dot(
                        mat_a, d_rows(v0), precision, dtype,
                        dims=(((0,), (0,)), ((), ())),
                    )

                for w_i in range(n_views):
                    # 2a: v-contraction into P through y-windows (this
                    # view's tiles only).
                    p_ref[...] = jnp.zeros_like(p_ref)

                    def acc_one(vt):
                        accum_rows(vt)

                    if vt_pv > 8:
                        jax.lax.fori_loop(
                            w_i * vt_pv, (w_i + 1) * vt_pv,
                            lambda vt, c: (acc_one(vt), c)[1], 0,
                            unroll=False,
                        )
                    else:
                        for vt in range(w_i * vt_pv,
                                        (w_i + 1) * vt_pv):
                            acc_one(vt)
                    # This view's u-side operator scalars (uniform
                    # across its v-tiles).
                    vt0 = w_i * vt_pv
                    ay, by = (ay_ref[vt0, k].astype(f32),
                              by_ref[vt0, k].astype(f32))
                    ax, bx = (ax_ref[vt0, k].astype(f32),
                              bx_ref[vt0, k].astype(f32))
                    if w_u >= n_u:
                        # Dense u-side: one (Y,U)@(U,X) via B^T.
                        mat_b = _interp_matrices(
                            ay, by, ax, bx, n_v, n_y, n_x, n_u, dtype
                        )[1]
                        gslice = sweep_dot(
                            p_ref[...], mat_b, precision, dtype,
                            dims=(((1,), (1,)), ((), ())),
                        )
                        if softplus and g == 0:
                            # chain to raw params (after the last view's
                            # accumulate for multi-view batches: do it
                            # only on the final pass)
                            if w_i == n_views - 1:
                                if w_i == 0:
                                    gslice = gslice * _sigmoid(
                                        slice_ref[i_sl, 0])
                                else:
                                    gslice = (grad_ref[i_sl, g] + gslice
                                              ) * _sigmoid(
                                        slice_ref[i_sl, 0])
                                grad_ref[i_sl, g] = gslice
                                continue
                        if w_i == 0:
                            grad_ref[i_sl, g] = gslice
                        else:
                            grad_ref[i_sl, g] += gslice
                        continue
                    # 2b/2c: transpose so u is on sublanes, then one
                    # w_u-contraction per _TILE-column grad tile.
                    inv_ax = 1.0 / jnp.abs(ax)
                    pt_ref[...] = jnp.transpose(p_ref[...], (1, 0))
                    for xt in range(n_x // t):
                        x0 = xt * t
                        u_a = (x0 - bx) / ax
                        u_b = (x0 + (t - 1) - bx) / ax
                        lo = jnp.minimum(u_a, u_b) - inv_ax
                        u0w = jnp.clip(
                            jnp.floor(lo), 0, n_u - w_u
                        ).astype(jnp.int32)
                        u0w = (u0w // 8) * 8
                        # B_w[j, x'] = w((u0w+j)*ax + bx - (x0+x')).
                        # Positions in f32 (see sweep._interp_matrices).
                        jw = jax.lax.broadcasted_iota(
                            jnp.int32, (w_u, t), 0
                        ).astype(f32)
                        xx = jax.lax.broadcasted_iota(
                            jnp.int32, (w_u, t), 1
                        ).astype(f32)
                        off = u0w.astype(f32) * ax + bx - x0
                        gtile = sweep_dot(
                            pt_ref[pl.ds(u0w, w_u), :], jnp.maximum(
                                0.0, 1.0 - jnp.abs(jw * ax + off - xx)
                            ).astype(dtype),
                            precision, dtype,
                            dims=(((0,), (0,)), ((), ())),
                        )  # (Y, t): lhs free dim Y, rhs free dim t
                        if softplus and g == 0 and w_i == n_views - 1:
                            # chain to raw params on the final view pass
                            prev = (grad_ref[i_sl, g, :, x0:x0 + t]
                                    if w_i else 0.0)
                            grad_ref[i_sl, g, :, x0:x0 + t] = (
                                prev + gtile
                            ) * _sigmoid(slice_ref[i_sl, 0, :, x0:x0 + t])
                            continue
                        if w_i == 0:
                            grad_ref[i_sl, g, :, x0:x0 + t] = gtile
                        else:
                            grad_ref[i_sl, g, :, x0:x0 + t] += gtile

        for b in range(block):
            slice_body(b)
        if early_stop_eps > 0.0:
            tmax_ref[0] = jnp.max(trans_ref[...])

    @pl.when(jnp.logical_not(live))
    def _skipped():
        grad_ref[...] = jnp.zeros_like(grad_ref)


@functools.partial(
    jax.jit,
    static_argnames=("reverse", "sigma_scale", "early_stop_eps",
                     "precision", "interpret", "block", "band", "views",
                     "softplus"),
)
def sweep_bwd(
    grid_sc,     # (S, 4, Y, X)
    coeffs,      # (ay, by, ax, bx) traversal order ((views, S) batched)
    enables,     # (S,)  ((views, S) batched)
    dt_map,      # (V, U) — view batches stack planes along V
    c_final,     # (3, V, U) forward outputs (residuals)
    t_final,     # (V, U)
    d_color,     # (3, V, U) cotangents
    d_trans,     # (V, U)
    *,
    reverse: bool = False,
    sigma_scale: float = 1.0,
    early_stop_eps: float = 0.0,
    precision: str = "highest",
    interpret: bool | None = None,
    block: int | None = None,
    band: tuple | None = None,
    views: int = 1,
    softplus: bool = False,
    carry=None,
):
    """Gradient of the sweep w.r.t. the grid.

    Returns (S, 4, Y, X) gradient in the same layout as ``grid_sc``.
    ``band`` as in sweep_fwd enables the banded recompute.
    ``views`` as in sweep_fwd: the stacked view batch re-marches and
    projects all views' gradients in ONE grid stream. ERT semantics
    for view batches mirror sweep_fwd: per-view state in the DENSE
    batched kernel (exact parity with the per-view loop), joint
    max-over-views state in the BANDED batched kernel (sub-eps
    divergence; see sweep_fwd docstring).

    ``carry``: optional (trans0, q0) — the recompute state entering
    this call, for SLAB-CHUNKED backwards (the grad-allreduce/backward
    overlap, BASELINE.json:5): split the slice axis into chunks, call
    sweep_bwd per chunk threading the carry, and issue each chunk's
    grad collective while later chunks still march. With a carry the
    call returns ``(grad, (trans_fin, q_fin))``; the identity carry is
    ``(ones, zeros)``.
    """
    if interpret is None:
        interpret = use_interpret()
    s, _, n_y, n_x = grid_sc.shape
    n_v, n_u = dt_map.shape
    dtype = grid_sc.dtype
    ay, by, ax, bx = coeffs
    # Adaptive output tiles, EXACTLY as the forward dispatch picks them
    # (sweep_fwd:438): steep sweeps (slope > ~0.93) must shrink the
    # output tile so its tap band fits the fixed _TILE window — leaving
    # the kernel at the 128 default would silently clamp out-of-window
    # taps to zero weight and corrupt recomputed values AND gradients.
    tiles = band_tiles(band, n_v // views, n_u, n_y, n_x)
    banded = tiles is not None
    # Same routing as sweep_fwd: full-128 banded tiles keep the banded
    # savings; steeper view batches go DENSE-batched.
    dbatch = views > 1 and not (banded and tiles == (_TILE, _TILE))
    if views > 1 and dbatch:
        banded = False
    if block is None:
        # The view-batched backward prefers 2-slice blocks: its 16+
        # matmuls/slice already fill the pipeline, and the smaller
        # block halves the (B, 4, Y, X) grad staging working set —
        # measured 7.14 vs 8.14 ms at the c4 shape (block 2 vs 4,
        # tools/kernel_tune.py 2026-08-21, ~78% vs 68% MXU util).
        prefer = (2, 1) if dbatch else (4, 2, 1)
        block = next(b for b in prefer if s % b == 0)
    if s % block:
        raise ValueError(f"block {block} must divide n_slices {s}")
    n_steps = s // block

    def block_index(step):
        return ((n_steps - 1 - step) if reverse else step, 0, 0, 0)
    if banded:
        # Static u-window width for the banded gradient projection: the
        # transpose direction has slope 1/|ax| > 1, so a _TILE-column
        # grad tile's taps span ~(_TILE + 2)/|ax| rays (+ alignment and
        # clamping slack). w_u >= n_u statically degrades to the dense
        # u-side inside the kernel.
        ax_min = band[3] if len(band) > 3 else band[1]
        # The windowed u-side tiles the grad plane's X extent statically;
        # a remainder tile would be skipped, so it needs X % _TILE == 0
        # (w_u = n_u selects the dense u-side inside the kernel). At
        # 'default' (1-pass bf16) the window/transpose overhead outweighs
        # the cheap MXU savings — measured 0.95x — so it stays dense-u.
        if ax_min > 0 and n_x % _TILE == 0 and precision != "default":
            import math as _math

            w_u = -(-(int(_math.ceil((_TILE + 3.0) / ax_min)) + 24) // 8) * 8
            w_u = min(w_u, n_u)
        else:
            w_u = n_u
        kernel = functools.partial(
            _sweep_bwd_banded_kernel,
            sigma_scale=float(sigma_scale),
            early_stop_eps=float(early_stop_eps),
            precision=precision,
            block=block,
            reverse=reverse,
            w_u=w_u,
            tile_v=tiles[0],
            tile_u=tiles[1],
            view_tiles=(n_v // views) // tiles[0],
            softplus=softplus,
        )
    else:
        kernel = functools.partial(
            _sweep_bwd_kernel,
            sigma_scale=float(sigma_scale),
            early_stop_eps=float(early_stop_eps),
            precision=precision,
            block=block,
            reverse=reverse,
            softplus=softplus,
        )
    # One resident bias plane instead of (c_final, t_final, d_trans):
    # dbias = sum_c dC_c * C_final_c + dT * T_final (see module docstring).
    dbias = jnp.einsum("cvu,cvu->vu", d_color, c_final) + d_trans * t_final
    trans0, q0 = carry if carry is not None else (
        jnp.ones((n_v, n_u), dtype), jnp.zeros((n_v, n_u), dtype)
    )

    # Whole-array SMEM blocks (rank-1 size-1 blocks are not lowerable);
    # kernels index them with program_id.
    scalar_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
    vu_spec = pl.BlockSpec((n_v, n_u), lambda k: (0, 0),
                           memory_space=pltpu.VMEM)
    cvu_spec = pl.BlockSpec((3, n_v, n_u), lambda k: (0, 0, 0),
                            memory_space=pltpu.VMEM)
    if dbatch:
        from tpuvr.kernels.sweep import batch_positions

        pos, axv, bxv = batch_positions(
            (ay, by, ax, bx), enables, n_v, views, n_y, dtype
        )
        kernel = functools.partial(
            _sweep_bwd_dbatch_kernel,
            sigma_scale=float(sigma_scale),
            early_stop_eps=float(early_stop_eps),
            precision=precision,
            block=block,
            reverse=reverse,
            views=views,
            softplus=softplus,
        )
        grad_yx, trans_fin, q_fin = pl.pallas_call(
            kernel,
            grid=(n_steps,),
            in_specs=[
                pl.BlockSpec((block, 1, n_v), lambda k: (k, 0, 0),
                             memory_space=pltpu.VMEM),
                scalar_spec, scalar_spec,
                pl.BlockSpec((block, 4, n_y, n_x), block_index,
                             memory_space=pltpu.VMEM),
                vu_spec, vu_spec, cvu_spec, vu_spec, vu_spec,
            ],
            out_specs=[
                pl.BlockSpec((block, 4, n_y, n_x), block_index,
                             memory_space=pltpu.VMEM),
                vu_spec, vu_spec,
            ],
            out_shape=[
                out_struct((s, 4, n_y, n_x), dtype, grid_sc, enables,
                           by, dt_map, d_color),
                out_struct((n_v, n_u), dtype, grid_sc, enables, by,
                           dt_map, d_color),
                out_struct((n_v, n_u), dtype, grid_sc, enables, by,
                           dt_map, d_color),
            ],
            scratch_shapes=[
                pltpu.VMEM((4, n_v, n_x), dtype),
                pltpu.VMEM((4, n_v, n_x), dtype),  # stacked B-side E
                pltpu.SMEM((views,), dtype),  # per-view ERT state
            ],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024,
            ),
            interpret=interpret,
        )(pos, axv, bxv, grid_sc, dt_map, dbias, d_color, trans0, q0)
        if carry is None:
            return grad_yx
        return grad_yx, (trans_fin, q_fin)
    in_specs = [scalar_spec] * 5
    operands = [ay, by, ax, bx, enables]
    if banded:
        from tpuvr.kernels.sweep import _expand_tile_scalars

        operands = list(_expand_tile_scalars(
            (ay, by, ax, bx, enables), views, tiles[0], n_v
        ))
    grad_yx, trans_fin, q_fin = pl.pallas_call(
        kernel,
        grid=(n_steps,),
        in_specs=in_specs + [
            pl.BlockSpec((block, 4, n_y, n_x), block_index,
                         memory_space=pltpu.VMEM),
            vu_spec, vu_spec, cvu_spec, vu_spec, vu_spec,
        ],
        out_specs=[
            pl.BlockSpec((block, 4, n_y, n_x), block_index,
                         memory_space=pltpu.VMEM),
            vu_spec, vu_spec,
        ],
        out_shape=[
            out_struct((s, 4, n_y, n_x), dtype, grid_sc, enables,
                       by, dt_map, d_color),
            out_struct((n_v, n_u), dtype, grid_sc, enables, by, dt_map,
                       d_color),
            out_struct((n_v, n_u), dtype, grid_sc, enables, by, dt_map,
                       d_color),
        ],
        scratch_shapes=(
            [pltpu.VMEM((n_v, n_u), dtype)] * (2 if banded else 0)
            + ([pltpu.VMEM((4, n_x, tiles[0]), dtype),
                pltpu.VMEM((n_y, n_u), dtype),
                pltpu.VMEM((n_u, n_y), dtype)] if banded else [])
            + [pltpu.SMEM((1,), dtype)]
        ),
        # The resident ray planes + matmul temporaries exceed the 16 MB
        # default scoped-vmem budget at 256^3 @ 512^2; the chip has far
        # more physical VMEM.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(*operands, grid_sc, dt_map, dbias, d_color, trans0, q0)
    if carry is None:
        return grad_yx
    return grad_yx, (trans_fin, q_fin)
