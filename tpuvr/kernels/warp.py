"""Pallas pixel-warp kernels: row-block tent resample of the lattice.

The shear-warp's final 2D bilinear resample maps each pixel to a point
in the intermediate lattice. The XLA formulations both have a flaw on
TPU: the per-pixel gather lowers to scalar gathers (12 ms of a 13 ms
frame, BASELINE.md 2026-08-19), and the tiled tent-matmul warp
(tpuvr.ops.warp.warp_tiled) needs one dynamic_slice per tile — with
TRACED footprint origins (the batched-training path indexes per-view
origins with the view pick) XLA lowers the vmapped slices to a serial
while loop of slice + dynamic-update-slice, measured at 5.3 ms of the
18.5 ms c4 train step (xplane trace, 2026-08-20).

Here the warp is one Pallas kernel:

- the OUTPUT image is cut into row blocks (ty rows); the pallas grid
  iterates over blocks; each block's pixel positions arrive flattened
  as a (1, P = ty*res_x) VMEM slab;
- the block's lattice footprint is a (F, U) SUBLANE window of the
  (4, V, U) lattice image, fetched with an 8-aligned dynamic sublane
  offset from an SMEM origin vector — the Pallas analog of the tiled
  warp's dynamic_slice, but pipelined by Mosaic instead of serialized
  by an XLA while loop. The u axis is NOT windowed: the tent matrix is
  (P, U) and the contraction runs on the MXU (tent rows have exactly
  two nonzeros, so the extra columns are exact-zero work — FLOPs are
  ~0.05 ms at the c4 shape, far below the while-loop overhead they
  replace);
- the v side is a 2-tap weighted reduce over F lanes.

The backward kernel is the exact transpose: d_foot = d_partᵀ tent_u
accumulated into the (4, V, U) gradient plane through the same sublane
windows — race-free because TPU Pallas grid steps run sequentially per
core (no atomics, SURVEY.md §3.3).

Tap-exactness matches tpuvr.ops.warp: tents reproduce the bilinear
weights exactly; only multiply associativity differs (1 ulp).

MEASURED OUTCOME (2026-08-20, v5e, judged c4 shape): 21.3 ms/step vs
18.5 with the XLA tiled warp — the steep 45-degree-azimuth orbit
groups have no 1-D row locality (v varies along both pixel axes), so
the plan falls back to (64, 16) tiles and the 64 small per-tile grid
steps cost more than the while loop they replace. The kernel therefore
ships OPT-IN (TPUVR_WARP=rows); it wins the shapes it was designed
for (row-coherent lattices: row blocks, f_v ~ 16) and stays fully
tested either way.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpuvr.kernels._compat import out_struct, use_interpret


def _warp_rows_fwd_kernel(
    vb_ref,      # SMEM (n_blocks,) int32 footprint origins (8-aligned,
                 # clipped to n_v - F by the caller)
    y_ref,       # (1, 1, P) this block's lattice-row positions
    x_ref,       # (1, 1, P) this block's lattice-col positions
    inter_ref,   # (C, V, U) whole lattice image (VMEM resident)
    out_ref,     # (C, 1, 1, P) this block's output pixels
    *,
    f_v: int,
    precision,
):
    k = pl.program_id(0)
    n_c, n_v, n_u = inter_ref.shape
    p = y_ref.shape[-1]
    dtype = out_ref.dtype
    # The caller 8-aligns the origins; re-deriving the alignment here
    # lets Mosaic prove the dynamic sublane offset is legal.
    vb = (vb_ref[k] // 8) * 8

    xs = x_ref[0, 0]  # (P,)
    ys = y_ref[0, 0] - vb.astype(dtype)
    iu = jax.lax.broadcasted_iota(jnp.int32, (p, n_u), 1).astype(dtype)
    tent_u = jnp.maximum(0.0, 1.0 - jnp.abs(iu - xs[:, None]))
    iv = jax.lax.broadcasted_iota(jnp.int32, (p, f_v), 1).astype(dtype)
    tent_v = jnp.maximum(0.0, 1.0 - jnp.abs(iv - ys[:, None]))
    for c in range(n_c):
        foot = inter_ref[c, pl.ds(vb, f_v), :]  # (F, U) sublane window
        part = jax.lax.dot_general(
            tent_u, foot, (((1,), (1,)), ((), ())),
            preferred_element_type=dtype, precision=precision,
        )  # (P, F)
        out_ref[c, 0, 0, :] = jnp.sum(tent_v * part, axis=1)


def _warp_rows_bwd_kernel(
    vb_ref,      # SMEM (n_blocks,)
    y_ref,       # (1, 1, P)
    x_ref,       # (1, 1, P)
    d_out_ref,   # (C, 1, 1, P) cotangent on this block's pixels
    d_inter_ref, # out (C, V, U), accumulated across blocks
    *,
    f_v: int,
    precision,
):
    k = pl.program_id(0)
    n_c, n_v, n_u = d_inter_ref.shape
    p = y_ref.shape[-1]
    dtype = d_inter_ref.dtype
    vb = (vb_ref[k] // 8) * 8  # provably 8-aligned (see fwd kernel)

    @pl.when(k == 0)
    def _init():
        d_inter_ref[...] = jnp.zeros_like(d_inter_ref)

    xs = x_ref[0, 0]
    ys = y_ref[0, 0] - vb.astype(dtype)
    iu = jax.lax.broadcasted_iota(jnp.int32, (p, n_u), 1).astype(dtype)
    tent_u = jnp.maximum(0.0, 1.0 - jnp.abs(iu - xs[:, None]))
    iv = jax.lax.broadcasted_iota(jnp.int32, (p, f_v), 1).astype(dtype)
    tent_v = jnp.maximum(0.0, 1.0 - jnp.abs(iv - ys[:, None]))
    for c in range(n_c):
        d_part = tent_v * d_out_ref[c, 0, 0, :][:, None]  # (P, F)
        d_foot = jax.lax.dot_general(
            d_part, tent_u, (((0,), (0,)), ((), ())),
            preferred_element_type=dtype, precision=precision,
        )  # (F, U)
        d_inter_ref[c, pl.ds(vb, f_v), :] += d_foot


@functools.partial(
    jax.jit, static_argnames=("f_v", "interpret", "precision")
)
def warp_rows_fwd(inter_cvu, y_t, x_t, vbase, *, f_v: int,
                  interpret: bool | None = None, precision: str = "highest"):
    """(C, V, U) lattice -> (C, n_blocks, P) warped row blocks.

    ``y_t``/``x_t``: (n_blocks, P) clipped lattice positions (row-major
    flattened row blocks); ``vbase``: (n_blocks,) int32 8-aligned
    origins with ``vbase + f_v <= V`` (see tpuvr.ops.warp.plan_row_warp).
    """
    if interpret is None:
        interpret = use_interpret()
    n_c, n_v, n_u = inter_cvu.shape
    n_blocks, p = y_t.shape
    dtype = inter_cvu.dtype
    prec = (jax.lax.Precision.HIGHEST if precision == "highest"
            else jax.lax.Precision.DEFAULT)
    # Unit middle dims put the TPU block-shape constraint on (1, P)
    # (second-minor must divide 8 or equal the array dim — 1 == 1).
    y3 = y_t.reshape(n_blocks, 1, p)
    x3 = x_t.reshape(n_blocks, 1, p)
    out = pl.pallas_call(
        functools.partial(_warp_rows_fwd_kernel, f_v=f_v, precision=prec),
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, p), lambda k: (k, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, p), lambda k: (k, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_c, n_v, n_u), lambda k: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((n_c, 1, 1, p), lambda k: (0, k, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=out_struct((n_c, n_blocks, 1, p), dtype, inter_cvu,
                             y_t),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(vbase, y3, x3, inter_cvu)
    return out.reshape(n_c, n_blocks, p)


@functools.partial(
    jax.jit,
    static_argnames=("n_v", "n_u", "f_v", "interpret", "precision"),
)
def warp_rows_bwd(d_out, y_t, x_t, vbase, n_v: int, n_u: int, *,
                  f_v: int, interpret: bool | None = None,
                  precision: str = "highest"):
    """Transpose of :func:`warp_rows_fwd`: (C, n_blocks, P) cotangent ->
    (C, V, U) lattice gradient (summed over overlapping footprints)."""
    if interpret is None:
        interpret = use_interpret()
    n_c, n_blocks, p = d_out.shape
    dtype = d_out.dtype
    prec = (jax.lax.Precision.HIGHEST if precision == "highest"
            else jax.lax.Precision.DEFAULT)
    y3 = y_t.reshape(n_blocks, 1, p)
    x3 = x_t.reshape(n_blocks, 1, p)
    d4 = d_out.reshape(n_c, n_blocks, 1, p)
    return pl.pallas_call(
        functools.partial(_warp_rows_bwd_kernel, f_v=f_v, precision=prec),
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, p), lambda k: (k, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, p), lambda k: (k, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_c, 1, 1, p), lambda k: (0, k, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((n_c, n_v, n_u), lambda k: (0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=out_struct((n_c, n_v, n_u), dtype, d_out, y_t),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(vbase, y3, x3, d4)
