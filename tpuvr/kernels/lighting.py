"""Pallas directional-tau sweep for the single-scatter light volume (C4).

The reference's lighting pass is a per-sample secondary OpenCL march
(reconstructed ``kernels/*.cl`` lighting kernel, SURVEY.md §2.1). The
TPU-native light volume (tpuvr/ops/lighting.py) instead sweeps optical
depth from the sky side inward, one fractional-translation resample per
slice:

  tau_k = shift_D(tau_{k+1} + dt * relu(sigma_{k+1})),  D = (wx, wy)/|wz|

This kernel is that recurrence as a Pallas slice sweep — the grid walks
planes from the sky inward (sequential on TPU), tau lives in VMEM scratch,
the shift is the same two banded interp matmuls as the render sweep, and
each plane's tau is written out exactly once. It is the lighting twin of
``tpuvr/kernels/sweep.py`` and matches the XLA ``lax.scan`` formulation in
``tpuvr.ops.lighting._directional_tau`` bit-for-bit in spirit (f32
roundoff in practice).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpuvr.kernels._compat import out_struct, use_interpret
from tpuvr.kernels.sweep import _interp_matrices, sweep_dot


def _tau_sweep_kernel(
    sig_ref,    # (1, Y, X) density plane k_sky = S-1-step (sky side first)
    tau_ref,    # out (1, Y, X): tau at plane S-2-step (below the consumed
                # plane); the sky-side plane's zero tau is added outside
    acc_ref,    # scratch (Y, X): running tau
    *,
    d_y: float,
    d_x: float,
    dt: float,
    precision: str,
):
    step = pl.program_id(0)
    n_y, n_x = acc_ref.shape
    dtype = acc_ref.dtype

    @pl.when(step == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    mat_a, mat_b = _interp_matrices(
        jnp.asarray(1.0, dtype), jnp.asarray(d_y, dtype),
        jnp.asarray(1.0, dtype), jnp.asarray(d_x, dtype),
        n_y, n_y, n_x, n_x, dtype,
    )
    f = acc_ref[...] + dt * jnp.maximum(sig_ref[0], 0.0)
    tmp = sweep_dot(mat_a, f, precision, dtype)
    tau = sweep_dot(tmp, mat_b, precision, dtype)
    acc_ref[...] = tau
    tau_ref[0] = tau


def _tau_adj_kernel(
    g_ref,      # (1, Y, X) cotangent dL/dtau at plane k = step (ascending)
    ds_ref,     # out (1, Y, X): dL/d(relu(sigma)) at plane k
    acc_ref,    # scratch (Y, X): accumulated tau cotangent A_{k-1}
    *,
    d_y: float,
    d_x: float,
    dt: float,
    precision: str,
):
    """Adjoint of the tau recurrence.

    Forward: tau_k = M(tau_{k+1} + dt * s_{k+1}) with s = relu(sigma) and
    M the fractional (d_y, d_x) shift. The transpose of a unit-slope
    translation band matrix is the translation by the negated offset, so
    with A_k = dL/dtau_k accumulated from below:

      h    = M^T A_{k-1}   (shift by (-d_y, -d_x))
      ds_k = dt * h        (zero at k = 0: nothing is below plane 0)
      A_k  = g_k + h

    One plane per sequential grid step, ascending — the mirror image of
    ``_tau_sweep_kernel``'s descending sweep.
    """
    step = pl.program_id(0)
    n_y, n_x = acc_ref.shape
    dtype = acc_ref.dtype

    @pl.when(step == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    mat_a, mat_b = _interp_matrices(
        jnp.asarray(1.0, dtype), jnp.asarray(-d_y, dtype),
        jnp.asarray(1.0, dtype), jnp.asarray(-d_x, dtype),
        n_y, n_y, n_x, n_x, dtype,
    )
    tmp = sweep_dot(mat_a, acc_ref[...], precision, dtype)
    h = sweep_dot(tmp, mat_b, precision, dtype)
    ds_ref[0] = dt * h
    acc_ref[...] = g_ref[0] + h


@functools.partial(
    jax.jit,
    static_argnames=("d_y", "d_x", "dt", "precision", "interpret"),
)
def tau_sweep_adj(
    g,          # (S, Y, X) cotangent on the tau field, plane-ascending
    *,
    d_y: float,
    d_x: float,
    dt: float,
    precision: str = "highest",
    interpret: bool | None = None,
):
    """dL/d(relu(sigma)) for every plane, given dL/dtau (see adjoint
    kernel docstring). Returns (S, Y, X); the caller applies the relu
    mask to get dL/dsigma."""
    if interpret is None:
        interpret = use_interpret()
    s, n_y, n_x = g.shape
    dtype = g.dtype
    kernel = functools.partial(
        _tau_adj_kernel,
        d_y=float(d_y), d_x=float(d_x), dt=float(dt), precision=precision,
    )
    return pl.pallas_call(
        kernel,
        grid=(s,),
        in_specs=[
            pl.BlockSpec((1, n_y, n_x), lambda k: (k, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, n_y, n_x), lambda k: (k, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=out_struct((s, n_y, n_x), dtype, g),
        scratch_shapes=[pltpu.VMEM((n_y, n_x), dtype)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(g)


@functools.partial(
    jax.jit,
    static_argnames=("d_y", "d_x", "dt", "precision", "interpret"),
)
def tau_sweep(
    sig_p,      # (S, Y, X) density, plane index ascending TOWARD the sky
    *,
    d_y: float,
    d_x: float,
    dt: float,
    precision: str = "highest",
    interpret: bool | None = None,
):
    """Optical depth to the sky for every voxel of a permuted field.

    Returns (S, Y, X) tau with tau[S-1] = 0 (sky-side plane sees vacuum)
    and tau[k] accumulated from planes k+1..S-1 with the per-slice
    fractional shift (d_y, d_x).
    """
    if interpret is None:
        interpret = use_interpret()
    s, n_y, n_x = sig_p.shape
    dtype = sig_p.dtype
    kernel = functools.partial(
        _tau_sweep_kernel,
        d_y=float(d_y), d_x=float(d_x), dt=float(dt), precision=precision,
    )
    taus = pl.pallas_call(
        kernel,
        grid=(s - 1,),
        in_specs=[
            # Consume density planes S-1, S-2, ..., 1 (sky side first).
            pl.BlockSpec((1, n_y, n_x), lambda k: (s - 1 - k, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        # Step k produces tau at plane S-2-k.
        out_specs=pl.BlockSpec((1, n_y, n_x), lambda k: (s - 2 - k, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=out_struct((s - 1, n_y, n_x), dtype, sig_p),
        scratch_shapes=[pltpu.VMEM((n_y, n_x), dtype)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(sig_p)
    return jnp.concatenate(
        [taus, jnp.zeros((1, n_y, n_x), dtype)], axis=0
    )
