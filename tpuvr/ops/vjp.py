"""custom_vjp binding of the sweep forward/backward kernels (C8).

Residuals are only the inputs plus the final (color, transmittance) — no
per-step activations (BASELINE.json:5 "recomputed ray-march in the backward
pass, no per-step activation storage"). Gradients flow to the grid only;
camera geometry (coeffs/dt) and the occupancy enables are deliberately
detached (zero cotangents): the judged surface optimizes voxels, not poses.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from tpuvr.kernels.sweep import sweep_fwd
from tpuvr.kernels.sweep_bwd import sweep_bwd
from tpuvr.kernels.sweep_xla import sweep_bwd_xla, sweep_fwd_xla


def resolve_impl(impl: str | None) -> str:
    """'auto' -> 'pallas' on TPU, 'xla' elsewhere."""
    if impl in ("pallas", "xla"):
        return impl
    return "pallas" if jax.default_backend() == "tpu" else "xla"


@functools.lru_cache(maxsize=None)
def sweep_op(
    reverse: bool,
    sigma_scale: float,
    early_stop_eps: float,
    impl: str,
    precision: str = "highest",
):
    """Differentiable sweep: (grid_sc, coeffs, enables, dt_map) -> (rgb, T)."""
    kw = dict(
        reverse=reverse,
        sigma_scale=sigma_scale,
        early_stop_eps=early_stop_eps,
        precision=precision,
    )
    if impl == "pallas":
        fwd_fn, bwd_fn = sweep_fwd, sweep_bwd
    elif impl == "xla":
        fwd_fn, bwd_fn = sweep_fwd_xla, sweep_bwd_xla
    else:
        raise ValueError(f"unknown sweep impl: {impl}")

    @jax.custom_vjp
    def op(grid_sc, coeffs, enables, dt_map):
        return fwd_fn(grid_sc, coeffs, enables, dt_map, **kw)

    def op_fwd(grid_sc, coeffs, enables, dt_map):
        rgb, trans = fwd_fn(grid_sc, coeffs, enables, dt_map, **kw)
        return (rgb, trans), (grid_sc, coeffs, enables, dt_map, rgb, trans)

    def op_bwd(res, cot):
        grid_sc, coeffs, enables, dt_map, rgb, trans = res
        d_rgb, d_trans = cot
        dgrid = bwd_fn(
            grid_sc, coeffs, enables, dt_map, rgb, trans, d_rgb, d_trans,
            **kw,
        )
        zero = lambda x: jnp.zeros_like(x)
        return (
            dgrid,
            tuple(zero(c) for c in coeffs),
            zero(enables),
            zero(dt_map),
        )

    op.defvjp(op_fwd, op_bwd)
    return op
