"""XLA (lax.scan) twin of the Pallas sweep kernels.

Identical math and control flow to ``sweep.py``/``sweep_bwd.py`` (same
interp matrices, same rectification, same ERT/occupancy semantics modeled
with masks instead of skipped compute), expressed as a scan over slices so
XLA compiles it on any backend:

- it is the portable fallback path (CPU/GPU, or TPU without Pallas);
- it is the CPU test surface for the sweep math (Mosaic-interpret compiles
  are minutes-slow on small hosts, SURVEY.md §4 fake-backend strategy);
- ``sweep_bwd_xla`` hand-implements the same suffix-trick gradient formulas
  as the Pallas backward, so the formulas themselves are validated on CPU
  against ``jax.grad`` of the forward scan and finite differences.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from tpuvr.kernels.sweep import _att_exp, _interp_matrices, sweep_dot


def _traversal(grid_sc, coeffs, enables, reverse):
    s = grid_sc.shape[0]
    order = jnp.arange(s - 1, -1, -1) if reverse else jnp.arange(s)
    slices = grid_sc[order]
    ay, by, ax, bx = coeffs
    return slices, ay, by, ax, bx, enables


def _resample(sl, ayk, byk, axk, bxk, n_v, n_u, dtype, precision):
    n_y, n_x = sl.shape[1], sl.shape[2]
    mat_a, mat_b = _interp_matrices(
        ayk, byk, axk, bxk, n_v, n_y, n_x, n_u, dtype
    )
    tmp = sweep_dot(mat_a, sl, precision, dtype,
                    dims=(((1,), (1,)), ((), ())))
    smp = sweep_dot(tmp, mat_b, precision, dtype,
                    dims=(((2,), (0,)), ((), ())))
    return smp, mat_a, mat_b


def _softplus_slice(sl):
    """softplus on the density channel of a (4, Y, X) slice (see
    tpuvr.kernels.sweep._softplus: the in-kernel density transform)."""
    sp = jnp.maximum(sl[:1], 0.0) + jnp.log(1.0 + jnp.exp(-jnp.abs(sl[:1])))
    return jnp.concatenate([sp, sl[1:]], axis=0)


@functools.partial(
    jax.jit,
    static_argnames=("reverse", "sigma_scale", "early_stop_eps",
                     "precision", "softplus"),
)
def sweep_fwd_xla(
    grid_sc, coeffs, enables, dt_map,
    *, reverse=False, sigma_scale=1.0, early_stop_eps=0.0,
    precision="highest", softplus=False,
):
    """Scan-based forward sweep. Returns (rgb (3, V, U), trans (V, U)).

    ``softplus``: the grid's density channel holds RAW parameters;
    apply softplus per slice before resampling (the fused-softplus
    training path — saves the materialized 268 MB softplus+layout pass
    per step at 256^3; see tpuvr.train.fit).
    """
    dtype = grid_sc.dtype
    n_v, n_u = dt_map.shape
    slices, ay, by, ax, bx, en = _traversal(
        grid_sc, coeffs, enables, reverse
    )

    def step(carry, inp):
        rgb, trans, tmax = carry
        sl, ayk, byk, axk, bxk, enk = inp
        if softplus:
            sl = _softplus_slice(sl)
        live = tmax >= early_stop_eps if early_stop_eps > 0.0 else True
        go = jnp.logical_and(enk > 0, live)
        smp, _, _ = _resample(sl, ayk, byk, axk, bxk, n_v, n_u, dtype,
                              precision)
        sigma = jnp.maximum(smp[:, 0, :], 0.0)
        att = _att_exp((sigma_scale * sigma) * dt_map, precision)
        att = jnp.where(go, att, 1.0)
        w = trans * (1.0 - att)
        rgb = rgb + w[None] * jnp.moveaxis(smp[:, 1:4, :], 1, 0)
        trans = trans * att
        if early_stop_eps > 0.0:
            tmax = jnp.where(go, jnp.max(trans), tmax)
        return (rgb, trans, tmax), None

    # Derive carry inits from the inputs so they inherit every mesh axis'
    # device-varying annotation under shard_map (dt_map varies over 'data'
    # row tiles, coeffs over 'z' slabs); a fresh jnp.zeros would be
    # unvarying and fail scan's carry type check.
    poison = 0.0 * (jnp.max(dt_map) + jnp.max(ay))
    zero = jnp.zeros((3, n_v, n_u), dtype) + poison
    one = jnp.ones((n_v, n_u), dtype) + poison
    init = (zero, one, jnp.asarray(1.0, dtype) + poison)
    (rgb, trans, _), _ = jax.lax.scan(
        step, init, (slices, ay, by, ax, bx, en)
    )
    return rgb, trans


@functools.partial(
    jax.jit,
    static_argnames=("reverse", "sigma_scale", "early_stop_eps",
                     "precision", "softplus"),
)
def sweep_bwd_xla(
    grid_sc, coeffs, enables, dt_map, c_final, t_final, d_color, d_trans,
    *, reverse=False, sigma_scale=1.0, early_stop_eps=0.0,
    precision="highest", softplus=False, carry=None,
):
    """Scan-based backward sweep (same formulas as the Pallas kernel).

    Returns the (S, 4, Y, X) grid gradient.

    ``carry``: optional (trans0, q0) recompute state entering this call
    (slab-chunked backwards, exactly as in
    :func:`tpuvr.kernels.sweep_bwd.sweep_bwd`); returns
    ``(grad, (trans_fin, q_fin))`` when given. The state matches the
    Pallas kernels': q is the channel-CONTRACTED color prefix
    ``sum_c dC_c * prefix_c`` and the constant suffix terms fold into
    ``dbias = sum_c dC_c C_final_c + dT T_final``.
    """
    dtype = grid_sc.dtype
    n_v, n_u = dt_map.shape
    slices, ay, by, ax, bx, en = _traversal(
        grid_sc, coeffs, enables, reverse
    )
    dbias = (jnp.einsum("cvu,cvu->vu", d_color, c_final)
             + d_trans * t_final)

    def step(state, inp):
        trans, q, tmax = state
        sl_raw, ayk, byk, axk, bxk, enk = inp
        sl = _softplus_slice(sl_raw) if softplus else sl_raw
        live = tmax >= early_stop_eps if early_stop_eps > 0.0 else True
        go = jnp.logical_and(enk > 0, live)
        smp, mat_a, mat_b = _resample(
            sl, ayk, byk, axk, bxk, n_v, n_u, dtype, precision
        )
        sig_raw = smp[:, 0, :]
        sigma = jnp.maximum(sig_raw, 0.0)
        att = _att_exp((sigma_scale * sigma) * dt_map, precision)
        att = jnp.where(go, att, 1.0)
        w = trans * (1.0 - att)

        dsig = -dbias
        dsmp_c = []
        for c in range(3):
            q = q + (d_color[c] * w) * smp[:, c + 1, :]
            dsig = dsig + d_color[c] * (trans * att) * smp[:, c + 1, :]
            dsmp_c.append(d_color[c] * w)
        dsig = (dsig + q) * (sigma_scale * dt_map)
        dsig = jnp.where(sig_raw > 0.0, dsig, 0.0)
        dsmp = jnp.stack([dsig] + dsmp_c, axis=1)  # (V, 4, U)
        tmp2 = sweep_dot(
            mat_a, dsmp, precision, dtype,
            dims=(((0,), (0,)), ((), ())),
        )  # (Y, 4, U)
        grad = sweep_dot(
            tmp2, mat_b, precision, dtype,
            dims=(((2,), (1,)), ((), ())),
        )  # (Y, 4, X)
        grad = jnp.where(go, jnp.transpose(grad, (1, 0, 2)), 0.0)
        if softplus:
            # Chain to the raw density parameters: d softplus = sigmoid.
            sig = 1.0 / (1.0 + jnp.exp(-sl_raw[0]))
            grad = jnp.concatenate([grad[:1] * sig[None], grad[1:]], 0)

        trans = trans * att
        if early_stop_eps > 0.0:
            tmax = jnp.where(go, jnp.max(trans), tmax)
        return (trans, q, tmax), grad

    # See sweep_fwd_xla: inits inherit all varying mesh axes.
    poison = 0.0 * (jnp.max(dt_map) + jnp.max(ay) + jnp.max(c_final))
    if carry is None:
        trans0 = jnp.ones((n_v, n_u), dtype) + poison
        q0 = jnp.zeros((n_v, n_u), dtype) + poison
    else:
        trans0, q0 = (carry[0] + poison, carry[1] + poison)
    init = (trans0, q0, jnp.max(trans0))
    (trans_fin, q_fin, _), grads = jax.lax.scan(
        step, init, (slices, ay, by, ax, bx, en)
    )
    # grads are in traversal order; restore grid slice order.
    if reverse:
        grads = grads[::-1]
    if carry is None:
        return grads
    return grads, (trans_fin, q_fin)
