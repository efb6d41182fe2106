"""Gradient correctness (C8; SURVEY.md §4 gradcheck tier).

Three independent checks of the custom-VJP backward (suffix-trick
recompute):
  1. against jax.grad of the forward scan (same discretization, f64);
  2. against jax.grad of the pure-jnp oracle marcher on the same rays
     (different *implementation* of the same math: gather vs matmul);
  3. against central finite differences on individual voxels.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpuvr.config import RenderConfig
from tpuvr.io.synth import smoke_sphere
from tpuvr.kernels.sweep_xla import sweep_fwd_xla
from tpuvr.ops.geometry import (
    intermediate_rays,
    plan_sweep,
    ray_dt,
    slice_coeffs,
)
from tpuvr.ops.render import render_view
from tpuvr.ops.vjp import sweep_op
from tpuvr.ref.camera import dominant_axis, look_at_perspective
from tpuvr.ref.march import GRID_PERM, render_plane_sweep

N = 10
RES = 12


def _setup(dtype=jnp.float64, eps=0.0):
    grid = smoke_sphere(N, dtype=dtype)
    c = (N - 1) / 2.0
    cam = look_at_perspective(
        (c, c - 3.0 * N, c + 0.7 * N), (c, c, c), res_x=RES, res_y=RES
    )
    axis = dominant_axis(cam)
    plan, _ = plan_sweep(cam, grid.shape, axis)
    grid_p = jnp.transpose(grid, GRID_PERM[axis])
    grid_sc = jnp.transpose(grid_p, (0, 3, 1, 2))
    coeffs = slice_coeffs(plan, dtype)
    dt_map = ray_dt(plan, dtype)
    enables = jnp.ones((plan.n_planes,), dtype)
    return grid, grid_p, grid_sc, coeffs, dt_map, enables, plan


def _loss_weights(shape, dtype):
    key = jax.random.PRNGKey(7)
    return jax.random.normal(key, shape, dtype=dtype)


def test_custom_vjp_matches_autodiff_of_scan():
    _, _, grid_sc, coeffs, dt_map, enables, plan = _setup()
    w_rgb = _loss_weights((3, plan.n_v, plan.n_u), jnp.float64)
    w_t = _loss_weights((plan.n_v, plan.n_u), jnp.float64)

    def loss_auto(g):
        rgb, t = sweep_fwd_xla(
            g, coeffs, enables, dt_map, reverse=plan.reverse
        )
        return jnp.sum(rgb * w_rgb) + jnp.sum(t * w_t)

    op = sweep_op(plan.reverse, 1.0, 0.0, "xla")

    def loss_custom(g):
        rgb, t = op(g, coeffs, enables, dt_map)
        return jnp.sum(rgb * w_rgb) + jnp.sum(t * w_t)

    g_auto = jax.grad(loss_auto)(grid_sc)
    g_custom = jax.grad(loss_custom)(grid_sc)
    np.testing.assert_allclose(g_custom, g_auto, rtol=1e-9, atol=1e-11)


def test_custom_vjp_matches_oracle_grad():
    grid, grid_p, grid_sc, coeffs, dt_map, enables, plan = _setup()
    o, d = intermediate_rays(plan, dtype=jnp.float64)
    w_rgb = _loss_weights((plan.n_v, plan.n_u, 3), jnp.float64)

    def loss_oracle(gp):
        rgb, _ = render_plane_sweep(gp, o, d, axis=2)
        return jnp.sum(rgb * w_rgb)

    op = sweep_op(plan.reverse, 1.0, 0.0, "xla")

    def loss_custom(gsc):
        rgb, _ = op(gsc, coeffs, enables, dt_map)
        return jnp.sum(jnp.moveaxis(rgb, 0, -1) * w_rgb)

    g_oracle = jax.grad(loss_oracle)(grid_p)          # (S, Y, X, 4)
    g_custom = jax.grad(loss_custom)(grid_sc)         # (S, 4, Y, X)
    np.testing.assert_allclose(
        jnp.transpose(g_custom, (0, 2, 3, 1)), g_oracle,
        rtol=1e-8, atol=1e-10,
    )


def test_grad_vs_finite_differences():
    _, _, grid_sc, coeffs, dt_map, enables, plan = _setup()
    w_rgb = _loss_weights((3, plan.n_v, plan.n_u), jnp.float64)
    op = sweep_op(plan.reverse, 1.0, 0.0, "xla")

    def loss(g):
        rgb, t = op(g, coeffs, enables, dt_map)
        return jnp.sum(rgb * w_rgb) + jnp.sum(t)

    g = jax.grad(loss)(grid_sc)
    rng = np.random.default_rng(0)
    h = 1e-5
    for _ in range(12):
        idx = tuple(rng.integers(0, s) for s in grid_sc.shape)
        gp = grid_sc.at[idx].add(h)
        gm = grid_sc.at[idx].add(-h)
        fd = (loss(gp) - loss(gm)) / (2 * h)
        np.testing.assert_allclose(
            float(g[idx]), float(fd), rtol=1e-5, atol=1e-7
        )


def test_render_view_end_to_end_grad_fd():
    # Includes the final warp and the occupancy/ERT plumbing.
    grid = smoke_sphere(N, dtype=jnp.float64)
    c = (N - 1) / 2.0
    cam = look_at_perspective(
        (c + 2.2 * N, c + 0.9 * N, c - 1.1 * N), (c, c, c),
        res_x=RES, res_y=RES,
    )
    cfg = RenderConfig(early_stop_eps=0.0)

    def loss(g):
        rgb, t = render_view(g, cam, cfg)
        return jnp.sum(rgb**2) + jnp.sum(t)

    g = jax.grad(loss)(grid)
    rng = np.random.default_rng(1)
    h = 1e-5
    checked = 0
    for _ in range(20):
        idx = tuple(rng.integers(0, s) for s in grid.shape)
        base = abs(float(g[idx]))
        gp = grid.at[idx].add(h)
        gm = grid.at[idx].add(-h)
        fd = (loss(gp) - loss(gm)) / (2 * h)
        np.testing.assert_allclose(
            float(g[idx]), float(fd), rtol=2e-5, atol=1e-7
        )
        checked += 1 if base > 1e-7 else 0
    assert checked >= 5  # ensure we exercised non-trivial gradients


def test_ert_gradients_follow_forward_truncation():
    # With ERT on, gradients must correspond to the truncated forward (the
    # suffix trick must use the *same* stopping point).
    _, _, grid_sc, coeffs, dt_map, enables, plan = _setup()
    grid_sc = grid_sc.at[:, 0].mul(40.0)  # thick medium => ERT fires
    eps = 1e-3
    op = sweep_op(plan.reverse, 1.0, eps, "xla")
    w_rgb = _loss_weights((3, plan.n_v, plan.n_u), jnp.float64)

    def loss(g):
        rgb, t = op(g, coeffs, enables, dt_map)
        return jnp.sum(rgb * w_rgb) + jnp.sum(t)

    def loss_scan(g):
        rgb, t = sweep_fwd_xla(
            g, coeffs, enables, dt_map,
            reverse=plan.reverse, early_stop_eps=eps,
        )
        return jnp.sum(rgb * w_rgb) + jnp.sum(t)

    g_custom = jax.grad(loss)(grid_sc)
    g_auto = jax.grad(loss_scan)(grid_sc)
    np.testing.assert_allclose(g_custom, g_auto, rtol=1e-9, atol=1e-11)
