"""Pallas kernels vs their XLA twins, in interpret mode (tiny shapes).

Full-size Pallas validation runs on real TPU (tpuvr/bench and the driver's
compile check); these tests only pin the kernel plumbing (block specs,
revisited output accumulation, SMEM scalar indexing, ERT state) to the
scan implementation on the CPU backend. Shapes are minimal because
Mosaic-interpret compiles cost minutes on this host.
"""

import jax.numpy as jnp
import numpy as np

from tpuvr.io.synth import smoke_sphere
from tpuvr.kernels.sweep import sweep_fwd
from tpuvr.kernels.sweep_bwd import sweep_bwd
from tpuvr.kernels.sweep_xla import sweep_bwd_xla, sweep_fwd_xla
from tpuvr.ops.geometry import plan_sweep, ray_dt, slice_coeffs
from tpuvr.ref.camera import dominant_axis, look_at_perspective
from tpuvr.ref.march import GRID_PERM

N = 8
RES = 8


def _setup():
    dtype = jnp.float32
    grid = smoke_sphere(N, dtype=dtype)
    c = (N - 1) / 2.0
    cam = look_at_perspective(
        (c, c - 3.0 * N, c + 0.5 * N), (c, c, c), res_x=RES, res_y=RES
    )
    axis = dominant_axis(cam)
    plan, _ = plan_sweep(cam, grid.shape, axis)
    grid_sc = jnp.transpose(
        jnp.transpose(grid, GRID_PERM[axis]), (0, 3, 1, 2)
    )
    coeffs = slice_coeffs(plan, dtype)
    dt_map = ray_dt(plan, dtype)
    enables = jnp.ones((plan.n_planes,), dtype)
    return grid_sc, coeffs, dt_map, enables, plan


def test_pallas_fwd_matches_xla_twin():
    grid_sc, coeffs, dt_map, enables, plan = _setup()
    kw = dict(reverse=plan.reverse, sigma_scale=1.0, early_stop_eps=1e-4)
    rgb_p, t_p = sweep_fwd(
        grid_sc, coeffs, enables, dt_map, interpret=True, **kw
    )
    rgb_x, t_x = sweep_fwd_xla(grid_sc, coeffs, enables, dt_map, **kw)
    np.testing.assert_allclose(rgb_p, rgb_x, atol=1e-6)
    np.testing.assert_allclose(t_p, t_x, atol=1e-6)


def test_pallas_bwd_matches_xla_twin():
    grid_sc, coeffs, dt_map, enables, plan = _setup()
    kw = dict(reverse=plan.reverse, sigma_scale=1.0, early_stop_eps=0.0)
    rgb, t = sweep_fwd_xla(grid_sc, coeffs, enables, dt_map, **kw)
    d_rgb = jnp.ones_like(rgb) * 0.7
    d_t = jnp.ones_like(t) * -0.3
    g_p = sweep_bwd(
        grid_sc, coeffs, enables, dt_map, rgb, t, d_rgb, d_t,
        interpret=True, **kw,
    )
    g_x = sweep_bwd_xla(
        grid_sc, coeffs, enables, dt_map, rgb, t, d_rgb, d_t, **kw
    )
    np.testing.assert_allclose(g_p, g_x, atol=1e-5)
