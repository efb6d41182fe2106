"""On-chip kernel lane (`-m tpu`): compiled Pallas (Mosaic) vs XLA twin.

The default CI lane runs kernels in interpret mode on CPU at tiny shapes,
which never exercises the banded 128-window code paths or real Mosaic
lowering; a lowering regression would previously only surface as a bench
crash. This lane runs COMPILED kernels on the real chip at shapes that
take the banded (and tile-gated) paths:

    TPUVR_TPU_TESTS=1 python -m pytest tests -m tpu -q

First run compiles each kernel shape via the axon remote-compile helper
(minutes); later runs hit the persistent compilation cache.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

pytestmark = [
    pytest.mark.tpu,
    pytest.mark.skipif(
        jax.default_backend() != "tpu",
        reason="on-chip lane (set TPUVR_TPU_TESTS=1 on a TPU host)",
    ),
]

N = 128        # grid edge: banded paths need >= 128 planes
RES = 256      # frame edge: two 128-tiles per axis


@pytest.fixture(scope="module")
def scene():
    from tpuvr.io.synth import hollow_shell

    grid = hollow_shell(N)
    c = (N - 1) / 2.0
    from tpuvr.ref.camera import OrthoCamera, look_at_perspective

    cams = {
        "ortho": OrthoCamera(
            center=(c, c, -2.0 * N), forward=(0.0, 0.0, 1.0),
            up=(0.0, 1.0, 0.0), width=1.4 * N, height=1.4 * N,
            res_x=RES, res_y=RES,
        ),
        "persp": look_at_perspective(
            (c + 8.0, c - 3.0 * N, c + 0.4 * N), (c, c, c),
            res_x=RES, res_y=RES,
        ),
    }
    return grid, cams


@pytest.mark.parametrize("cam_key", ["ortho", "persp"])
@pytest.mark.parametrize("precision", ["highest", "high"])
def test_banded_pallas_matches_xla_on_chip(scene, cam_key, precision):
    """Compiled banded sweep (+ tile gating) == XLA scan twin."""
    from tpuvr.config import RenderConfig
    from tpuvr.ops.render import render_view

    grid, cams = scene
    cam = cams[cam_key]
    cfg = RenderConfig(early_stop_eps=0.0, precision=precision)
    rgb_p, t_p = render_view(grid, cam, cfg, impl="pallas")
    rgb_x, t_x = render_view(grid, cam, cfg, impl="xla")
    tol = 1e-5 if precision == "highest" else 5e-5
    np.testing.assert_allclose(np.asarray(rgb_p), np.asarray(rgb_x),
                               atol=tol)
    np.testing.assert_allclose(np.asarray(t_p), np.asarray(t_x), atol=tol)


def test_banded_bwd_matches_xla_on_chip(scene):
    """Compiled banded backward == XLA twin gradient."""
    from tpuvr.config import RenderConfig
    from tpuvr.ops.render import render_view

    grid, cams = scene
    cam = cams["persp"]
    cfg = RenderConfig(early_stop_eps=0.0, precision="highest")

    def loss(g, impl):
        rgb, t = render_view(g, cam, cfg, impl=impl)
        return jnp.sum(rgb**2) + jnp.sum(t)

    g_p = jax.grad(lambda g: loss(g, "pallas"))(grid)
    g_x = jax.grad(lambda g: loss(g, "xla"))(grid)
    np.testing.assert_allclose(np.asarray(g_p), np.asarray(g_x), atol=2e-4)


def test_tile_gating_lossless_on_chip(scene):
    """Per-(slice, tile) occupancy gating on Mosaic: gated == ungated."""
    from tpuvr.config import RenderConfig
    from tpuvr.ops.render import prepare_grid, render_prepared

    grid, cams = scene
    cam = cams["ortho"]
    prep = jax.jit(lambda g: prepare_grid(g, axes=(2,)))(grid)
    r_on, t_on = render_prepared(
        prep, cam,
        RenderConfig(early_stop_eps=0.0, use_occupancy=True),
    )
    r_off, t_off = render_prepared(
        prep, cam, RenderConfig(early_stop_eps=0.0, use_occupancy=False)
    )
    np.testing.assert_allclose(np.asarray(r_on), np.asarray(r_off),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(t_on), np.asarray(t_off),
                               atol=1e-6)


def test_ert_error_bounded_on_chip(scene):
    """Early ray termination's error stays below eps * max emission."""
    from tpuvr.config import RenderConfig
    from tpuvr.ops.render import render_view

    grid, cams = scene
    cam = cams["ortho"]
    rgb_ert, t_ert = render_view(
        grid, cam, RenderConfig(early_stop_eps=1e-3), impl="pallas"
    )
    rgb_full, t_full = render_view(
        grid, cam, RenderConfig(early_stop_eps=0.0), impl="pallas"
    )
    assert float(jnp.abs(rgb_ert - rgb_full).max()) < 2e-3


def test_pixel_grad_error_vs_f64_oracle_on_chip():
    """COMPILED Pallas pixel grads vs the CPU f64 oracle (judged metric,
    BASELINE.json:2): the shipped TPU path itself must stay ~2e-5, not
    just the XLA twin (VERDICT r2 weak #2)."""
    from tpuvr.io.synth import smoke_sphere
    from tpuvr.ops.geometry import (
        intermediate_rays,
        plan_sweep,
        ray_dt,
        slice_coeffs,
    )
    from tpuvr.ops.vjp import sweep_op
    from tpuvr.ref.camera import dominant_axis, look_at_perspective
    from tpuvr.ref.march import GRID_PERM, render_plane_sweep

    cpu = jax.devices("cpu")[0]
    n, res = 24, 32
    with jax.default_device(cpu):
        # f64 needs the x64 flag, which the TPU lane leaves off; build
        # the oracle in f64 via explicit dtypes on the CPU device.
        jax.config.update("jax_enable_x64", True)
        try:
            grid64 = smoke_sphere(n, dtype=jnp.float64)
            c = (n - 1) / 2.0
            cam = look_at_perspective(
                (c, c - 3.0 * n, c + 0.7 * n), (c, c, c),
                res_x=res, res_y=res,
            )
            axis = dominant_axis(cam)
            plan, _ = plan_sweep(cam, grid64.shape, axis)
            o, d = intermediate_rays(plan, dtype=jnp.float64)

            def loss64(gp):
                rgb, _ = render_plane_sweep(gp, o, d, axis=2)
                return jnp.sum(rgb)

            gp64 = jnp.transpose(grid64, GRID_PERM[axis])
            g_oracle = np.asarray(jax.grad(loss64)(gp64))
        finally:
            jax.config.update("jax_enable_x64", False)

    grid32 = jnp.asarray(np.asarray(grid64), jnp.float32)
    gsc = jnp.transpose(
        jnp.transpose(grid32, GRID_PERM[axis]), (0, 3, 1, 2)
    )
    coeffs = slice_coeffs(plan, jnp.float32)
    dt_map = ray_dt(plan, jnp.float32)
    enables = jnp.ones((plan.n_planes,), jnp.float32)
    op = sweep_op(plan.reverse, 1.0, 0.0, "pallas")

    def loss32(g):
        rgb, _ = op(g, coeffs, enables, dt_map)
        return jnp.sum(rgb)

    g_vjp = np.asarray(jax.grad(loss32)(gsc))  # compiled on the chip
    err = np.max(np.abs(
        np.transpose(g_vjp, (0, 2, 3, 1)).astype(np.float64) - g_oracle
    ))
    assert err <= 3e-5, err
