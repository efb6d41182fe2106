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


def test_banded_kernel_matches_dense():
    """The banded forward kernel (128-tile band windows) must match the
    dense kernel to f32 summation-order tolerance, across slope signs,
    traversal direction, ERT, and window clamping at both grid edges."""
    import numpy as np

    from tpuvr.kernels.sweep import band_ok, sweep_fwd

    rng = np.random.default_rng(7)
    s, n_y, n_x = 6, 144, 160
    n_v = n_u = 128
    grid_sc = jnp.asarray(
        rng.random((s, 4, n_y, n_x), dtype=np.float32) * 0.5
    )
    for ay0, ax0, reverse, eps in [
        (0.9, 0.6, False, 0.0),
        (-0.7, 0.8, True, 0.0),
        (0.5, -0.5, False, 1e-2),
    ]:
        ay = jnp.full((s,), ay0, jnp.float32)
        ax = jnp.full((s,), ax0, jnp.float32)
        # Intercepts walk the band across (and past) both grid edges so
        # the clamped-window paths are exercised.
        by = jnp.linspace(-20.0, n_y + 20.0 - abs(ay0) * n_v, s,
                          dtype=jnp.float32)
        bx = jnp.linspace(n_x + 10.0 - abs(ax0) * n_u, -10.0, s,
                          dtype=jnp.float32)
        enables = jnp.asarray([1.0, 1.0, 0.0, 1.0, 1.0, 1.0], jnp.float32)
        dt = jnp.full((n_v, n_u), 0.8, jnp.float32)
        band = (abs(ay0), abs(ax0))
        assert band_ok(band, n_v, n_u, n_y, n_x)
        kw = dict(reverse=reverse, sigma_scale=1.3, early_stop_eps=eps,
                  precision="highest")
        rgb_b, t_b = sweep_fwd(grid_sc, (ay, by, ax, bx), enables, dt,
                               band=band, **kw)
        rgb_d, t_d = sweep_fwd(grid_sc, (ay, by, ax, bx), enables, dt,
                               **kw)
        np.testing.assert_allclose(rgb_b, rgb_d, atol=1e-5,
                                   err_msg=f"{ay0},{ax0},{reverse},{eps}")
        np.testing.assert_allclose(t_b, t_d, atol=1e-5)


def test_banded_bwd_matches_dense():
    """Banded backward (banded recompute + dense projection) vs the
    dense backward kernel, same cases as the forward test."""
    import numpy as np

    from tpuvr.kernels.sweep import band_ok, sweep_fwd
    from tpuvr.kernels.sweep_bwd import sweep_bwd

    rng = np.random.default_rng(11)
    s, n_y, n_x = 6, 144, 160
    n_v = n_u = 128
    grid_sc = jnp.asarray(
        rng.random((s, 4, n_y, n_x), dtype=np.float32) * 0.5
    )
    d_color = jnp.asarray(rng.random((3, n_v, n_u), dtype=np.float32))
    d_trans = jnp.asarray(rng.random((n_v, n_u), dtype=np.float32))
    for ay0, ax0, reverse, eps in [
        (0.9, 0.6, False, 0.0),
        (-0.7, 0.8, True, 0.0),
        (0.5, -0.5, False, 1e-2),
    ]:
        ay = jnp.full((s,), ay0, jnp.float32)
        ax = jnp.full((s,), ax0, jnp.float32)
        by = jnp.linspace(-20.0, n_y + 20.0 - abs(ay0) * n_v, s,
                          dtype=jnp.float32)
        bx = jnp.linspace(n_x + 10.0 - abs(ax0) * n_u, -10.0, s,
                          dtype=jnp.float32)
        enables = jnp.asarray([1.0, 1.0, 0.0, 1.0, 1.0, 1.0], jnp.float32)
        dt = jnp.full((n_v, n_u), 0.8, jnp.float32)
        band = (abs(ay0), abs(ax0))
        assert band_ok(band, n_v, n_u, n_y, n_x)
        kw = dict(reverse=reverse, sigma_scale=1.3, early_stop_eps=eps,
                  precision="highest")
        c_fin, t_fin = sweep_fwd(grid_sc, (ay, by, ax, bx), enables, dt,
                                 **kw)
        args = (grid_sc, (ay, by, ax, bx), enables, dt, c_fin, t_fin,
                d_color, d_trans)
        g_b = sweep_bwd(*args, band=band, **kw)
        g_d = sweep_bwd(*args, **kw)
        np.testing.assert_allclose(g_b, g_d, atol=2e-5,
                                   err_msg=f"{ay0},{ax0},{reverse},{eps}")


def test_banded_steep_slopes_match_dense():
    """Adaptive sub-128 output tiles (slopes > ~0.93 — the perspective
    orbit regime) must match the dense kernels in BOTH directions.

    Regression test for the silent-clamp bug: sweep_bwd used to leave
    the banded kernel at the 128-tile default regardless of slope, so
    a slope-1.1..3.5 band's taps fell outside the 128-wide window and
    were zeroed — corrupting recomputed values and grid gradients."""
    import numpy as np

    from tpuvr.kernels.sweep import band_tiles, sweep_fwd
    from tpuvr.kernels.sweep_bwd import sweep_bwd

    rng = np.random.default_rng(17)
    s, n_y, n_x = 4, 160, 160
    n_v = n_u = 128
    grid_sc = jnp.asarray(
        rng.random((s, 4, n_y, n_x), dtype=np.float32) * 0.5
    )
    d_color = jnp.asarray(rng.random((3, n_v, n_u), dtype=np.float32))
    d_trans = jnp.asarray(rng.random((n_v, n_u), dtype=np.float32))
    # Slopes past the 64-tile ceiling (~1.87) now return None (the
    # 32-tile tier measured 2.4x slower than dense and was removed).
    from tpuvr.kernels.sweep import band_tiles as _bt
    assert _bt((3.5, 0.5, 3.5, 0.5), 128, 128, 160, 160) is None
    for ay0, ax0, want_tiles in [
        (1.1, 1.1, (64, 64)),      # just past the 128-tile limit
        (-1.7, 0.9, (64, 128)),    # near the 64-tile ceiling, mixed
        (0.6, -1.5, (128, 64)),
    ]:
        ay = jnp.full((s,), ay0, jnp.float32)
        ax = jnp.full((s,), ax0, jnp.float32)
        # Center the (wide) bands so a good share of taps are in-grid.
        by = jnp.linspace(
            n_y / 2.0 - ay0 * n_v / 2.0 - 8.0,
            n_y / 2.0 - ay0 * n_v / 2.0 + 8.0, s, dtype=jnp.float32)
        bx = jnp.linspace(
            n_x / 2.0 - ax0 * n_u / 2.0 + 6.0,
            n_x / 2.0 - ax0 * n_u / 2.0 - 6.0, s, dtype=jnp.float32)
        enables = jnp.ones((s,), jnp.float32)
        dt = jnp.full((n_v, n_u), 0.8, jnp.float32)
        band = (abs(ay0), abs(ax0), abs(ay0), abs(ax0))
        assert band_tiles(band, n_v, n_u, n_y, n_x) == want_tiles
        kw = dict(reverse=ay0 < 0, sigma_scale=1.3, early_stop_eps=0.0,
                  precision="highest")
        rgb_b, t_b = sweep_fwd(grid_sc, (ay, by, ax, bx), enables, dt,
                               band=band, **kw)
        rgb_d, t_d = sweep_fwd(grid_sc, (ay, by, ax, bx), enables, dt,
                               **kw)
        np.testing.assert_allclose(rgb_b, rgb_d, atol=1e-5,
                                   err_msg=f"fwd {ay0},{ax0}")
        np.testing.assert_allclose(t_b, t_d, atol=1e-5)
        args = (grid_sc, (ay, by, ax, bx), enables, dt, rgb_d, t_d,
                d_color, d_trans)
        g_b = sweep_bwd(*args, band=band, **kw)
        g_d = sweep_bwd(*args, **kw)
        np.testing.assert_allclose(g_b, g_d, atol=2e-5,
                                   err_msg=f"bwd {ay0},{ax0}")


def test_banded_bwd_windowed_uside():
    """A shape where the banded gradient projection's u-window is
    genuinely narrower than U (w_u < n_u), vs the dense backward."""
    import numpy as np

    from tpuvr.kernels.sweep import sweep_fwd
    from tpuvr.kernels.sweep_bwd import sweep_bwd

    rng = np.random.default_rng(13)
    s, n_y, n_x = 4, 232, 256  # X tiled by 128 -> windowed u-side active
    n_v = n_u = 256
    grid_sc = jnp.asarray(
        rng.random((s, 4, n_y, n_x), dtype=np.float32) * 0.5
    )
    ay0, ax0 = 0.85, -0.9
    ay = jnp.full((s,), ay0, jnp.float32)
    ax = jnp.full((s,), ax0, jnp.float32)
    by = jnp.linspace(-5.0, 12.0, s, dtype=jnp.float32)
    bx = jnp.linspace(n_x + 5.0, n_x - 2.0, s, dtype=jnp.float32)
    # sanity: this shape must actually take the windowed u-side
    from tpuvr.kernels.sweep import _TILE
    assert n_x % _TILE == 0
    enables = jnp.ones((s,), jnp.float32)
    dt = jnp.full((n_v, n_u), 0.7, jnp.float32)
    d_color = jnp.asarray(rng.random((3, n_v, n_u), dtype=np.float32))
    d_trans = jnp.asarray(rng.random((n_v, n_u), dtype=np.float32))
    band = (abs(ay0), abs(ax0), abs(ay0), abs(ax0))
    kw = dict(reverse=False, sigma_scale=1.0, early_stop_eps=0.0,
              precision="highest")
    c_fin, t_fin = sweep_fwd(grid_sc, (ay, by, ax, bx), enables, dt, **kw)
    args = (grid_sc, (ay, by, ax, bx), enables, dt, c_fin, t_fin,
            d_color, d_trans)
    g_b = sweep_bwd(*args, band=band, **kw)
    g_d = sweep_bwd(*args, **kw)
    np.testing.assert_allclose(g_b, g_d, atol=2e-5)
