"""Pallas sweep kernel vs pure-jnp oracle (SURVEY.md §4 oracle tier).

The kernel computes the *same discretization* as
``tpuvr.ref.march.render_plane_sweep`` on the intermediate ray lattice, so
agreement is to f32 roundoff, not quadrature tolerance. Shapes are small:
kernels run in interpret mode on the CPU test backend and compile time
dominates on this host.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from tpuvr.config import RenderConfig
from tpuvr.io.synth import smoke_sphere
from tpuvr.ops.geometry import intermediate_rays, plan_sweep, warp_to_pixels
from tpuvr.ops.render import render_view
from tpuvr.ref.camera import (
    OrthoCamera,
    camera_rays,
    dominant_axis,
    look_at_perspective,
)
from tpuvr.ref.march import GRID_PERM, render_plane_sweep

N = 12
RES = 16
ATOL = 1e-5


@pytest.fixture(scope="module")
def grid():
    return smoke_sphere(N)


def _oracle_image(grid, cam):
    """Oracle for the full fast path: plane-sweep the intermediate lattice
    rays in f64, then the same final warp."""
    axis = dominant_axis(cam)
    plan, uv_pixel = plan_sweep(cam, grid.shape, axis)
    gp = jnp.transpose(grid, GRID_PERM[axis]).astype(jnp.float64)
    o, d = intermediate_rays(plan, dtype=jnp.float64)
    rgb, t = render_plane_sweep(gp, o, d, axis=2)
    inter = jnp.concatenate([rgb, t[..., None]], axis=-1)
    img = warp_to_pixels(inter, plan, uv_pixel)
    return img[..., :3], img[..., 3]


def _check(grid, cam, cfg=RenderConfig(early_stop_eps=0.0), atol=ATOL):
    rgb_k, t_k = render_view(grid, cam, cfg)
    rgb_o, t_o = _oracle_image(grid, cam)
    np.testing.assert_allclose(rgb_k, rgb_o, atol=atol)
    np.testing.assert_allclose(t_k, t_o, atol=atol)


def test_separable_ortho_axis_aligned(grid):
    c = (N - 1) / 2.0
    cam = OrthoCamera(
        center=(c, c, -3.0 * N), forward=(0.0, 0.0, 1.0),
        up=(0.0, 1.0, 0.0), width=1.5 * N, height=1.5 * N,
        res_x=RES, res_y=RES,
    )
    # Sanity: separable case must also match the per-pixel oracle directly.
    o, d = camera_rays(cam, dtype=jnp.float64)
    rgb_o, t_o = render_plane_sweep(
        grid.astype(jnp.float64), o, d, axis=2
    )
    rgb_k, t_k = render_view(grid, cam, RenderConfig(early_stop_eps=0.0))
    np.testing.assert_allclose(rgb_k, rgb_o, atol=ATOL)
    np.testing.assert_allclose(t_k, t_o, atol=ATOL)


def test_separable_ortho_reverse(grid):
    c = (N - 1) / 2.0
    cam = OrthoCamera(
        center=(c, c, 4.0 * N), forward=(0.0, 0.0, -1.0),
        up=(0.0, 1.0, 0.0), width=1.5 * N, height=1.5 * N,
        res_x=RES, res_y=RES,
    )
    o, d = camera_rays(cam, dtype=jnp.float64)
    rgb_o, t_o = render_plane_sweep(grid.astype(jnp.float64), o, d, axis=2)
    rgb_k, t_k = render_view(grid, cam, RenderConfig(early_stop_eps=0.0))
    np.testing.assert_allclose(rgb_k, rgb_o, atol=ATOL)
    np.testing.assert_allclose(t_k, t_o, atol=ATOL)


def test_tilted_ortho_warp_path(grid):
    c = (N - 1) / 2.0
    fwd = (0.3, 0.2, 1.0)
    nrm = np.linalg.norm(fwd)
    center = tuple(c - 3.0 * N * f / nrm for f in fwd)
    cam = OrthoCamera(
        center=center, forward=fwd, width=1.6 * N, height=1.6 * N,
        res_x=RES, res_y=RES,
    )
    _check(grid, cam)


@pytest.mark.parametrize("eye_off", [
    (0.0, -3.0, 0.8),   # y-dominant
    (3.0, 0.5, -0.7),   # x-dominant
    (0.4, 0.8, 3.0),    # z-dominant
])
def test_perspective_orbit_views(grid, eye_off):
    c = (N - 1) / 2.0
    eye = (c + eye_off[0] * N, c + eye_off[1] * N, c + eye_off[2] * N)
    cam = look_at_perspective(eye, (c, c, c), res_x=RES, res_y=RES)
    _check(grid, cam)


def test_ert_error_is_bounded(grid):
    # ERT only drops contributions with transmittance < eps.
    c = (N - 1) / 2.0
    cam = OrthoCamera(
        center=(c, c, -3.0 * N), forward=(0.0, 0.0, 1.0),
        up=(0.0, 1.0, 0.0), width=1.5 * N, height=1.5 * N,
        res_x=RES, res_y=RES,
    )
    dense = grid.at[..., 0].mul(50.0)  # optically thick => ERT triggers
    eps = 1e-3
    rgb_ert, t_ert = render_view(dense, cam, RenderConfig(early_stop_eps=eps))
    rgb_ex, t_ex = render_view(dense, cam, RenderConfig(early_stop_eps=0.0))
    assert float(jnp.max(jnp.abs(rgb_ert - rgb_ex))) <= eps * 2.0
    assert float(jnp.max(jnp.abs(t_ert - t_ex))) <= eps * 2.0


def test_occupancy_skip_is_lossless(grid):
    # Zero out the outer slabs: skipping empty slices must be exact.
    g = grid.at[:3].set(0.0).at[-3:].set(0.0)
    c = (N - 1) / 2.0
    cam = OrthoCamera(
        center=(c, c, -3.0 * N), forward=(0.0, 0.0, 1.0),
        up=(0.0, 1.0, 0.0), width=1.5 * N, height=1.5 * N,
        res_x=RES, res_y=RES,
    )
    rgb_a, t_a = render_view(g, cam, RenderConfig(use_occupancy=True,
                                                  early_stop_eps=0.0))
    rgb_b, t_b = render_view(g, cam, RenderConfig(use_occupancy=False,
                                                  early_stop_eps=0.0))
    np.testing.assert_allclose(rgb_a, rgb_b, atol=1e-7)
    np.testing.assert_allclose(t_a, t_b, atol=1e-7)


def test_high_precision_tier(grid):
    """precision='high' (manual 3-pass bf16 split-product) stays within
    ~1e-5 of 'highest' — the cheap near-f32 tier for training loops."""
    c = (N - 1) / 2.0
    cam = OrthoCamera(
        center=(c, c, -3.0 * N), forward=(0.0, 0.0, 1.0),
        up=(0.0, 1.0, 0.0), width=1.5 * N, height=1.5 * N,
        res_x=RES, res_y=RES,
    )
    rgb_hi, t_hi = render_view(
        grid, cam, RenderConfig(early_stop_eps=0.0, precision="highest")
    )
    rgb_h3, t_h3 = render_view(
        grid, cam, RenderConfig(early_stop_eps=0.0, precision="high")
    )
    np.testing.assert_allclose(rgb_h3, rgb_hi, atol=2e-5)
    np.testing.assert_allclose(t_h3, t_hi, atol=2e-5)


def test_render_view_fixed_dt_mode(grid):
    """RenderConfig.mode='fixed_dt' routes to the fixed-step oracle
    marcher; it must agree with the plane-sweep path to quadrature
    tolerance (different discretizations of the same integral)."""
    c = (N - 1) / 2.0
    cam = OrthoCamera(
        center=(c, c, -3.0 * N), forward=(0.0, 0.0, 1.0),
        up=(0.0, 1.0, 0.0), width=1.5 * N, height=1.5 * N,
        res_x=RES, res_y=RES,
    )
    rgb_ps, t_ps = render_view(grid, cam, RenderConfig(early_stop_eps=0.0))
    rgb_fd, t_fd = render_view(
        grid, cam,
        RenderConfig(mode="fixed_dt", step_dt=0.05, early_stop_eps=0.0),
    )
    np.testing.assert_allclose(rgb_fd, rgb_ps, atol=2e-2)
    np.testing.assert_allclose(t_fd, t_ps, atol=2e-2)


def test_render_view_rejects_unknown_mode(grid):
    c = (N - 1) / 2.0
    cam = OrthoCamera(
        center=(c, c, -3.0 * N), forward=(0.0, 0.0, 1.0),
        up=(0.0, 1.0, 0.0), width=1.5 * N, height=1.5 * N,
        res_x=RES, res_y=RES,
    )
    with pytest.raises(ValueError, match="unknown render mode"):
        render_view(grid, cam, RenderConfig(mode="bogus"))


def test_perspective_eye_inside_volume(grid):
    """Fly-through (C5): a perspective eye inside the slab renders via
    the masked half-sweep and must match the f64 plane-sweep oracle."""
    c = (N - 1) / 2.0
    # Eye near the center, looking +z toward the far half of the grid.
    cam = look_at_perspective(
        (c + 0.5, c - 0.3, c + 0.2), (c, c, N + 5.0),
        res_x=RES, res_y=RES,
    )
    _check(grid, cam)
    # And looking back the other way (reverse traversal).
    cam2 = look_at_perspective(
        (c + 0.5, c - 0.3, c + 0.2), (c, c, -N - 5.0),
        res_x=RES, res_y=RES,
    )
    _check(grid, cam2)


def test_eye_inside_gradients_flow(grid):
    import jax

    c = (N - 1) / 2.0
    cam = look_at_perspective(
        (c, c, c + 0.3), (c, c, N + 5.0), res_x=RES, res_y=RES
    )

    def loss(g):
        rgb, t = render_view(g, cam, RenderConfig(early_stop_eps=0.0))
        return jnp.sum(rgb**2)

    gr = jax.grad(loss)(grid)
    assert bool(jnp.all(jnp.isfinite(gr)))
    assert float(jnp.linalg.norm(gr)) > 0.0
    # Behind-the-eye voxels get zero gradient: nothing behind the eye is
    # visible (eye at plane c+0.3 of the z sweep; z < c means behind).
    behind = np.asarray(gr)[: int((N - 1) / 2.0), ...]
    assert float(np.abs(behind).max()) == 0.0
