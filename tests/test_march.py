"""Reference marcher correctness: analytic, convergence, permutation
(SURVEY.md §4 oracle tier)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpuvr.config import RenderConfig
from tpuvr.io.synth import smoke_sphere
from tpuvr.ref.camera import (
    OrthoCamera,
    camera_rays,
    dominant_axis,
    look_at_perspective,
)
from tpuvr.ref.march import (
    intersect_aabb,
    permute_for_sweep,
    render_fixed_dt,
    render_plane_sweep,
)
from tpuvr.ref.sample import trilinear


def test_aabb_intersection():
    o = jnp.asarray([[-5.0, 2.0, 2.0], [2.0, 2.0, -7.0], [10.0, 10.0, 10.0]])
    d = jnp.asarray([[1.0, 0.0, 0.0], [0.0, 0.0, 1.0], [1.0, 0.0, 0.0]])
    lo, hi = jnp.zeros(3), jnp.full((3,), 4.0)
    tn, tf = intersect_aabb(o, d, lo, hi)
    np.testing.assert_allclose(tn[:2], [5.0, 7.0], rtol=1e-6)
    np.testing.assert_allclose(tf[:2], [9.0, 11.0], rtol=1e-6)
    assert float(tn[2]) > float(tf[2])  # miss


def test_homogeneous_box_analytic():
    # Constant sigma + emission inside the grid; the zero-padded trilinear
    # field ramps linearly to 0 over the one-voxel margin, so the exact
    # axis-aligned profile is a trapezoid of total optical depth sigma*n.
    n = 17
    sigma0, c0 = 0.08, np.asarray([0.3, 0.6, 0.9])
    g = jnp.concatenate(
        [
            jnp.full((n, n, n, 1), sigma0, dtype=jnp.float64),
            jnp.broadcast_to(jnp.asarray(c0), (n, n, n, 3)).astype(
                jnp.float64
            ),
        ],
        axis=-1,
    )
    o = jnp.asarray([[(n - 1) / 2, (n - 1) / 2, -10.0]], dtype=jnp.float64)
    d = jnp.asarray([[0.0, 0.0, 1.0]], dtype=jnp.float64)
    expected_t = np.exp(-sigma0 * n)

    # Numeric 1D reference including the margins (w = trapezoid profile).
    z = np.arange(-1.0, float(n), 1e-3)
    w = np.clip(np.minimum(z + 1.0, (n - 1) - z + 1.0), 0.0, 1.0)
    tau = np.cumsum(sigma0 * w) * 1e-3
    weights = np.exp(-(tau - sigma0 * w * 1e-3)) * sigma0 * w * 1e-3
    c_expected = np.sum(weights * w) * c0  # emission also ramps with w

    rgb, t = render_fixed_dt(g, o, d, RenderConfig(step_dt=0.01))
    np.testing.assert_allclose(t[0], expected_t, rtol=1e-3)
    np.testing.assert_allclose(rgb[0], c_expected, rtol=1e-3)

    # Plane sweep: n samples at voxel centers, dt=1 — exact telescoping for
    # T; color is exact for the interior (w=1) samples.
    rgb2, t2 = render_plane_sweep(g, o, d, axis=2)
    np.testing.assert_allclose(t2[0], np.exp(-sigma0 * n), rtol=1e-6)
    np.testing.assert_allclose(
        rgb2[0], c0 * (1 - np.exp(-sigma0 * n)), rtol=1e-5
    )


def test_permute_for_sweep_preserves_sampling():
    g = jax.random.normal(jax.random.PRNGKey(0), (5, 6, 7, 4), dtype=jnp.float64)
    pts = jax.random.uniform(
        jax.random.PRNGKey(1), (11, 3), dtype=jnp.float64
    ) * jnp.asarray([6.0, 5.0, 4.0])
    base = trilinear(g, pts)
    for axis in (0, 1, 2):
        gp, pts_p, _ = permute_for_sweep(g, pts, pts, axis)
        np.testing.assert_allclose(trilinear(gp, pts_p), base, rtol=1e-12)


@pytest.mark.parametrize("axis_cam", [
    (2, (0.2, -0.3, 1.0)),   # sweep z
    (0, (1.0, 0.25, -0.2)),  # sweep x
    (1, (-0.1, -1.0, 0.3)),  # sweep y
])
def test_plane_sweep_converges_to_fixed_dt(axis_cam):
    axis, fwd = axis_cam
    n = 24
    g = smoke_sphere(n).astype(jnp.float64)
    c = (n - 1) / 2.0
    center = tuple(c - 3.0 * n * f / np.linalg.norm(fwd) for f in fwd)
    cam = OrthoCamera(
        center=center, forward=fwd, width=1.4 * n, height=1.4 * n,
        res_x=24, res_y=24,
    )
    assert dominant_axis(cam) == axis
    o, d = camera_rays(cam, dtype=jnp.float64)
    rgb_ps, t_ps = render_plane_sweep(g, o, d, axis=axis)
    rgb_fd, t_fd = render_fixed_dt(g, o, d, RenderConfig(step_dt=0.05))
    # Different quadratures of the same integral: the plane sweep is a
    # rectangle rule at ~1 voxel steps, so O(dt^2 * sigma') ~ a few percent
    # on this fixture (measured ~0.02-0.04); this is a convergence sanity
    # check, not the kernel-accuracy bar (see test_kernel_vs_ref).
    assert float(jnp.max(jnp.abs(rgb_ps - rgb_fd))) < 0.06
    assert float(jnp.max(jnp.abs(t_ps - t_fd))) < 0.06


def test_perspective_plane_sweep_close_to_fixed_dt():
    n = 24
    g = smoke_sphere(n).astype(jnp.float64)
    c = (n - 1) / 2.0
    cam = look_at_perspective(
        (c, c - 2.5 * n, c + 0.6 * n), (c, c, c), res_x=24, res_y=24
    )
    axis = dominant_axis(cam)
    o, d = camera_rays(cam, dtype=jnp.float64)
    rgb_ps, t_ps = render_plane_sweep(g, o, d, axis=axis)
    rgb_fd, t_fd = render_fixed_dt(g, o, d, RenderConfig(step_dt=0.05))
    # Oblique perspective rays have larger per-ray dt (up to ~1.5 voxels),
    # so the quadrature gap roughly doubles vs the ortho cases.
    assert float(jnp.max(jnp.abs(rgb_ps - rgb_fd))) < 0.1
    assert float(jnp.max(jnp.abs(t_ps - t_fd))) < 0.1


def test_empty_grid_renders_black_with_full_transmittance():
    g = jnp.zeros((8, 8, 8, 4), dtype=jnp.float64)
    cam = OrthoCamera(
        center=(3.5, 3.5, -10.0), forward=(0.0, 0.0, 1.0),
        width=10.0, height=10.0, res_x=4, res_y=4,
    )
    o, d = camera_rays(cam, dtype=jnp.float64)
    for render in (render_fixed_dt, render_plane_sweep):
        rgb, t = render(g, o, d)
        np.testing.assert_allclose(rgb, 0.0, atol=1e-12)
        np.testing.assert_allclose(t, 1.0, atol=1e-12)
