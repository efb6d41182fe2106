"""Camera ray generation (SURVEY.md §4 unit tier)."""

import math

import jax.numpy as jnp
import numpy as np

from tpuvr.ref.camera import (
    OrthoCamera,
    camera_rays,
    dominant_axis,
    look_at_perspective,
)


def test_ortho_rays_parallel_and_spaced():
    cam = OrthoCamera(
        center=(0.0, 0.0, 0.0),
        forward=(0.0, 0.0, 1.0),
        up=(0.0, 1.0, 0.0),
        width=4.0,
        height=2.0,
        res_x=8,
        res_y=4,
    )
    o, d = camera_rays(cam)
    assert o.shape == (4, 8, 3) and d.shape == (4, 8, 3)
    np.testing.assert_allclose(d, jnp.broadcast_to(
        jnp.asarray([0.0, 0.0, 1.0]), d.shape), atol=1e-7)
    # Horizontal pixel pitch = width / res_x.
    dx = o[0, 1] - o[0, 0]
    np.testing.assert_allclose(jnp.linalg.norm(dx), 4.0 / 8, rtol=1e-6)
    # Vertical pitch = height / res_y.
    dy = o[1, 0] - o[0, 0]
    np.testing.assert_allclose(jnp.linalg.norm(dy), 2.0 / 4, rtol=1e-6)
    # Image plane centered on cam.center.
    np.testing.assert_allclose(jnp.mean(o, axis=(0, 1)), 0.0, atol=1e-6)


def test_perspective_center_ray_is_forward():
    cam = look_at_perspective(
        (10.0, 0.0, 0.0), (0.0, 0.0, 0.0), res_x=5, res_y=5
    )
    _, d = camera_rays(cam)
    np.testing.assert_allclose(
        d[2, 2], jnp.asarray([-1.0, 0.0, 0.0]), atol=1e-6
    )
    # All dirs unit length.
    np.testing.assert_allclose(
        jnp.linalg.norm(d, axis=-1), 1.0, atol=1e-6
    )


def test_perspective_fov_edges():
    fov = math.radians(60.0)
    cam = look_at_perspective(
        (0.0, 0.0, 10.0), (0.0, 0.0, 0.0), fov_y=fov, res_x=64, res_y=64
    )
    _, d = camera_rays(cam)
    f = jnp.asarray([0.0, 0.0, -1.0])
    cos_top = min(float(jnp.dot(d[0, 32], f)), 1.0)
    # Top-center pixel sits just inside the half-fov cone.
    half = fov / 2
    ang = math.acos(cos_top)
    assert ang < half
    assert ang > half * (1 - 2.0 / 64) * 0.9


def test_dominant_axis():
    assert dominant_axis(OrthoCamera((0, 0, 0), (0.1, -0.9, 0.2))) == 1
    assert dominant_axis(
        look_at_perspective((5.0, 1.0, 2.0), (0.0, 0.0, 0.0))
    ) == 0
