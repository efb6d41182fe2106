"""Spatially-sharded grid path (C11) on the 8-device CPU mesh.

Invariants: slab-sharded render == single-device render; ring composition
== gathered fold; grid gradients match the unsharded path.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpuvr.config import RenderConfig
from tpuvr.dist.sharded_grid import grid_mesh, render_view_zsharded
from tpuvr.io.synth import smoke_sphere
from tpuvr.ops.render import render_view
from tpuvr.ref.camera import OrthoCamera, look_at_perspective

N = 16
RES = 16
CFG = RenderConfig(early_stop_eps=0.0)


def _cams():
    c = (N - 1) / 2.0
    return [
        OrthoCamera(
            center=(c, c, -3.0 * N), forward=(0.0, 0.0, 1.0),
            up=(0.0, 1.0, 0.0), width=1.5 * N, height=1.5 * N,
            res_x=RES, res_y=RES,
        ),
        # reverse traversal + warp path
        look_at_perspective((c, c + 3.0 * N, c + 0.8 * N), (c, c, c),
                            res_x=RES, res_y=RES),
    ]


@pytest.mark.parametrize("cam_i", [0, 1])
@pytest.mark.parametrize("layout", [(1, 8), (4, 2), (2, 4)])
def test_zsharded_matches_single_device(devices8, cam_i, layout):
    grid = smoke_sphere(N)
    cam = _cams()[cam_i]
    mesh = grid_mesh(*layout)
    rgb_s, t_s = render_view_zsharded(grid, cam, mesh, CFG)
    rgb_1, t_1 = render_view(grid, cam, CFG)
    np.testing.assert_allclose(rgb_s, rgb_1, atol=1e-6)
    np.testing.assert_allclose(t_s, t_1, atol=1e-6)


@pytest.mark.parametrize("cam_i", [0, 1])
def test_ring_fold_matches_gather_fold(devices8, cam_i):
    grid = smoke_sphere(N)
    cam = _cams()[cam_i]
    mesh = grid_mesh(1, 8)
    rgb_g, t_g = render_view_zsharded(grid, cam, mesh, CFG,
                                      fold="all_gather")
    rgb_r, t_r = render_view_zsharded(grid, cam, mesh, CFG, fold="ring")
    np.testing.assert_allclose(rgb_r, rgb_g, atol=1e-6)
    np.testing.assert_allclose(t_r, t_g, atol=1e-6)


def test_zsharded_gradients_match_unsharded(devices8):
    grid = smoke_sphere(N)
    cam = _cams()[1]
    mesh = grid_mesh(2, 4)

    def loss_sharded(g):
        rgb, t = render_view_zsharded(g, cam, mesh, CFG)
        return jnp.sum(rgb**2) + jnp.sum(t)

    def loss_single(g):
        rgb, t = render_view(g, cam, CFG)
        return jnp.sum(rgb**2) + jnp.sum(t)

    g_s = jax.grad(loss_sharded)(grid)
    g_1 = jax.grad(loss_single)(grid)
    np.testing.assert_allclose(g_s, g_1, atol=2e-5)
