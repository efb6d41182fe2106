"""Ulysses-analog all_to_all re-tiling (SURVEY.md §2.2) on the CPU mesh.

Invariants: the retiled fold matches the single-device render on both the
image and the grid gradient, for ortho and perspective cameras and several
('data', 'z') mesh layouts.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpuvr.config import RenderConfig
from tpuvr.dist.retile import render_view_retiled
from tpuvr.dist.sharded_grid import grid_mesh
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
        look_at_perspective((c, c + 3.0 * N, c + 0.8 * N), (c, c, c),
                            res_x=RES, res_y=RES),
    ]


@pytest.mark.parametrize("cam_i", [0, 1])
@pytest.mark.parametrize("layout", [(1, 8), (2, 4), (4, 2)])
def test_retiled_matches_single_device(devices8, cam_i, layout):
    grid = smoke_sphere(N)
    cam = _cams()[cam_i]
    mesh = grid_mesh(*layout)
    ref_rgb, ref_t = render_view(grid, cam, CFG, impl="xla")
    rgb, t = render_view_retiled(grid, cam, mesh, CFG, impl="xla")
    np.testing.assert_allclose(np.asarray(rgb), np.asarray(ref_rgb),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(t), np.asarray(ref_t), atol=1e-5)


def test_retiled_grad_matches_single_device(devices8):
    grid = smoke_sphere(N)
    cam = _cams()[0]
    mesh = grid_mesh(2, 4)

    def loss_ref(g):
        rgb, t = render_view(g, cam, CFG, impl="xla")
        return jnp.sum(rgb * rgb) + jnp.sum(t)

    def loss_retiled(g):
        rgb, t = render_view_retiled(g, cam, mesh, CFG, impl="xla")
        return jnp.sum(rgb * rgb) + jnp.sum(t)

    g_ref = jax.grad(loss_ref)(grid)
    g_ret = jax.grad(loss_retiled)(grid)
    np.testing.assert_allclose(np.asarray(g_ret), np.asarray(g_ref),
                               atol=1e-5)
