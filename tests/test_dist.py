"""Distributed paths on the 8-device CPU mesh (SURVEY.md §4).

Invariant: sharded render == single-device render (the mesh is a pure
parallelization, never a different algorithm).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from tpuvr.config import RenderConfig
from tpuvr.dist.replicated import data_mesh, render_view_dp
from tpuvr.io.synth import smoke_sphere
from tpuvr.ops.render import render_view
from tpuvr.ref.camera import OrthoCamera, look_at_perspective

N = 12
RES = 16


@pytest.fixture(scope="module")
def grid():
    return smoke_sphere(N)


@pytest.mark.parametrize("make_cam", [
    lambda c: OrthoCamera(
        center=(c, c, -3.0 * N), forward=(0.0, 0.0, 1.0),
        up=(0.0, 1.0, 0.0), width=1.5 * N, height=1.5 * N,
        res_x=RES, res_y=RES,
    ),
    lambda c: look_at_perspective(
        (c, c - 3.0 * N, c + 0.8 * N), (c, c, c), res_x=RES, res_y=RES
    ),
])
def test_dp_render_matches_single_device(grid, devices8, make_cam):
    cam = make_cam((N - 1) / 2.0)
    mesh = data_mesh(8)
    cfg = RenderConfig(early_stop_eps=0.0)
    rgb_dp, t_dp = render_view_dp(grid, cam, mesh, cfg)
    rgb_1, t_1 = render_view(grid, cam, cfg)
    np.testing.assert_allclose(rgb_dp, rgb_1, atol=1e-6)
    np.testing.assert_allclose(t_dp, t_1, atol=1e-6)


def test_dryrun_multichip_runs():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)
