"""prepare_grid / render_prepared parity with render_view (frame-loop API).

The prepared path factors the per-grid-update work (sweep-layout
transpose, occupancy scan, lighting bake) out of the per-frame path — the
TPU-native analog of the reference's resident-volume frame loop
(reconstructed ``main -> loop{enqueue render}``, SURVEY.md §3.1). It must
be bit-identical to render_view for every camera family and sweep axis.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpuvr.config import LightingConfig, RenderConfig
from tpuvr.io.synth import smoke_sphere
from tpuvr.ops.render import prepare_grid, render_prepared, render_view

N = 12
RES = 16


@pytest.fixture(scope="module")
def grid():
    return smoke_sphere(N, dtype=jnp.float32)


def _cams():
    from tpuvr.ref.camera import OrthoCamera, look_at_perspective

    c = (N - 1) / 2.0
    return [
        # axis-2 ortho (the bench camera shape)
        OrthoCamera(center=(c, c, -2.0 * N), forward=(0.0, 0.0, 1.0),
                    up=(0.0, 1.0, 0.0), width=1.4 * N, height=1.4 * N,
                    res_x=RES, res_y=RES),
        # axis-0 dominant perspective, reversed traversal
        look_at_perspective((c + 3.0 * N, c + 0.2 * N, c - 0.4 * N),
                            (c, c, c), res_x=RES, res_y=RES),
        # axis-1 dominant perspective
        look_at_perspective((c - 0.3 * N, c - 2.5 * N, c + 0.6 * N),
                            (c, c, c), res_x=RES, res_y=RES),
    ]


@pytest.mark.parametrize("use_occ", [True, False])
def test_prepared_matches_render_view(grid, use_occ):
    cfg = RenderConfig(early_stop_eps=1e-4, use_occupancy=use_occ)
    prep = prepare_grid(grid)
    for cam in _cams():
        rgb_a, t_a = render_view(grid, cam, cfg)
        rgb_b, t_b = render_prepared(prep, cam, cfg)
        np.testing.assert_array_equal(np.asarray(rgb_a), np.asarray(rgb_b))
        np.testing.assert_array_equal(np.asarray(t_a), np.asarray(t_b))


def test_prepared_with_lighting(grid):
    cfg = RenderConfig()
    lighting = LightingConfig(mode="lightvolume", n_samples=4)
    cam = _cams()[0]
    rgb_a, _ = render_view(grid, cam, cfg, lighting=lighting)
    prep = prepare_grid(grid, axes=(2,), lighting=lighting,
                        precision=cfg.precision)
    rgb_b, _ = render_prepared(prep, cam, cfg)
    np.testing.assert_array_equal(np.asarray(rgb_a), np.asarray(rgb_b))


def test_prepared_wrong_axis_raises(grid):
    prep = prepare_grid(grid, axes=(0,))
    with pytest.raises(ValueError, match="axes"):
        render_prepared(prep, _cams()[0], RenderConfig())


def test_prepared_is_differentiable(grid):
    """Grads must flow through the prepared layout (training uses this)."""
    cam = _cams()[0]
    cfg = RenderConfig(early_stop_eps=0.0)

    def loss_prep(g):
        rgb, _ = render_prepared(prepare_grid(g, axes=(2,)), cam, cfg)
        return jnp.sum(rgb ** 2)

    def loss_view(g):
        rgb, _ = render_view(g, cam, cfg)
        return jnp.sum(rgb ** 2)

    ga = jax.grad(loss_prep)(grid)
    gb = jax.grad(loss_view)(grid)
    np.testing.assert_allclose(np.asarray(ga), np.asarray(gb), atol=1e-6)


def test_prepared_jit_pytree(grid):
    """prep is a jit-traceable pytree: one jitted frame fn, many calls."""
    cam = _cams()[0]
    cfg = RenderConfig()
    prep = jax.jit(lambda g: prepare_grid(g, axes=(2,)))(grid)
    frame = jax.jit(lambda p: render_prepared(p, cam, cfg))
    rgb1, _ = frame(prep)
    rgb2, _ = render_view(grid, cam, cfg)
    np.testing.assert_allclose(np.asarray(rgb1), np.asarray(rgb2), atol=1e-6)
