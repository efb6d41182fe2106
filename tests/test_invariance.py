"""Invariance properties (SURVEY.md §4): results must not depend on how
the work is tiled or batched."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpuvr.config import RenderConfig
from tpuvr.dist.replicated import data_mesh, render_view_dp
from tpuvr.io.synth import smoke_sphere
from tpuvr.kernels.occupancy import (
    build_occupancy,
    occupancy_fraction,
    slice_enables_from_occupancy,
)
from tpuvr.ops.render import render_view
from tpuvr.ref.camera import look_at_perspective

N = 16
RES = 16
CFG = RenderConfig(early_stop_eps=0.0)


def _cam():
    c = (N - 1) / 2.0
    return look_at_perspective(
        (c, c - 3.0 * N, c + 0.8 * N), (c, c, c), res_x=RES, res_y=RES
    )


def test_ray_tile_count_independence(devices8):
    grid = smoke_sphere(N)
    cam = _cam()
    ref, t_ref = render_view(grid, cam, CFG)
    for n_dev in (2, 4, 8):
        rgb, t = render_view_dp(grid, cam, data_mesh(n_dev), CFG)
        np.testing.assert_allclose(rgb, ref, atol=1e-6)
        np.testing.assert_allclose(t, t_ref, atol=1e-6)


def test_row_chunk_independence():
    # Row-chunked sweep calls (VMEM bounding for big frames) must not
    # change the image or the grid gradient.
    import dataclasses

    grid = smoke_sphere(N)
    cam = _cam()
    ref, t_ref = render_view(grid, cam, CFG)

    def loss(g, cfg):
        rgb, t = render_view(g, cam, cfg)
        return jnp.sum(rgb * rgb) + jnp.sum(t)

    g_ref = jax.grad(loss)(grid, CFG)
    # Chunking computes row positions as (by + r0*ay) + v*ay instead of
    # by + (r0+v)*ay — one extra f32 rounding, hence the 1e-5 tolerance.
    for rows in (4, 8):
        cfg = dataclasses.replace(CFG, max_rows_per_call=rows)
        rgb, t = render_view(grid, cam, cfg)
        np.testing.assert_allclose(rgb, ref, atol=1e-5)
        np.testing.assert_allclose(t, t_ref, atol=1e-5)
        np.testing.assert_allclose(jax.grad(loss)(grid, cfg), g_ref,
                                   atol=1e-5)


def test_view_batch_grad_additivity():
    # Gradient of a sum of view losses == sum of per-view gradients: the
    # minibatch composition cannot change optimization direction.
    grid = smoke_sphere(N)
    cams = [_cam()]
    c = (N - 1) / 2.0
    cams.append(look_at_perspective((c + 3.0 * N, c, c + 0.5 * N),
                                    (c, c, c), res_x=RES, res_y=RES))

    def loss_i(g, i):
        rgb, _ = render_view(g, cams[i], CFG)
        return jnp.sum(rgb**2)

    g_sum = jax.grad(lambda g: loss_i(g, 0) + loss_i(g, 1))(grid)
    g_parts = jax.grad(lambda g: loss_i(g, 0))(grid) + jax.grad(
        lambda g: loss_i(g, 1)
    )(grid)
    np.testing.assert_allclose(g_sum, g_parts, atol=1e-6)


def test_ert_monotone_in_eps():
    # Tighter ERT thresholds can only drop more (bounded) tail energy.
    grid = smoke_sphere(N).at[..., 0].mul(30.0)
    cam = _cam()
    rgb_exact, _ = render_view(grid, cam, RenderConfig(early_stop_eps=0.0))
    prev_err = 0.0
    for eps in (1e-6, 1e-4, 1e-2):
        rgb, _ = render_view(grid, cam, RenderConfig(early_stop_eps=eps))
        err = float(jnp.max(jnp.abs(rgb - rgb_exact)))
        assert err <= eps * 2.0 + 1e-7
        assert err >= prev_err - 1e-7
        prev_err = err


@pytest.mark.parametrize("brick", [2, 4, 5])
def test_occupancy_brick_pool(brick):
    grid = smoke_sphere(N)
    occ = build_occupancy(grid, brick)
    import math

    expect_shape = tuple(math.ceil(N / brick) for _ in range(3))
    assert occ.shape == expect_shape
    # Each brick's value equals the true max of its voxels.
    sigma = np.asarray(grid[..., 0])
    for bz in range(expect_shape[0]):
        for by in range(expect_shape[1]):
            for bx in range(expect_shape[2]):
                blk = sigma[bz * brick:(bz + 1) * brick,
                            by * brick:(by + 1) * brick,
                            bx * brick:(bx + 1) * brick]
                np.testing.assert_allclose(occ[bz, by, bx], blk.max(),
                                           rtol=1e-6)
    assert 0.0 < float(occupancy_fraction(occ)) <= 1.0


def test_occupancy_slice_enables_lossless():
    grid = smoke_sphere(N).at[:4].set(0.0).at[-5:].set(0.0)
    occ = build_occupancy(jnp.transpose(grid, (0, 1, 2, 3)), brick=4)
    enables = slice_enables_from_occupancy(occ, N, 4, reverse=False)
    # Slices in fully-zero brick layers are disabled.
    assert enables.shape == (N,)
    assert float(enables[0]) == 0.0 and float(enables[-1]) == 0.0
    assert float(enables[N // 2]) == 1.0
