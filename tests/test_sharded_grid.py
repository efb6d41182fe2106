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


def test_zsharded_training_matches_unsharded(devices8, tmp_path):
    """C11 training: slab-sharded params + optimizer state on a
    ('data','z') mesh reproduce the unsharded loss trajectory."""
    from tpuvr.config import TrainConfig
    from tpuvr.ref.camera import look_at_perspective
    from tpuvr.train.fit import fit_grid

    grid_true = smoke_sphere(N)
    c = (N - 1) / 2.0
    # Cameras sweeping the z axis (the shard axis), one per direction.
    cams = [
        look_at_perspective((c + 1.0, c - 0.5, c - 3.0 * N), (c, c, c),
                            res_x=RES, res_y=RES),
        look_at_perspective((c - 0.8, c + 0.4, c + 3.0 * N), (c, c, c),
                            res_x=RES, res_y=RES),
    ]
    targets = jnp.stack(
        [render_view(grid_true, cam, CFG)[0] for cam in cams]
    )
    tcfg = TrainConfig(lr=5e-2, steps=8, views_per_batch=2, ckpt_every=0,
                       seed=1)
    _, _, hist_1 = fit_grid(
        targets, cams, grid_true.shape, tcfg, CFG,
        run_dir=str(tmp_path / "a"),
    )
    mesh = grid_mesh(2, 4)
    _, params_z, hist_z = fit_grid(
        targets, cams, grid_true.shape, tcfg, CFG, mesh=mesh,
        run_dir=str(tmp_path / "b"),
    )
    np.testing.assert_allclose(hist_z["loss"], hist_1["loss"],
                               rtol=2e-3, atol=1e-6)
    # The optimized params really are z-sharded across the mesh.
    shd = params_z.sharding
    assert getattr(shd, "spec", None) is not None


def test_zsharded_training_rejects_cross_axis_views(devices8, tmp_path):
    """Cameras sweeping x/y cannot use the z-slab trainer (would need a
    per-step grid all_to_all) — must fail loudly."""
    import pytest

    from tpuvr.config import TrainConfig
    from tpuvr.io.synth import orbit_cameras
    from tpuvr.train.fit import fit_grid

    grid_true = smoke_sphere(N)
    cams = orbit_cameras(2, N, res=RES, elevation_deg=10.0)  # x/y sweeps
    targets = jnp.stack(
        [render_view(grid_true, cam, CFG)[0] for cam in cams]
    )
    tcfg = TrainConfig(lr=5e-2, steps=2, views_per_batch=1, ckpt_every=0)
    with pytest.raises(ValueError, match="z-sharded training requires"):
        fit_grid(targets, cams, grid_true.shape, tcfg, CFG,
                 mesh=grid_mesh(2, 4), run_dir=str(tmp_path))
