"""End-to-end inverse rendering smoke test (C9; SURVEY.md §4).

A tiny grid is recovered from synthetic posed views: loss must drop by a
large factor and test-view PSNR must clear a gate. Also covers
checkpoint/resume continuity (SURVEY.md §5 failure recovery).
"""

import jax.numpy as jnp
import numpy as np

from tpuvr.config import RenderConfig, TrainConfig
from tpuvr.io.synth import orbit_cameras, smoke_sphere
from tpuvr.train.fit import (
    evaluate_psnr,
    fit_grid,
    params_to_grid,
    render_all_views,
)

N = 12
RES = 16


def _scene():
    grid_true = smoke_sphere(N)
    cams = orbit_cameras(8, N, res=RES, elevation_deg=25.0)
    targets = render_all_views(grid_true, cams)
    return grid_true, cams, targets


def test_fit_recovers_scene(tmp_path):
    grid_true, cams, targets = _scene()
    cfg = TrainConfig(
        lr=5e-2, steps=150, views_per_batch=4, ckpt_every=0,
        ckpt_dir=str(tmp_path), seed=0,
    )
    rcfg = RenderConfig(early_stop_eps=0.0)
    grid, params, hist = fit_grid(
        targets, cams, grid_true.shape, cfg, rcfg, run_dir=str(tmp_path)
    )
    first = np.mean(hist["loss"][:5])
    last = np.mean(hist["loss"][-5:])
    assert last < first * 0.05, (first, last)
    assert evaluate_psnr(grid, cams, targets, rcfg) > 30.0
    # Metrics JSONL written.
    assert (tmp_path / "metrics.jsonl").exists()


def test_fit_with_ray_subsampling(tmp_path):
    """TrainConfig.rays_per_view: band-subsampled steps still converge."""
    grid_true, cams, targets = _scene()
    cfg = TrainConfig(
        lr=5e-2, steps=150, views_per_batch=4, ckpt_every=0,
        ckpt_dir=str(tmp_path), seed=0,
        rays_per_view=8 * RES,  # half the rows per view per step
    )
    rcfg = RenderConfig(early_stop_eps=0.0)
    grid, params, hist = fit_grid(
        targets, cams, grid_true.shape, cfg, rcfg, run_dir=str(tmp_path)
    )
    first = np.mean(hist["loss"][:5])
    last = np.mean(hist["loss"][-5:])
    assert last < first * 0.1, (first, last)
    assert evaluate_psnr(grid, cams, targets, rcfg) > 26.0


def test_checkpoint_resume_continuity(tmp_path):
    grid_true, cams, targets = _scene()
    rcfg = RenderConfig(early_stop_eps=0.0)
    cfg1 = TrainConfig(
        lr=5e-2, steps=30, views_per_batch=4, ckpt_every=10,
        ckpt_dir=str(tmp_path), seed=0,
    )
    _, params1, hist1 = fit_grid(
        targets, cams, grid_true.shape, cfg1, rcfg, run_dir=str(tmp_path)
    )
    # Kill/restart: resume to 60 total steps from the saved state.
    cfg2 = TrainConfig(
        lr=5e-2, steps=60, views_per_batch=4, ckpt_every=10,
        ckpt_dir=str(tmp_path), seed=0,
    )
    grid2, params2, hist2 = fit_grid(
        targets, cams, grid_true.shape, cfg2, rcfg,
        run_dir=str(tmp_path), resume=True,
    )
    # Resumed run continues from ~step 30 (not from scratch): its first
    # losses must be near the pre-kill losses, far below a cold start.
    assert hist2["loss"][0] < hist1["loss"][0] * 0.5
    # And it keeps improving.
    assert np.mean(hist2["loss"][-5:]) <= np.mean(hist1["loss"][-5:])


def test_steps_per_call_scan_matches_per_step(tmp_path):
    """TrainConfig.steps_per_call chains K steps in one jitted scan;
    with a single view group (and no row subsampling, so the rng call
    sequence matches) the trajectory is identical to per-step calls."""
    import numpy as np

    from tpuvr.config import RenderConfig, TrainConfig
    from tpuvr.io.synth import smoke_sphere
    from tpuvr.ref.camera import look_at_perspective
    from tpuvr.train.fit import fit_grid, render_all_views

    n = 16
    gt = smoke_sphere(n)
    c = (n - 1) / 2.0
    cams = [
        look_at_perspective((c + dx, c - 3.0 * n, c + 0.4 * n),
                            (c, c, c), res_x=16, res_y=16)
        for dx in (-2.0, 0.0, 2.0)
    ]
    rcfg = RenderConfig(early_stop_eps=0.0)
    targets = np.asarray(render_all_views(gt, cams, rcfg))
    runs = {}
    for K in (1, 2):
        cfg = TrainConfig(lr=3e-2, steps=4, views_per_batch=2,
                          ckpt_every=0, seed=11, steps_per_call=K)
        _, params, hist = fit_grid(
            targets, cams, gt.shape, cfg, rcfg,
            run_dir=str(tmp_path / f"k{K}"),
        )
        runs[K] = (np.asarray(params), hist["loss"])
    np.testing.assert_allclose(runs[2][1], runs[1][1], rtol=1e-6)
    np.testing.assert_allclose(runs[2][0], runs[1][0], atol=1e-6)


def test_checkpoint_resume_bf16_state(tmp_path):
    """TrainConfig.ckpt_bf16 halves checkpoint bytes (the c4 orbax
    saves fetch ~768 MB through this box's tunnel at ~30 s each); the
    restore casts back to f32 and the resumed run must continue from
    the saved state (not a cold start) within bf16 rounding."""
    grid_true, cams, targets = _scene()
    rcfg = RenderConfig(early_stop_eps=0.0)
    cfg1 = TrainConfig(
        lr=5e-2, steps=30, views_per_batch=4, ckpt_every=10,
        ckpt_dir=str(tmp_path), ckpt_bf16=True, seed=0,
    )
    _, params1, hist1 = fit_grid(
        targets, cams, grid_true.shape, cfg1, rcfg, run_dir=str(tmp_path)
    )
    cfg2 = TrainConfig(
        lr=5e-2, steps=60, views_per_batch=4, ckpt_every=10,
        ckpt_dir=str(tmp_path), ckpt_bf16=True, seed=0,
    )
    grid2, params2, hist2 = fit_grid(
        targets, cams, grid_true.shape, cfg2, rcfg,
        run_dir=str(tmp_path), resume=True,
    )
    assert np.asarray(params2).dtype == np.float32
    assert hist2["loss"][0] < hist1["loss"][0] * 0.5
    assert np.mean(hist2["loss"][-5:]) <= np.mean(hist1["loss"][-5:])


def test_lit_inverse_rendering_recovers_density(tmp_path):
    """LIT inverse rendering (the c5 training shape, BASELINE.json:11):
    targets rendered with the hemisphere light volume; each train step
    bakes the light volume from the CURRENT density and multiplies it
    into emission before the sweep (detached shadows). Loss must fall
    and the recovered grid must reproduce the lit views."""
    from tpuvr.config import LightingConfig

    grid_true, cams, targets_unlit = _scene()
    lcfg = LightingConfig(mode="lightvolume", n_samples=4)
    rcfg = RenderConfig(early_stop_eps=0.0)
    targets = np.asarray(render_all_views(
        grid_true, cams, rcfg, lighting=lcfg))
    cfg = TrainConfig(
        lr=5e-2, steps=150, views_per_batch=4, ckpt_every=0,
        ckpt_dir=str(tmp_path), seed=0,
    )
    grid, params, hist = fit_grid(
        targets, cams, grid_true.shape, cfg, rcfg,
        run_dir=str(tmp_path), lighting=lcfg,
    )
    first = np.mean(hist["loss"][:5])
    last = np.mean(hist["loss"][-5:])
    assert last < first * 0.15, (first, last)
    assert evaluate_psnr(grid, cams, targets, rcfg,
                         lighting=lcfg) > 24.0
