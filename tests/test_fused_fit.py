"""Fused-softplus layout-resident training vs the materialized path.

fit_grid with TPUVR_FUSED_SOFTPLUS=1 (default) keeps the raw parameter
grid and Adam moments in the current view group's sweep layout and lets
the kernels apply softplus per streamed slice; with =0 it materializes
softplus + layout every step (the round-3 path). Same math, different
data movement — losses and the recovered parameters must agree to
kernel rounding, including across group switches (state re-layout) and
checkpoint/resume (canonical checkpoints).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpuvr.config import RenderConfig, TrainConfig
from tpuvr.ref.camera import look_at_perspective
from tpuvr.train.fit import fit_grid, render_all_views


def _fixture(two_groups: bool):
    rng = np.random.default_rng(7)
    gshape = (16, 128, 128, 4)
    gt = jnp.asarray(rng.random(gshape, dtype=np.float32) * 0.4)
    c = (7.5, 63.5, 63.5)  # (z, y, x) grid center
    cams = [
        look_at_perspective((c[2] + dx, c[1], -300.0),
                            (c[2], c[1], c[0]), res_x=128, res_y=128)
        for dx in (-12.0, 15.0)
    ]
    if two_groups:
        cams += [
            look_at_perspective((c[2] + dx, c[1], 320.0),
                                (c[2], c[1], c[0]), res_x=128, res_y=128)
            for dx in (-9.0, 11.0)
        ]
    cfg = RenderConfig(early_stop_eps=0.0, precision="highest")
    targets = np.asarray(render_all_views(gt, cams, cfg, impl="xla"))
    return gshape, cams, cfg, targets


@pytest.mark.parametrize("two_groups,steps_per_call", [(False, 1),
                                                       (True, 2)])
def test_fused_fit_matches_materialized(tmp_path, monkeypatch,
                                        two_groups, steps_per_call):
    gshape, cams, cfg, targets = _fixture(two_groups)
    tcfg = TrainConfig(lr=2e-2, steps=4, views_per_batch=2, ckpt_every=0,
                       seed=3, steps_per_call=steps_per_call)
    runs = {}
    for flag in ("1", "0"):
        monkeypatch.setenv("TPUVR_FUSED_SOFTPLUS", flag)
        _, params, hist = fit_grid(
            targets, cams, gshape, tcfg, cfg, impl="xla",
            run_dir=str(tmp_path / f"fs{flag}"),
        )
        runs[flag] = (np.asarray(params), hist["loss"])
    np.testing.assert_allclose(runs["1"][1], runs["0"][1], rtol=2e-4)
    np.testing.assert_allclose(runs["1"][0], runs["0"][0], atol=2e-4)


def test_fused_fit_ckpt_resume_canonical(tmp_path, monkeypatch):
    """Checkpoints written by the fused path are canonical: a resumed
    run continues exactly like an uninterrupted one."""
    gshape, cams, cfg, targets = _fixture(two_groups=True)
    monkeypatch.setenv("TPUVR_FUSED_SOFTPLUS", "1")
    kw = dict(render_cfg=cfg, impl="xla")
    full = TrainConfig(lr=2e-2, steps=6, views_per_batch=2,
                       ckpt_every=100, seed=3, steps_per_call=2,
                       ckpt_dir=str(tmp_path / "full"))
    _, p_full, h_full = fit_grid(targets, cams, gshape, full,
                                 run_dir=str(tmp_path / "full"), **kw)

    part = TrainConfig(lr=2e-2, steps=4, views_per_batch=2,
                       ckpt_every=2, seed=3, steps_per_call=2,
                       ckpt_dir=str(tmp_path / "re"))
    fit_grid(targets, cams, gshape, part,
             run_dir=str(tmp_path / "re"), **kw)
    rest = TrainConfig(lr=2e-2, steps=6, views_per_batch=2,
                       ckpt_every=2, seed=3, steps_per_call=2,
                       ckpt_dir=str(tmp_path / "re"))
    _, p_res, h_res = fit_grid(targets, cams, gshape, rest,
                               run_dir=str(tmp_path / "re"),
                               resume=True, **kw)
    np.testing.assert_allclose(np.asarray(p_res), np.asarray(p_full),
                               atol=2e-4)
    np.testing.assert_allclose(h_res["loss"], h_full["loss"][4:],
                               rtol=2e-4)


def test_fused_fit_mesh_matches_materialized(tmp_path, monkeypatch):
    """DP mesh path (rays row-sharded, grid replicated) under the fused
    mode vs materialized — the shard_map plumbing is unchanged, only the
    params' layout and the op's softplus flag differ."""
    from jax.sharding import Mesh

    gshape, cams, cfg, targets = _fixture(two_groups=False)
    mesh = Mesh(np.asarray(jax.devices()[:2]), ("data",))
    tcfg = TrainConfig(lr=2e-2, steps=2, views_per_batch=2, ckpt_every=0,
                       seed=3, steps_per_call=2)
    runs = {}
    for flag in ("1", "0"):
        monkeypatch.setenv("TPUVR_FUSED_SOFTPLUS", flag)
        _, params, hist = fit_grid(
            targets, cams, gshape, tcfg, cfg, impl="xla", mesh=mesh,
            run_dir=str(tmp_path / f"mfs{flag}"),
        )
        runs[flag] = (np.asarray(params), hist["loss"])
    np.testing.assert_allclose(runs["1"][1], runs["0"][1], rtol=2e-4)
    np.testing.assert_allclose(runs["1"][0], runs["0"][0], atol=2e-4)


def test_render_views_grouped_matches_per_view():
    """render_views_grouped (one program per view group, traced view
    pick + row-block warp) must match the per-camera render_all_views."""
    from tpuvr.io.synth import orbit_cameras, smoke_sphere
    from tpuvr.train.fit import render_all_views, render_views_grouped

    n = 32
    grid = smoke_sphere(n)
    cams = orbit_cameras(6, n, res=64)
    cfg = RenderConfig(early_stop_eps=0.0, precision="highest")
    a = np.asarray(render_all_views(grid, cams, cfg, impl="xla"))
    b = np.asarray(render_views_grouped(grid, cams, cfg, impl="xla"))
    np.testing.assert_allclose(b, a, atol=3e-6)
