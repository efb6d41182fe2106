"""View-batched sweeps: one grid stream marching a whole view minibatch.

The c4 train step renders k views per step; looping views re-streams the
grid k times (268 MB per view at 256^3 — the measured round-2 step cost
is HBM-bound on exactly that traffic). The batched path stacks the
views' intermediate planes along V and gives every v-tile its own affine
(per-(slice, v-tile) SMEM scalars), so the grid streams ONCE per step.

These tests pin the batched kernels to the per-view loop to f32
rounding (the batched path folds each view's base-row offset into its
intercept, so tap weights round differently in the last ulp).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from tpuvr.kernels.sweep import band_tiles, sweep_fwd
from tpuvr.kernels.sweep_bwd import sweep_bwd


def _views_setup(seed=23, views=2, s=4, n_y=144, n_x=160, n_v=128,
                 n_u=128):
    rng = np.random.default_rng(seed)
    grid_sc = jnp.asarray(
        rng.random((s, 4, n_y, n_x), dtype=np.float32) * 0.5
    )
    # Distinct per-view affines within one (axis, reverse) group, slopes
    # in the 128-tile regime; intercepts hit window clamping on one view.
    ay = jnp.asarray(rng.uniform(0.5, 0.9, (views, s)), jnp.float32)
    ax = jnp.asarray(rng.uniform(0.5, 0.9, (views, s)), jnp.float32)
    by = jnp.asarray(rng.uniform(-10.0, 20.0, (views, s)), jnp.float32)
    bx = jnp.asarray(rng.uniform(-5.0, 30.0, (views, s)), jnp.float32)
    enables = jnp.asarray(
        rng.integers(0, 2, (views, s))
        + np.array([[1.0] + [0.0] * (s - 1)]),  # keep slice 0 live
        jnp.float32,
    ).clip(0.0, 1.0)
    dt = jnp.asarray(
        rng.uniform(0.5, 1.0, (views, n_v, n_u)), jnp.float32
    )
    band = (0.9, 0.9, 0.5, 0.5)
    assert band_tiles(band, views * n_v, n_u, n_y, n_x) == (128, 128)
    return grid_sc, (ay, by, ax, bx), enables, dt, band


@pytest.mark.parametrize("reverse", [False, True])
def test_view_batched_fwd_matches_loop(reverse):
    views = 2
    grid_sc, coeffs, enables, dt, band = _views_setup(views=views)
    ay, by, ax, bx = coeffs
    kw = dict(reverse=reverse, sigma_scale=1.2, early_stop_eps=0.0,
              precision="highest")
    rgb_b, t_b = sweep_fwd(
        grid_sc, coeffs, enables, dt.reshape(-1, dt.shape[-1]),
        band=band, views=views, **kw,
    )
    n_v = dt.shape[1]
    for w in range(views):
        rgb_1, t_1 = sweep_fwd(
            grid_sc, (ay[w], by[w], ax[w], bx[w]), enables[w], dt[w],
            band=band, **kw,
        )
        sl = slice(w * n_v, (w + 1) * n_v)
        np.testing.assert_allclose(np.asarray(rgb_b[:, sl]),
                                   np.asarray(rgb_1), atol=5e-6,
                                   err_msg=f"v{w}")
        np.testing.assert_allclose(np.asarray(t_b[sl]),
                                   np.asarray(t_1), atol=5e-6)


def test_view_batched_bwd_matches_loop():
    views = 2
    grid_sc, coeffs, enables, dt, band = _views_setup(seed=29,
                                                      views=views)
    ay, by, ax, bx = coeffs
    n_v, n_u = dt.shape[1], dt.shape[2]
    rng = np.random.default_rng(31)
    d_color = jnp.asarray(
        rng.random((3, views * n_v, n_u), dtype=np.float32)
    )
    d_trans = jnp.asarray(
        rng.random((views * n_v, n_u), dtype=np.float32)
    )
    kw = dict(reverse=False, sigma_scale=1.2, early_stop_eps=0.0,
              precision="highest")
    c_fin, t_fin = sweep_fwd(
        grid_sc, coeffs, enables, dt.reshape(-1, n_u),
        band=band, views=views, **kw,
    )
    g_b = sweep_bwd(
        grid_sc, coeffs, enables, dt.reshape(-1, n_u), c_fin, t_fin,
        d_color, d_trans, band=band, views=views, **kw,
    )
    g_sum = jnp.zeros_like(g_b)
    for w in range(views):
        sl = slice(w * n_v, (w + 1) * n_v)
        c1, t1 = sweep_fwd(
            grid_sc, (ay[w], by[w], ax[w], bx[w]), enables[w], dt[w],
            band=band, **kw,
        )
        g1 = sweep_bwd(
            grid_sc, (ay[w], by[w], ax[w], bx[w]), enables[w], dt[w],
            c1, t1, d_color[:, sl], d_trans[sl], band=band, **kw,
        )
        g_sum = g_sum + g1
    np.testing.assert_allclose(np.asarray(g_b), np.asarray(g_sum),
                               atol=2e-5)


def test_fit_view_batch_matches_loop(tmp_path, monkeypatch):
    """fit_grid with the view-batched step vs the per-view loop: same
    losses and same recovered parameters (to kernel rounding)."""
    import jax

    from tpuvr.config import RenderConfig, TrainConfig
    from tpuvr.ref.camera import look_at_perspective
    from tpuvr.train.fit import (
        fit_grid,
        group_views,
        render_all_views,
        view_batch_eligible,
    )

    rng = np.random.default_rng(5)
    gshape = (8, 128, 128, 4)
    gt = jnp.asarray(rng.random(gshape, dtype=np.float32) * 0.4)
    c = (3.5, 63.5, 63.5)  # (z, y, x) grid center
    cams = [
        look_at_perspective((c[2] + dx, c[1], -300.0), (c[2], c[1], c[0]),
                            res_x=128, res_y=128)
        for dx in (-12.0, 15.0)
    ]
    cfg = RenderConfig(early_stop_eps=0.0, precision="highest")
    targets = np.asarray(render_all_views(gt, cams, cfg, impl="xla"))

    (key, (idxs, stacked, band, _)), = group_views(cams, gshape).items()
    assert view_batch_eligible(2, band, gshape, key[0],
                               stacked["dt"].shape[1],
                               stacked["dt"].shape[2])

    tcfg = TrainConfig(lr=2e-2, steps=2, views_per_batch=2, ckpt_every=0,
                       seed=3)
    runs = {}
    for flag in ("1", "0"):
        monkeypatch.setenv("TPUVR_VIEW_BATCH", flag)
        _, params, hist = fit_grid(
            targets, cams, gshape, tcfg, cfg, impl="pallas",
            run_dir=str(tmp_path / f"vb{flag}"),
        )
        runs[flag] = (np.asarray(params), hist["loss"])
    np.testing.assert_allclose(runs["1"][1], runs["0"][1], rtol=1e-4)
    np.testing.assert_allclose(runs["1"][0], runs["0"][0], atol=1e-4)


def test_fit_view_batch_mesh_matches_loop(tmp_path, monkeypatch):
    """Mesh path (rays row-sharded over 'data'): batched vs loop step.

    Uses the XLA views twin: Pallas interpret mode under checked
    shard_map is unsupported on CPU (see test_dist.py), and the twin
    exercises exactly the fit.py plumbing that differs (batched coeff
    stack, single axis-1 intermediate all_gather, per-view warp)."""
    import jax
    from jax.sharding import Mesh

    from tpuvr.config import RenderConfig, TrainConfig
    from tpuvr.ref.camera import look_at_perspective
    from tpuvr.train.fit import fit_grid, render_all_views

    rng = np.random.default_rng(9)
    gshape = (8, 128, 128, 4)
    gt = jnp.asarray(rng.random(gshape, dtype=np.float32) * 0.4)
    c = (3.5, 63.5, 63.5)
    cams = [
        look_at_perspective((c[2] + dx, c[1], -300.0), (c[2], c[1], c[0]),
                            res_x=128, res_y=128)
        for dx in (-12.0, 15.0)
    ]
    cfg = RenderConfig(early_stop_eps=0.0, precision="highest")
    targets = np.asarray(render_all_views(gt, cams, cfg, impl="xla"))
    mesh = Mesh(np.asarray(jax.devices()[:2]), ("data",))

    tcfg = TrainConfig(lr=2e-2, steps=2, views_per_batch=2, ckpt_every=0,
                       seed=3)
    runs = {}
    for flag in ("1", "0"):
        monkeypatch.setenv("TPUVR_VIEW_BATCH", flag)
        _, params, hist = fit_grid(
            targets, cams, gshape, tcfg, cfg, impl="xla", mesh=mesh,
            run_dir=str(tmp_path / f"mvb{flag}"),
        )
        runs[flag] = (np.asarray(params), hist["loss"])
    np.testing.assert_allclose(runs["1"][1], runs["0"][1], rtol=1e-4)
    np.testing.assert_allclose(runs["1"][0], runs["0"][0], atol=1e-4)


@pytest.mark.parametrize("banded", [False, True])
def test_view_batch_ert_parity(banded):
    """ERT semantics of the view-batched kernels (early_stop_eps > 0).

    DENSE batched: PER-VIEW termination state — exact parity with the
    per-view loop (both check at block granularity). BANDED batched:
    joint max-over-views state — a view may march past its own
    termination point, adding contributions bounded by ~eps (each
    extra step's weight is T*(1-att) <= T < eps).
    """
    views, s, eps = 2, 16, 1e-3
    grid_sc, coeffs, enables, dt, band = _views_setup(seed=41,
                                                      views=views, s=s)
    ay, by, ax, bx = coeffs
    if not banded:
        band = None  # no static band -> DENSE batched route
    enables = jnp.ones_like(enables)  # march everything
    # View 0 terminates fast (huge optical depth), view 1 slowly.
    dt = dt.at[0].mul(50.0)
    n_v, n_u = dt.shape[1], dt.shape[2]
    kw = dict(reverse=False, sigma_scale=4.0, early_stop_eps=eps,
              precision="highest")
    rgb_b, t_b = sweep_fwd(
        grid_sc, coeffs, enables, dt.reshape(-1, n_u),
        band=band, views=views, **kw,
    )
    rng = np.random.default_rng(43)
    d_rgb = jnp.asarray(rng.random((3, views * n_v, n_u),
                                   dtype=np.float32))
    d_t = jnp.asarray(rng.random((views * n_v, n_u), dtype=np.float32))
    g_b = sweep_bwd(
        grid_sc, coeffs, enables, dt.reshape(-1, n_u), rgb_b, t_b,
        d_rgb, d_t, band=band, views=views, **kw,
    )
    g_sum = jnp.zeros_like(g_b)
    # Exact for the dense batched route; eps-bounded for banded.
    atol_img = 5e-6 if not banded else 8.0 * eps
    atol_grd = 2e-5 if not banded else 8.0 * eps
    saw_early_term = False
    for w in range(views):
        sl = slice(w * n_v, (w + 1) * n_v)
        r1, t1 = sweep_fwd(
            grid_sc, (ay[w], by[w], ax[w], bx[w]), enables[w], dt[w],
            band=band, **kw,
        )
        saw_early_term = saw_early_term or bool(
            np.max(np.asarray(t1)) < eps
        )
        np.testing.assert_allclose(np.asarray(rgb_b[:, sl]),
                                   np.asarray(r1), atol=atol_img,
                                   err_msg=f"v{w}")
        np.testing.assert_allclose(np.asarray(t_b[sl]), np.asarray(t1),
                                   atol=atol_img)
        g_sum = g_sum + sweep_bwd(
            grid_sc, (ay[w], by[w], ax[w], bx[w]), enables[w], dt[w],
            r1, t1, d_rgb[:, sl], d_t[sl], band=band, **kw,
        )
    assert saw_early_term, "fixture never triggered ERT; test is vacuous"
    np.testing.assert_allclose(np.asarray(g_b), np.asarray(g_sum),
                               atol=atol_grd)


@pytest.mark.parametrize("band", [None, (2.5, 2.5, 1.0, 1.0)])
def test_dense_view_batched_matches_loop(band):
    """The DENSE view-batched kernels (position-vector A side, per-view
    B side — the c4 train-step shape where slopes ~2-4 disqualify
    full-128 banded tiles) vs the per-view dense loop, fwd and bwd."""
    from tpuvr.kernels.sweep import band_tiles

    views = 2
    grid_sc, coeffs, enables, dt, _ = _views_setup(seed=37, views=views)
    ay, by, ax, bx = coeffs
    # Steeper slopes than the banded-128 regime.
    ay, ax = ay + 1.0, ax + 1.0
    coeffs = (ay, by, ax, bx)
    n_v, n_u = dt.shape[1], dt.shape[2]
    if band is not None:
        # Anything but the full-128 banded class routes to dbatch.
        assert band_tiles(band, n_v, n_u, grid_sc.shape[2],
                          grid_sc.shape[3]) != (128, 128)
    kw = dict(reverse=False, sigma_scale=1.1, early_stop_eps=0.0,
              precision="highest")
    rgb_b, t_b = sweep_fwd(
        grid_sc, coeffs, enables, dt.reshape(-1, n_u),
        band=band, views=views, **kw,
    )
    rng = np.random.default_rng(61)
    d_rgb = jnp.asarray(rng.random((3, views * n_v, n_u),
                                   dtype=np.float32))
    d_t = jnp.asarray(rng.random((views * n_v, n_u), dtype=np.float32))
    g_b = sweep_bwd(
        grid_sc, coeffs, enables, dt.reshape(-1, n_u), rgb_b, t_b,
        d_rgb, d_t, band=band, views=views, **kw,
    )
    g_sum = jnp.zeros_like(g_b)
    for w in range(views):
        sl = slice(w * n_v, (w + 1) * n_v)
        r1, t1 = sweep_fwd(
            grid_sc, (ay[w], by[w], ax[w], bx[w]), enables[w], dt[w],
            **kw,
        )
        np.testing.assert_allclose(np.asarray(rgb_b[:, sl]),
                                   np.asarray(r1), atol=5e-6)
        np.testing.assert_allclose(np.asarray(t_b[sl]), np.asarray(t1),
                                   atol=5e-6)
        g_sum = g_sum + sweep_bwd(
            grid_sc, (ay[w], by[w], ax[w], bx[w]), enables[w], dt[w],
            r1, t1, d_rgb[:, sl], d_t[sl], **kw,
        )
    np.testing.assert_allclose(np.asarray(g_b), np.asarray(g_sum),
                               atol=2e-5)
