"""Pallas tile warp (tpuvr.kernels.warp, opt-in TPUVR_WARP=rows).

Pins the row/tile-block warp against the bilinear gather formulation
(forward taps and weights are exact) and its transpose kernel against
autodiff of the jnp twin; plus a fit smoke under TPUVR_WARP=rows
matching the default tiled-warp fit.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpuvr.ops.warp import plan_row_warp, row_warp_image, row_warp_op


def _positions(seed, n_v, n_u, res, diagonal=False):
    rng = np.random.default_rng(seed)
    if diagonal:
        # v varies along BOTH pixel axes (the steep-orbit case).
        base = (np.linspace(0, n_v - 1.01, res)[:, None] * 0.5
                + np.linspace(0, n_v - 1.01, res)[None, :] * 0.5)
        y = (base + rng.uniform(-1, 1, (res, res))).clip(0, n_v - 1)
    else:
        y = (np.linspace(0, n_v - 1.01, res)[:, None]
             + rng.uniform(-1, 1, (res, res))).clip(0, n_v - 1)
    x = (np.linspace(0, n_u - 1.01, res)[None, :]
         + rng.uniform(-1, 1, (res, res))).clip(0, n_u - 1)
    return y.astype(np.float32), x.astype(np.float32)


def _gather_ref(inter, y, x):
    n_c, n_v, n_u = inter.shape
    iv0 = np.floor(y).astype(int)
    iu0 = np.floor(x).astype(int)
    fv, fx = y - iv0, x - iu0
    iv1 = np.minimum(iv0 + 1, n_v - 1)
    iu1 = np.minimum(iu0 + 1, n_u - 1)
    I = np.asarray(inter)
    return (((1 - fv) * (1 - fx))[None] * I[:, iv0, iu0]
            + ((1 - fv) * fx)[None] * I[:, iv0, iu1]
            + (fv * (1 - fx))[None] * I[:, iv1, iu0]
            + (fv * fx)[None] * I[:, iv1, iu1])


@pytest.mark.parametrize("diagonal", [False, True])
@pytest.mark.parametrize("impl", ["xla", "pallas"])
def test_row_warp_matches_gather(impl, diagonal):
    n_v, n_u, res = 48, 128, 32
    y, x = _positions(3, n_v, n_u, res, diagonal)
    planned = plan_row_warp([(y, x)], n_v, n_u)
    assert planned is not None
    plan, vb, yf, xf = planned
    rng = np.random.default_rng(5)
    inter = jnp.asarray(rng.random((4, n_v, n_u), dtype=np.float32))
    op = row_warp_op(plan.f_v, impl,
                     interpret=True if impl == "pallas" else None)
    out = op(inter, jnp.asarray(yf[0]), jnp.asarray(xf[0]),
             jnp.asarray(vb[0]))
    img = np.asarray(row_warp_image(out, plan))
    np.testing.assert_allclose(img, _gather_ref(inter, y, x), atol=3e-7)


def test_row_warp_grad_matches_twin():
    n_v, n_u, res = 48, 128, 32
    y, x = _positions(7, n_v, n_u, res)
    plan, vb, yf, xf = plan_row_warp([(y, x)], n_v, n_u)
    rng = np.random.default_rng(9)
    inter = jnp.asarray(rng.random((4, n_v, n_u), dtype=np.float32))
    args = (jnp.asarray(yf[0]), jnp.asarray(xf[0]), jnp.asarray(vb[0]))
    op_x = row_warp_op(plan.f_v, "xla")
    op_p = row_warp_op(plan.f_v, "pallas", interpret=True)

    def loss(op, g):
        return jnp.sum(op(g, *args) ** 2)

    g_x = jax.grad(lambda g: loss(op_x, g))(inter)
    g_p = jax.grad(lambda g: loss(op_p, g))(inter)
    np.testing.assert_allclose(np.asarray(g_p), np.asarray(g_x),
                               atol=3e-6)


def test_fit_rows_warp_matches_tiled(tmp_path, monkeypatch):
    """fit_grid under TPUVR_WARP=rows == the default tiled-warp fit
    (same bilinear taps, different data movement)."""
    from tpuvr.config import RenderConfig, TrainConfig
    from tpuvr.ref.camera import look_at_perspective
    from tpuvr.train.fit import fit_grid, render_all_views

    rng = np.random.default_rng(11)
    gshape = (16, 128, 128, 4)
    gt = jnp.asarray(rng.random(gshape, dtype=np.float32) * 0.4)
    c = (7.5, 63.5, 63.5)
    cams = [
        look_at_perspective((c[2] + dx, c[1], -300.0),
                            (c[2], c[1], c[0]), res_x=128, res_y=128)
        for dx in (-12.0, 15.0)
    ]
    cfg = RenderConfig(early_stop_eps=0.0, precision="highest")
    targets = np.asarray(render_all_views(gt, cams, cfg, impl="xla"))
    tcfg = TrainConfig(lr=2e-2, steps=2, views_per_batch=2,
                       ckpt_every=0, seed=3)
    runs = {}
    for mode in ("rows", "tiled"):
        monkeypatch.setenv("TPUVR_WARP", mode)
        _, params, hist = fit_grid(
            targets, cams, gshape, tcfg, cfg, impl="xla",
            run_dir=str(tmp_path / mode),
        )
        runs[mode] = (np.asarray(params), hist["loss"])
    np.testing.assert_allclose(runs["rows"][1], runs["tiled"][1],
                               rtol=2e-4)
    np.testing.assert_allclose(runs["rows"][0], runs["tiled"][0],
                               atol=2e-4)
