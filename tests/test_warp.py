"""Tiled tent-matmul pixel warp vs the gather formulation (C5 warp stage).

The tiled warp (tpuvr.ops.warp) must reproduce the 4-tap gather warp's
taps and weights exactly (1 ulp of multiply associativity allowed), for
values AND gradients, across perspective orbit cameras and adversarial
position fields including out-of-range clamps.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpuvr.config import RenderConfig
from tpuvr.io.synth import orbit_cameras, smoke_sphere
from tpuvr.ops.warp import (
    lattice_positions,
    plan_warp_tiling,
    warp_tiled,
)


def _gather_warp(inter, y_pos, x_pos):
    """The reference 4-tap formulation (tpuvr.ops.geometry gather path)."""
    n_v, n_u = inter.shape[0], inter.shape[1]
    y0 = jnp.clip(jnp.floor(y_pos), 0, n_v - 2).astype(jnp.int32)
    x0 = jnp.clip(jnp.floor(x_pos), 0, n_u - 2).astype(jnp.int32)
    fy = jnp.clip(y_pos - y0, 0.0, 1.0)
    fx = jnp.clip(x_pos - x0, 0.0, 1.0)
    return (
        inter[y0, x0] * ((1 - fy) * (1 - fx))[..., None]
        + inter[y0, x0 + 1] * ((1 - fy) * fx)[..., None]
        + inter[y0 + 1, x0] * (fy * (1 - fx))[..., None]
        + inter[y0 + 1, x0 + 1] * (fy * fx)[..., None]
    )


def _random_positions(rng, res, n_v, n_u, wild=False):
    """Smooth-ish position fields; `wild` adds out-of-range excursions."""
    yy, xx = np.meshgrid(np.arange(res, dtype=np.float32),
                         np.arange(res, dtype=np.float32), indexing="ij")
    y = 0.9 * yy + 0.3 * xx + 3.0 * np.sin(xx / 17.0) - 4.0
    x = 1.1 * xx - 0.2 * yy + 2.0 * np.cos(yy / 23.0) + 1.5
    y = y * (n_v - 1) / max(y.max(), 1.0)
    x = x * (n_u - 1) / max(x.max(), 1.0)
    if wild:
        y = y + rng.uniform(-6.0, 6.0)  # push past both edges
        x = x + rng.uniform(-6.0, 6.0)
    return (np.clip(y, 0, n_v - 1).astype(np.float32),
            np.clip(x, 0, n_u - 1).astype(np.float32))


@pytest.mark.parametrize("wild", [False, True])
def test_warp_tiled_matches_gather(wild):
    rng = np.random.default_rng(3 + wild)
    n_v, n_u, res = 40, 56, 32
    inter = jnp.asarray(rng.standard_normal((n_v, n_u, 4)), jnp.float32)
    y_pos, x_pos = _random_positions(rng, res, n_v, n_u, wild)
    tiling = plan_warp_tiling(y_pos, x_pos, n_v, n_u)
    assert tiling is not None
    got = warp_tiled(inter, y_pos, x_pos, tiling)
    want = _gather_warp(inter, jnp.asarray(y_pos), jnp.asarray(x_pos))
    np.testing.assert_allclose(got, want, rtol=0, atol=4e-6)


def test_warp_tiled_gradients_match_gather():
    rng = np.random.default_rng(11)
    n_v, n_u, res = 40, 56, 32
    inter = jnp.asarray(rng.standard_normal((n_v, n_u, 4)), jnp.float32)
    y_pos, x_pos = _random_positions(rng, res, n_v, n_u, wild=True)
    tiling = plan_warp_tiling(y_pos, x_pos, n_v, n_u)
    ct = jnp.asarray(rng.standard_normal((res, res, 4)), jnp.float32)

    def loss_tiled(g):
        return jnp.sum(warp_tiled(g, y_pos, x_pos, tiling) * ct)

    def loss_gather(g):
        return jnp.sum(
            _gather_warp(g, jnp.asarray(y_pos), jnp.asarray(x_pos)) * ct
        )

    g_t = jax.grad(loss_tiled)(inter)
    g_g = jax.grad(loss_gather)(inter)
    np.testing.assert_allclose(g_t, g_g, rtol=0, atol=4e-5)


def test_warp_tiled_chunked_equals_unchunked():
    """The lax.map tile chunking must not change anything."""
    rng = np.random.default_rng(7)
    n_v, n_u, res = 48, 48, 64
    inter = jnp.asarray(rng.standard_normal((n_v, n_u, 3)), jnp.float32)
    y_pos, x_pos = _random_positions(rng, res, n_v, n_u)
    tiling = plan_warp_tiling(y_pos, x_pos, n_v, n_u)
    full = warp_tiled(inter, y_pos, x_pos, tiling)
    chunked = warp_tiled(inter, y_pos, x_pos, tiling, chunk_bytes=1 << 12)
    np.testing.assert_array_equal(np.asarray(full), np.asarray(chunked))


def test_render_view_warp_paths_agree():
    """End-to-end: the tiled warp inside render_view reproduces the
    gather warp to 1-ulp class error on a perspective orbit view."""
    n, res = 32, 64
    grid = smoke_sphere(n)
    cam = orbit_cameras(5, n, res=res)[2]
    cfg = RenderConfig(early_stop_eps=0.0)
    try:
        os.environ["TPUVR_WARP"] = "gather"
        r_g, t_g = jax.jit(
            lambda g: __import__("tpuvr.ops.render", fromlist=["render_view"])
            .render_view(g, cam, cfg, impl="xla")
        )(grid)
    finally:
        os.environ.pop("TPUVR_WARP", None)
    from tpuvr.ops.render import render_view

    r_t, t_t = jax.jit(
        lambda g: render_view(g, cam, cfg, impl="xla")
    )(grid)
    np.testing.assert_allclose(r_t, r_g, rtol=0, atol=1e-6)
    np.testing.assert_allclose(t_t, t_g, rtol=0, atol=1e-6)


def test_plan_warp_tiling_footprints_cover_taps():
    """Every pixel's two taps must lie inside its tile's footprint."""
    rng = np.random.default_rng(5)
    n_v, n_u, res = 64, 64, 64
    y_pos, x_pos = _random_positions(rng, res, n_v, n_u, wild=True)
    t = plan_warp_tiling(y_pos, x_pos, n_v, n_u)
    gy, gx = res // t.ty, res // t.tx
    yt = (y_pos.reshape(gy, t.ty, gx, t.tx).transpose(0, 2, 1, 3)
          .reshape(gy * gx, -1))
    xt = (x_pos.reshape(gy, t.ty, gx, t.tx).transpose(0, 2, 1, 3)
          .reshape(gy * gx, -1))
    lo_v = np.floor(yt.min(axis=1))
    hi_v = np.minimum(np.floor(yt.max(axis=1)) + 1, n_v - 1)
    assert (t.vbase <= lo_v).all()
    assert (t.vbase + t.f_v - 1 >= hi_v).all()
    lo_u = np.floor(xt.min(axis=1))
    hi_u = np.minimum(np.floor(xt.max(axis=1)) + 1, n_u - 1)
    assert (t.ubase <= lo_u).all()
    assert (t.ubase + t.f_u - 1 >= hi_u).all()


def test_train_step_tiled_warp_matches_gather():
    """One DP-free train step with the group warp tiling must match the
    gather-warp step (loss and updated params) to f32 tolerance."""
    import optax

    from tpuvr.io.synth import orbit_cameras, smoke_sphere
    from tpuvr.train.fit import (
        group_views,
        init_params,
        make_train_step,
    )

    n, res, n_views = 16, 32, 4
    gt = smoke_sphere(n)
    cams = orbit_cameras(n_views, n, res=res)
    from tpuvr.ops.render import render_view

    cfg = RenderConfig(early_stop_eps=0.0, precision="highest")
    targets = jnp.stack(
        [render_view(gt, c, cfg, impl="xla")[0] for c in cams]
    )

    def run(mode):
        os.environ["TPUVR_WARP"] = mode
        try:
            groups = group_views(cams, (n, n, n, 4))
        finally:
            os.environ.pop("TPUVR_WARP", None)
        key = sorted(groups)[0]
        idxs, stacked, band, tiling = groups[key]
        assert (tiling is None) == (mode == "gather")
        opt = optax.adam(1e-2)
        step = make_train_step(
            key, len(idxs), opt, cfg, True, "xla", None,
            band=band, warp_tiling=tiling,
        )
        params = init_params((n, n, n, 4), True)
        opt_state = opt.init(params)
        gb = jax.tree.map(lambda a: a[jnp.arange(len(idxs))], stacked)
        if mode == "gather":
            gb = {k: v for k, v in gb.items()
                  if k not in ("wvb", "wub")}
        tg = targets[jnp.asarray(idxs)]
        r0s = jnp.zeros((len(idxs),), jnp.int32)
        params, opt_state, loss = step(params, opt_state, gb, tg, r0s)
        return float(loss), params

    l_t, p_t = run("tiled")
    l_g, p_g = run("gather")
    np.testing.assert_allclose(l_t, l_g, rtol=1e-6)
    np.testing.assert_allclose(p_t, p_g, rtol=0, atol=1e-6)


def test_mesh_train_step_gather_warp():
    """The DP (mesh) train step must work when the stacked geometry has
    NO 'wvb'/'wub' keys (TPUVR_WARP=gather or an undividable resolution):
    geom shard_map specs are derived from the actual keys, not a fixed
    dict. Regression test for the pytree-structure mismatch."""
    import optax

    from tpuvr.dist.replicated import data_mesh
    from tpuvr.io.synth import orbit_cameras, smoke_sphere
    from tpuvr.ops.render import render_view
    from tpuvr.train.fit import (
        group_views,
        init_params,
        make_train_step,
    )

    if len(jax.devices()) < 8:
        import pytest

        pytest.skip("needs 8 virtual devices")
    n, res, n_views = 16, 32, 4
    gt = smoke_sphere(n)
    cams = orbit_cameras(n_views, n, res=res)
    cfg = RenderConfig(early_stop_eps=0.0, precision="highest")
    targets = jnp.stack(
        [render_view(gt, c, cfg, impl="xla")[0] for c in cams]
    )
    os.environ["TPUVR_WARP"] = "gather"
    try:
        groups = group_views(cams, (n, n, n, 4))
    finally:
        os.environ.pop("TPUVR_WARP", None)
    key = sorted(groups)[0]
    idxs, stacked, band, tiling = groups[key]
    assert tiling is None and "wvb" not in stacked

    def run(mesh):
        # SGD, not Adam: Adam's m/sqrt(v) normalization turns f32
        # summation-order noise on near-zero grads into O(lr) update
        # flips; SGD keeps param diffs proportional to grad diffs.
        opt = optax.sgd(1e-2)
        step = make_train_step(
            key, len(idxs), opt, cfg, True, "xla", mesh,
            band=band, warp_tiling=tiling,
        )
        params = init_params((n, n, n, 4), True)
        opt_state = opt.init(params)
        gb = jax.tree.map(lambda a: a[jnp.arange(len(idxs))], stacked)
        tg = targets[jnp.asarray(idxs)]
        r0s = jnp.zeros((len(idxs),), jnp.int32)
        params, opt_state, loss = step(params, opt_state, gb, tg, r0s)
        return float(loss), params

    l_m, p_m = run(data_mesh(8))
    l_1, p_1 = run(None)
    np.testing.assert_allclose(l_m, l_1, rtol=1e-5)
    np.testing.assert_allclose(p_m, p_1, rtol=0, atol=1e-5)
