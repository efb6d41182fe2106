"""Fused in-kernel softplus (the raw-parameter training path).

With softplus density parameterization every voxel is strictly positive,
so the materialized per-step softplus+layout pass (2 x 268 MB of HBM at
256^3) buys nothing the kernels can't do per streamed slice. These tests
pin sweep_fwd/sweep_bwd(softplus=True) on RAW parameter grids against
the same kernels on a pre-materialized softplus grid:

  fwd:  sweep(raw, softplus=True) == sweep(softplus(raw))
  bwd:  grad_raw == grad_materialized * [sigmoid(raw) on channel 0]

for every kernel route (dense, dense view-batched, banded, banded
view-batched) and the XLA scan twin.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpuvr.kernels.sweep import band_tiles, sweep_fwd
from tpuvr.kernels.sweep_bwd import sweep_bwd
from tpuvr.kernels.sweep_xla import sweep_bwd_xla, sweep_fwd_xla


def _setup(seed, views, s=6, n_y=144, n_x=160, n_v=128, n_u=128,
           slope=(0.5, 0.9)):
    rng = np.random.default_rng(seed)
    raw = jnp.asarray(
        rng.normal(0.0, 1.5, (s, 4, n_y, n_x)).astype(np.float32)
    )
    sp = jnp.concatenate(
        [jax.nn.softplus(raw[:, :1]), raw[:, 1:]], axis=1
    )
    shape = (views, s) if views > 1 else (s,)
    ay = jnp.asarray(rng.uniform(*slope, shape), jnp.float32)
    ax = jnp.asarray(rng.uniform(*slope, shape), jnp.float32)
    by = jnp.asarray(rng.uniform(-10.0, 20.0, shape), jnp.float32)
    bx = jnp.asarray(rng.uniform(-5.0, 30.0, shape), jnp.float32)
    enables = jnp.ones(shape, jnp.float32)
    dt_shape = (views * n_v, n_u) if views > 1 else (n_v, n_u)
    dt = jnp.asarray(rng.uniform(0.5, 1.0, dt_shape), jnp.float32)
    return raw, sp, (ay, by, ax, bx), enables, dt


def _sigmoid_chain(grad, raw):
    sig = jax.nn.sigmoid(raw[:, 0])
    return jnp.concatenate(
        [grad[:, :1] * sig[:, None], grad[:, 1:]], axis=1
    )


CASES = [
    # (name, views, band) — band selects the kernel route (see sweep_fwd)
    ("dense", 1, None),
    ("dbatch", 2, None),
    ("banded", 1, (0.9, 0.9, 0.5, 0.5)),
    ("banded_vb", 2, (0.9, 0.9, 0.5, 0.5)),
]


@pytest.mark.parametrize("name,views,band", CASES)
def test_fused_softplus_matches_materialized(name, views, band):
    raw, sp, coeffs, enables, dt = _setup(11, views)
    if band is not None:
        assert band_tiles(band, dt.shape[0] // views, dt.shape[1],
                          raw.shape[2], raw.shape[3]) == (128, 128)
    kw = dict(reverse=False, sigma_scale=1.3, early_stop_eps=0.0,
              precision="highest", band=band, views=views)
    rgb_f, t_f = sweep_fwd(raw, coeffs, enables, dt, softplus=True, **kw)
    rgb_m, t_m = sweep_fwd(sp, coeffs, enables, dt, **kw)
    np.testing.assert_allclose(np.asarray(rgb_f), np.asarray(rgb_m),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(t_f), np.asarray(t_m),
                               atol=1e-5)

    rng = np.random.default_rng(13)
    d_rgb = jnp.asarray(rng.random(rgb_f.shape, dtype=np.float32))
    d_t = jnp.asarray(rng.random(t_f.shape, dtype=np.float32))
    g_f = sweep_bwd(raw, coeffs, enables, dt, rgb_f, t_f, d_rgb, d_t,
                    softplus=True, **kw)
    g_m = sweep_bwd(sp, coeffs, enables, dt, rgb_m, t_m, d_rgb, d_t,
                    **kw)
    np.testing.assert_allclose(
        np.asarray(g_f), np.asarray(_sigmoid_chain(g_m, raw)), atol=3e-5
    )


def test_fused_softplus_xla_twin():
    raw, sp, coeffs, enables, dt = _setup(17, 1)
    kw = dict(reverse=True, sigma_scale=1.3, early_stop_eps=0.0,
              precision="highest")
    rgb_f, t_f = sweep_fwd_xla(raw, coeffs, enables, dt, softplus=True,
                               **kw)
    rgb_m, t_m = sweep_fwd_xla(sp, coeffs, enables, dt, **kw)
    np.testing.assert_allclose(np.asarray(rgb_f), np.asarray(rgb_m),
                               atol=1e-5)
    rng = np.random.default_rng(19)
    d_rgb = jnp.asarray(rng.random(rgb_f.shape, dtype=np.float32))
    d_t = jnp.asarray(rng.random(t_f.shape, dtype=np.float32))
    g_f = sweep_bwd_xla(raw, coeffs, enables, dt, rgb_f, t_f, d_rgb,
                        d_t, softplus=True, **kw)
    g_m = sweep_bwd_xla(sp, coeffs, enables, dt, rgb_m, t_m, d_rgb,
                        d_t, **kw)
    np.testing.assert_allclose(
        np.asarray(g_f), np.asarray(_sigmoid_chain(g_m, raw)), atol=3e-5
    )


def test_fused_softplus_grad_vs_autodiff():
    """End-to-end: the fused op's raw-parameter gradient matches
    jax.grad of (materialized softplus -> XLA forward scan)."""
    raw, _, coeffs, enables, dt = _setup(23, 1, s=4, n_y=64, n_x=64,
                                         n_v=32, n_u=32)
    kw = dict(reverse=False, sigma_scale=1.3, early_stop_eps=0.0,
              precision="highest")

    def loss_ref(raw):
        sp = jnp.concatenate(
            [jax.nn.softplus(raw[:, :1]), raw[:, 1:]], axis=1
        )
        rgb, t = sweep_fwd_xla(sp, coeffs, enables, dt, **kw)
        return jnp.sum(rgb) + jnp.sum(t * 0.5)

    g_ref = jax.grad(loss_ref)(raw)
    rgb, t = sweep_fwd_xla(raw, coeffs, enables, dt, softplus=True, **kw)
    g_fused = sweep_bwd_xla(
        raw, coeffs, enables, dt, rgb, t,
        jnp.ones_like(rgb), jnp.full_like(t, 0.5), softplus=True, **kw
    )
    np.testing.assert_allclose(np.asarray(g_fused), np.asarray(g_ref),
                               atol=3e-5)

    g_pallas = sweep_bwd(
        raw, coeffs, enables, dt, rgb, t,
        jnp.ones_like(rgb), jnp.full_like(t, 0.5), softplus=True, **kw
    )
    np.testing.assert_allclose(np.asarray(g_pallas), np.asarray(g_ref),
                               atol=3e-5)

