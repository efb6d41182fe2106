"""Slab-chunked backward (the grad-allreduce/backward overlap, C10).

The backward kernels thread a (trans, q) recompute carry so the slice
axis can be split into chunks; each chunk's gradient collective can
then be scheduled while later chunks still march (see sweep_op's
``bwd_chunks``/``axis_name`` and tools/overlap_evidence.py). These
tests pin the chunked gradient to the single-call gradient — the chunk
boundaries must be invisible in the math (carry threading is exact, not
an approximation) — and the mesh path to the unchunked trainer.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpuvr.ops.vjp import sweep_op


def _setup(seed=41, s=8, n_y=48, n_x=40, n_v=32, n_u=24):
    rng = np.random.default_rng(seed)
    grid_sc = jnp.asarray(
        rng.random((s, 4, n_y, n_x), dtype=np.float32) * 0.6
    )
    ay = jnp.asarray(rng.uniform(0.6, 1.2, (s,)), jnp.float32)
    ax = jnp.asarray(rng.uniform(0.6, 1.2, (s,)), jnp.float32)
    by = jnp.asarray(rng.uniform(-4.0, 8.0, (s,)), jnp.float32)
    bx = jnp.asarray(rng.uniform(-4.0, 8.0, (s,)), jnp.float32)
    enables = jnp.asarray(
        np.clip(rng.integers(0, 2, (s,)) + ([1] + [0] * (s - 1)), 0, 1),
        jnp.float32,
    )
    dt = jnp.asarray(rng.uniform(0.5, 1.2, (n_v, n_u)), jnp.float32)
    d_rgb = jnp.asarray(rng.random((3, n_v, n_u), dtype=np.float32))
    d_t = jnp.asarray(rng.random((n_v, n_u), dtype=np.float32))
    return grid_sc, (ay, by, ax, bx), enables, dt, d_rgb, d_t


@pytest.mark.parametrize("reverse,eps", [(False, 0.0), (True, 0.0),
                                         (False, 1e-2)])
def test_chunked_bwd_matches_single_call_xla(reverse, eps):
    grid_sc, coeffs, enables, dt, d_rgb, d_t = _setup()

    def grad_of(op):
        def loss(g):
            rgb, t = op(g, coeffs, enables, dt)
            return (jnp.sum(rgb * d_rgb) + jnp.sum(t * d_t))

        return jax.grad(loss)(grid_sc)

    g1 = grad_of(sweep_op(reverse, 1.1, eps, "xla"))
    for n_chunks in (2, 4, 8):
        gc = grad_of(sweep_op(reverse, 1.1, eps, "xla",
                              bwd_chunks=n_chunks))
        np.testing.assert_allclose(np.asarray(gc), np.asarray(g1),
                                   atol=1e-5,
                                   err_msg=f"chunks={n_chunks}")


@pytest.mark.parametrize("banded", [False, True])
def test_chunked_bwd_matches_single_call_pallas(banded):
    """Pallas kernels (interpret): carry in/out through the revisited
    output planes, dense and banded."""
    grid_sc, coeffs, enables, dt, d_rgb, d_t = _setup(
        seed=43, s=8, n_y=144, n_x=160, n_v=128, n_u=128,
    )
    # Slopes must fit the banded regime when banded.
    ay, by, ax, bx = coeffs
    ay = jnp.clip(ay, 0.6, 0.9)
    ax = jnp.clip(ax, 0.6, 0.9)
    coeffs = (ay, by, ax, bx)
    band = (0.9, 0.9, 0.6, 0.6) if banded else None

    def grad_of(op):
        def loss(g):
            rgb, t = op(g, coeffs, enables, dt)
            return (jnp.sum(rgb * d_rgb) + jnp.sum(t * d_t))

        return jax.grad(loss)(grid_sc)

    g1 = grad_of(sweep_op(False, 1.1, 0.0, "pallas", band=band,
                          interpret=True))
    gc = grad_of(sweep_op(False, 1.1, 0.0, "pallas", band=band,
                          interpret=True, bwd_chunks=4))
    np.testing.assert_allclose(np.asarray(gc), np.asarray(g1), atol=2e-5)


def test_chunked_bwd_view_batched_xla():
    """views>1 + chunks: per-view carry splitting in the XLA twin."""
    rng = np.random.default_rng(47)
    views, s, n_y, n_x, n_v, n_u = 2, 8, 48, 40, 16, 24
    grid_sc = jnp.asarray(
        rng.random((s, 4, n_y, n_x), dtype=np.float32) * 0.6
    )
    coeffs = tuple(
        jnp.asarray(rng.uniform(lo, hi, (views, s)), jnp.float32)
        for lo, hi in ((0.6, 1.2), (-4, 8), (0.6, 1.2), (-4, 8))
    )
    enables = jnp.ones((views, s), jnp.float32)
    dt = jnp.asarray(
        rng.uniform(0.5, 1.2, (views * n_v, n_u)), jnp.float32
    )
    d_rgb = jnp.asarray(rng.random((3, views * n_v, n_u),
                                   dtype=np.float32))
    d_t = jnp.asarray(rng.random((views * n_v, n_u), dtype=np.float32))

    def grad_of(op):
        def loss(g):
            rgb, t = op(g, coeffs, enables, dt)
            return (jnp.sum(rgb * d_rgb) + jnp.sum(t * d_t))

        return jax.grad(loss)(grid_sc)

    g1 = grad_of(sweep_op(False, 1.0, 0.0, "xla", views=views))
    gc = grad_of(sweep_op(False, 1.0, 0.0, "xla", views=views,
                          bwd_chunks=4))
    np.testing.assert_allclose(np.asarray(gc), np.asarray(g1), atol=1e-5)


def test_fit_chunked_overlap_matches_baseline(tmp_path):
    """Mesh train step with bwd_chunks=2 (per-chunk in-op psum, no
    trailing bucketed reduction) vs the unchunked trainer: identical
    trajectories up to f32 reduction order."""
    from jax.sharding import Mesh

    from tpuvr.config import RenderConfig, TrainConfig
    from tpuvr.io.synth import orbit_cameras, smoke_sphere
    from tpuvr.train.fit import fit_grid, render_all_views

    n = 16
    gt = smoke_sphere(n)
    cams = orbit_cameras(4, n, res=16)
    targets = np.asarray(render_all_views(gt, cams))
    mesh = Mesh(np.asarray(jax.devices()[:4]), ("data",))
    cfg = TrainConfig(lr=3e-2, steps=3, views_per_batch=2, ckpt_every=0,
                      seed=7)
    runs = {}
    for chunks in (1, 2):
        _, params, hist = fit_grid(
            targets, cams, gt.shape, cfg, RenderConfig(early_stop_eps=0.0),
            mesh=mesh, run_dir=str(tmp_path / f"ch{chunks}"),
            bwd_chunks=chunks,
        )
        runs[chunks] = (np.asarray(params), hist["loss"])
    np.testing.assert_allclose(runs[2][1], runs[1][1], rtol=2e-3,
                               atol=1e-7)
    np.testing.assert_allclose(runs[2][0], runs[1][0], atol=1e-4)


@pytest.mark.parametrize("impl", ["xla", "pallas"])
def test_chunked_bwd_fused_softplus(impl):
    """Slab chunking composes with the fused softplus transform: the
    chunked raw-parameter gradient equals the single-call one (the
    in-kernel sigmoid chain is per-slice, so chunk boundaries stay
    invisible)."""
    grid_sc, coeffs, enables, dt, d_rgb, d_t = _setup(seed=47)
    raw = grid_sc - 0.3  # exercise negative raw densities too

    def grad_of(op):
        def loss(g):
            rgb, t = op(g, coeffs, enables, dt)
            return (jnp.sum(rgb * d_rgb) + jnp.sum(t * d_t))

        return jax.grad(loss)(raw)

    g1 = grad_of(sweep_op(False, 1.1, 0.0, impl, softplus=True))
    for n_chunks in (2, 4):
        gc = grad_of(sweep_op(False, 1.1, 0.0, impl, softplus=True,
                              bwd_chunks=n_chunks))
        np.testing.assert_allclose(np.asarray(gc), np.asarray(g1),
                                   atol=1e-5,
                                   err_msg=f"chunks={n_chunks}")
