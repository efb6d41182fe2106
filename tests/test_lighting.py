"""Single-scatter sky lighting (C4; SURVEY.md §4 lighting tier)."""

import jax
import jax.numpy as jnp
import numpy as np

from tpuvr.config import LightingConfig, RenderConfig
from tpuvr.io.synth import smoke_sphere
from tpuvr.ops.lighting import (
    _directional_tau,
    apply_lighting,
    hemisphere_dirs,
    light_at_points_ref,
    light_volume,
)
from tpuvr.ops.render import render_view
from tpuvr.ref.camera import OrthoCamera

N = 12


def test_hemisphere_dirs_properties():
    up = (0.2, -0.4, 0.9)
    d = hemisphere_dirs(16, up)
    assert d.shape == (16, 3)
    np.testing.assert_allclose(np.linalg.norm(d, axis=-1), 1.0, atol=1e-12)
    upn = np.asarray(up) / np.linalg.norm(up)
    assert (d @ upn > 0).all()
    # Deterministic.
    np.testing.assert_array_equal(d, hemisphere_dirs(16, up))


def test_directional_tau_axis_aligned_analytic():
    # Homogeneous sigma, w = +z: tau at plane k counts slices above it.
    sigma0 = 0.13
    sig = jnp.full((N, N, N), sigma0, dtype=jnp.float64)
    tau = _directional_tau(sig, np.asarray([0.0, 0.0, 1.0]))
    for k in (0, 3, N - 1):
        expected = sigma0 * (N - 1 - k)
        np.testing.assert_allclose(tau[k, 5, 5], expected, rtol=1e-10)
    # And -z mirrors.
    tau_dn = _directional_tau(sig, np.asarray([0.0, 0.0, -1.0]))
    np.testing.assert_allclose(
        np.asarray(tau_dn[::-1]), np.asarray(tau), rtol=1e-10
    )


def test_directional_tau_oblique_matches_marcher():
    g = smoke_sphere(N, dtype=jnp.float64)
    sig = g[..., 0]
    w = np.asarray([0.3, -0.2, 0.93])
    w = w / np.linalg.norm(w)
    tau = _directional_tau(sig, w)
    # Compare tau -> transmittance against the exact per-point march at a
    # few interior voxel centers (different quadratures: tolerance).
    cfgn = LightingConfig(n_samples=1)
    pts = jnp.asarray(
        [[5.0, 6.0, 4.0], [6.0, 6.0, 6.0], [3.0, 8.0, 7.0]],
        dtype=jnp.float64,
    )
    for p in pts:
        ix, iy, iz = int(p[0]), int(p[1]), int(p[2])
        t_sweep = float(jnp.exp(-tau[iz, iy, ix]))
        # march directly along w
        field = sig[..., None]
        from tpuvr.ref.sample import trilinear
        dt = 0.05
        acc, q = 0.0, p
        for _ in range(600):
            q = q + jnp.asarray(w) * dt
            acc += dt * max(float(trilinear(field, q)[0]), 0.0)
        t_exact = float(np.exp(-acc))
        # The sweep re-resamples accumulated tau each slice (shear-warp
        # shadow smoothing) so oblique shadows are slightly softened.
        assert abs(t_sweep - t_exact) < 0.08, (t_sweep, t_exact)


def test_light_volume_matches_persample_oracle():
    g = smoke_sphere(N, dtype=jnp.float64)
    sig = g[..., 0]
    cfg = LightingConfig(n_samples=8)
    ell = light_volume(sig, cfg)
    assert ell.shape == (N, N, N)
    assert float(jnp.max(ell)) <= cfg.sky_intensity + 1e-9
    # Interior voxel centers, exact secondary marches.
    pts = jnp.asarray(
        [[5.0, 5.0, 5.0], [7.0, 4.0, 6.0], [3.0, 7.0, 8.0]],
        dtype=jnp.float64,
    )
    ell_ref = light_at_points_ref(sig, pts, cfg, dt=0.1)
    for p, lr in zip(pts, ell_ref):
        ix, iy, iz = int(p[0]), int(p[1]), int(p[2])
        assert abs(float(ell[iz, iy, ix]) - float(lr)) < 0.08


def test_lit_render_integration():
    g = smoke_sphere(N)
    c = (N - 1) / 2.0
    cam = OrthoCamera(
        center=(c, c, -3.0 * N), forward=(0.0, 0.0, 1.0),
        up=(0.0, 1.0, 0.0), width=1.5 * N, height=1.5 * N,
        res_x=16, res_y=16,
    )
    rcfg = RenderConfig(early_stop_eps=0.0)
    lcfg = LightingConfig(mode="lightvolume", n_samples=16)
    rgb_lit, t_lit = render_view(g, cam, rcfg, lighting=lcfg)
    rgb_manual, _ = render_view(apply_lighting(g, lcfg), cam, rcfg)
    np.testing.assert_allclose(rgb_lit, rgb_manual, atol=1e-6)
    # Lighting attenuates emission; transmittance unchanged.
    rgb_unlit, t_unlit = render_view(g, cam, rcfg)
    np.testing.assert_allclose(t_lit, t_unlit, atol=1e-6)
    assert float(jnp.mean(rgb_lit)) < float(jnp.mean(rgb_unlit))


def test_lit_render_gradients_flow():
    g = smoke_sphere(N)
    c = (N - 1) / 2.0
    cam = OrthoCamera(
        center=(c, c, -3.0 * N), forward=(0.0, 0.0, 1.0),
        up=(0.0, 1.0, 0.0), width=1.5 * N, height=1.5 * N,
        res_x=12, res_y=12,
    )
    lcfg = LightingConfig(mode="lightvolume", n_samples=4)

    def loss(grid):
        rgb, _ = render_view(grid, cam, RenderConfig(), lighting=lcfg)
        return jnp.mean(rgb**2)

    grads = jax.grad(loss)(g)
    assert bool(jnp.all(jnp.isfinite(grads)))
    assert float(jnp.linalg.norm(grads)) > 0.0


def test_tau_sweep_pallas_matches_xla():
    # The Pallas directional-tau kernel (tpuvr/kernels/lighting.py) must
    # match the lax.scan twin for axis-aligned and oblique directions.
    sig = smoke_sphere(12)[..., 0]
    for w in (
        np.asarray([0.0, 0.0, 1.0]),
        np.asarray([0.3, -0.2, 0.9]) / np.linalg.norm([0.3, -0.2, 0.9]),
        np.asarray([0.1, 0.9, -0.4]) / np.linalg.norm([0.1, 0.9, -0.4]),
    ):
        tau_x = _directional_tau(sig, w, impl="xla")
        tau_p = _directional_tau(sig, w, impl="pallas")
        np.testing.assert_allclose(np.asarray(tau_p), np.asarray(tau_x),
                                   atol=1e-5)


def test_tau_adjoint_pallas_matches_xla_autodiff():
    """The custom adjoint sweep (tau_sweep_adj) must equal plain autodiff
    through the lax.scan twin — per direction, on the full tau field."""
    sig = smoke_sphere(10)[..., 0]
    for w in (
        np.asarray([0.0, 0.0, 1.0]),
        np.asarray([0.25, -0.15, 0.9]) / np.linalg.norm([0.25, -0.15, 0.9]),
        np.asarray([0.1, 0.8, -0.5]) / np.linalg.norm([0.1, 0.8, -0.5]),
    ):
        def loss(s, impl):
            tau = _directional_tau(s, w, impl=impl)
            # weighted sum -> nontrivial per-plane cotangents
            wts = jnp.sin(jnp.arange(tau.size, dtype=s.dtype)).reshape(
                tau.shape
            )
            return jnp.sum(tau * wts)

        g_x = jax.grad(lambda s: loss(s, "xla"))(sig)
        g_p = jax.grad(lambda s: loss(s, "pallas"))(sig)
        np.testing.assert_allclose(np.asarray(g_p), np.asarray(g_x),
                                   atol=1e-5)


def test_lit_render_differentiable_shadows_gradcheck():
    """detach=False end-to-end: custom-VJP gradient of a lit render vs
    central finite differences (f64, XLA+Pallas impls)."""
    n = 8
    g = smoke_sphere(n, dtype=jnp.float64)
    c = (n - 1) / 2.0
    cam = OrthoCamera(
        center=(c, c, -3.0 * n), forward=(0.0, 0.0, 1.0),
        up=(0.0, 1.0, 0.0), width=1.5 * n, height=1.5 * n,
        res_x=8, res_y=8,
    )
    lcfg = LightingConfig(mode="lightvolume", n_samples=4, detach=False)
    rcfg = RenderConfig(early_stop_eps=0.0)

    def loss(grid, impl):
        rgb, _ = render_view(grid, cam, rcfg, lighting=lcfg, impl=impl)
        return jnp.sum(rgb**2)

    g_p = jax.grad(lambda x: loss(x, "pallas"))(g)
    g_x = jax.grad(lambda x: loss(x, "xla"))(g)
    np.testing.assert_allclose(np.asarray(g_p), np.asarray(g_x), atol=1e-9)
    # FD probes (density channel, where the shadow gradient lives).
    rng = np.random.default_rng(0)
    h = 1e-4
    for _ in range(6):
        idx = (int(rng.integers(1, n - 1)), int(rng.integers(1, n - 1)),
               int(rng.integers(1, n - 1)), 0)
        fd = (loss(g.at[idx].add(h), "pallas")
              - loss(g.at[idx].add(-h), "pallas")) / (2 * h)
        assert abs(float(g_p[idx]) - float(fd)) < 1e-5, (idx, g_p[idx], fd)


def test_detached_vs_differentiable_shadow_grads_differ():
    """detach=False must change density gradients (shadows contribute)."""
    n = 8
    g = smoke_sphere(n)
    c = (n - 1) / 2.0
    cam = OrthoCamera(
        center=(c, c, -3.0 * n), forward=(0.0, 0.0, 1.0),
        up=(0.0, 1.0, 0.0), width=1.5 * n, height=1.5 * n,
        res_x=8, res_y=8,
    )
    rcfg = RenderConfig(early_stop_eps=0.0)

    def grad_with(detach):
        lcfg = LightingConfig(mode="lightvolume", n_samples=4,
                              detach=detach)

        def loss(grid):
            rgb, _ = render_view(grid, cam, rcfg, lighting=lcfg)
            return jnp.mean(rgb**2)

        return jax.grad(loss)(g)

    gd = grad_with(True)
    gf = grad_with(False)
    assert float(jnp.max(jnp.abs(gd[..., 0] - gf[..., 0]))) > 1e-7
    # Emission gradients agree (lighting only scales emission).
    np.testing.assert_allclose(gd[..., 1:], gf[..., 1:], atol=1e-6)


def test_persample_mode_matches_exact_oracle():
    """mode='persample' builds the exact per-voxel light volume."""
    from tpuvr.ops.lighting import light_volume_exact

    n = 8
    g = smoke_sphere(n, dtype=jnp.float64)
    cfg = LightingConfig(mode="persample", n_samples=4, secondary_dt=0.5)
    ell = light_volume_exact(g[..., 0], cfg)
    pts = jnp.asarray([[3.0, 4.0, 2.0], [5.0, 2.0, 6.0]], jnp.float64)
    ref = light_at_points_ref(g[..., 0], pts, cfg, dt=cfg.secondary_dt)
    for p, r in zip(pts, ref):
        ix, iy, iz = int(p[0]), int(p[1]), int(p[2])
        np.testing.assert_allclose(float(ell[iz, iy, ix]), float(r),
                                   rtol=1e-10)
    lit = apply_lighting(g, cfg)
    assert lit.shape == g.shape
    # Unknown mode raises.
    import pytest

    with pytest.raises(ValueError, match="unknown lighting mode"):
        apply_lighting(g, LightingConfig(mode="bogus"))
