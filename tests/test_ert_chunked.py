"""Slab-chunked early ray termination (RenderConfig.ert_chunks).

The in-kernel ERT gate skips compute but not the HBM stream; slab
chunking puts a lax.cond between slice slabs so terminated frames skip
remaining kernels entirely. These tests pin:

- transparent scenes (ERT never fires): chunked == unchunked exactly
  (every slab executes; the compositing fold is the exact segment
  identity);
- opaque scenes: chunked output within the ERT error bound (skipped
  slabs would have contributed < eps transmittance-weighted color);
- gradients flow through the executed slabs (cond is differentiable)
  and match the unchunked op where no slab was skipped.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpuvr.config import RenderConfig
from tpuvr.io.synth import smoke_sphere
from tpuvr.ops.render import render_view
from tpuvr.ref.camera import OrthoCamera, look_at_perspective

N = 16
RES = 16


def _cams():
    c = (N - 1) / 2.0
    return [
        OrthoCamera(center=(c, c, -2.0 * N), forward=(0.0, 0.0, 1.0),
                    up=(0.0, 1.0, 0.0), width=1.4 * N, height=1.4 * N,
                    res_x=RES, res_y=RES),
        # reversed traversal (axis-0 dominant)
        look_at_perspective((c + 3.0 * N, c + 0.2 * N, c - 0.4 * N),
                            (c, c, c), res_x=RES, res_y=RES),
    ]


@pytest.mark.parametrize("cam_i", [0, 1])
def test_ert_chunked_transparent_exact(cam_i):
    grid = smoke_sphere(N, dtype=jnp.float32)
    cam = _cams()[cam_i]
    base = RenderConfig(early_stop_eps=1e-4, precision="highest")
    chunked = RenderConfig(early_stop_eps=1e-4, precision="highest",
                           ert_chunks=4)
    r0, t0 = render_view(grid, cam, base, impl="xla")
    r1, t1 = render_view(grid, cam, chunked, impl="xla")
    np.testing.assert_allclose(np.asarray(r1), np.asarray(r0), atol=2e-6)
    np.testing.assert_allclose(np.asarray(t1), np.asarray(t0), atol=2e-6)


def test_ert_chunked_opaque_within_bound():
    eps = 1e-3
    fog = jnp.full((N, N, N, 4), 0.5, jnp.float32)
    cam = _cams()[0]
    exact = RenderConfig(early_stop_eps=0.0, precision="highest",
                         sigma_scale=8.0)
    chunked = RenderConfig(early_stop_eps=eps, precision="highest",
                           sigma_scale=8.0, ert_chunks=4)
    r0, t0 = render_view(fog, cam, exact, impl="xla")
    r1, t1 = render_view(fog, cam, chunked, impl="xla")
    # Skipped slabs' contribution is bounded by the entering
    # transmittance (< eps) times the remaining emission.
    assert float(jnp.max(jnp.abs(r1 - r0))) < 5.0 * eps
    assert float(jnp.max(jnp.abs(t1 - t0))) < eps


def test_ert_chunked_grad_matches_unchunked():
    grid = smoke_sphere(N, dtype=jnp.float32)
    cam = _cams()[1]
    base = RenderConfig(early_stop_eps=1e-4, precision="highest")
    chunked = RenderConfig(early_stop_eps=1e-4, precision="highest",
                           ert_chunks=4)

    def loss(g, cfg):
        rgb, t = render_view(g, cam, cfg, impl="xla")
        return jnp.mean((rgb - 0.25) ** 2)

    g0 = jax.grad(lambda g: loss(g, base))(grid)
    g1 = jax.grad(lambda g: loss(g, chunked))(grid)
    assert np.isfinite(np.asarray(g1)).all()
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g0), atol=2e-6)


def test_ert_chunks_must_divide():
    grid = smoke_sphere(N, dtype=jnp.float32)
    cfg = RenderConfig(early_stop_eps=1e-4, ert_chunks=5)
    with pytest.raises(ValueError, match="ert_chunks"):
        render_view(grid, _cams()[0], cfg, impl="xla")


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_future_coverage_mask_consistent_with_kernel_tents(dtype):
    """ADVICE r4 medium: a ray the f32 mask marks uncovered must carry
    EXACTLY zero tent weight as the kernels build it — for every compute
    dtype. Before the fix the kernels evaluated positions in the compute
    dtype, so with bf16 grids row indices past 256 rounded by O(1) and a
    masked-out ray could take weight up to 1.0 (reproduced upstream:
    8/200 coeff draws). The kernels now do position arithmetic in f32
    and cast only the finished weights (sweep._interp_matrices), making
    this exact for bf16 too. This is a direct property test because
    XLA:CPU cannot execute bf16 dots (so a full bf16 render cannot run
    in the CPU lane); tests/test_tpu_onchip.py covers compiled bf16
    end-to-end."""
    from tpuvr.kernels.sweep import _interp_matrices
    from tpuvr.ops.vjp import _future_coverage_masks

    rng = np.random.default_rng(7)
    n_v = n_u = 384          # past 256: the bf16 position-rounding regime
    n_y = n_x = 384
    s, n_chunks = 8, 4
    sc = s // n_chunks
    for _ in range(50):
        ay = jnp.asarray(rng.uniform(-1.5, 1.5, s), jnp.float32)
        by = jnp.asarray(rng.uniform(-2 * n_y, 2 * n_y, s), jnp.float32)
        ax = jnp.asarray(rng.uniform(-1.5, 1.5, s), jnp.float32)
        bx = jnp.asarray(rng.uniform(-2 * n_x, 2 * n_x, s), jnp.float32)
        masks = _future_coverage_masks(
            (ay, by, ax, bx), None, n_v, n_u, n_y, n_x, sc, n_chunks,
        )
        for g in range(1, n_chunks):
            mask = np.asarray(masks[g - 1])           # (V, U) covered?
            for k in range(g * sc, s):
                mat_a, mat_b = _interp_matrices(
                    ay[k], by[k], ax[k], bx[k], n_v, n_y, n_x, n_u,
                    dtype,
                )
                w_v = np.asarray(mat_a.astype(jnp.float32)).max(axis=1)
                w_u = np.asarray(mat_b.astype(jnp.float32)).max(axis=0)
                w = w_v[:, None] * w_u[None, :]       # (V, U) weight bound
                assert float(w[~mask].max(initial=0.0)) == 0.0, (g, k)


def test_future_coverage_masks_reject_2d():
    """ADVICE r4 low: multi-view (2-D) coeffs must fail loudly, not
    silently mis-broadcast the separable coverage OR."""
    from tpuvr.ops.vjp import _future_coverage_masks

    c2 = jnp.ones((2, 8), jnp.float32)
    with pytest.raises(ValueError, match="single-view"):
        _future_coverage_masks((c2, c2, c2, c2), None, 16, 16, 16, 16,
                               2, 4)


def test_future_coverage_gate_fires_with_background_rays():
    """The liveness gate must go dead on an opaque scene even when
    background rays (which miss the volume and keep trans = 1 forever)
    are present — the regime where the unmasked ``max(trans)`` gate
    measured 0.45x (pure chunking overhead, bench r4)."""
    from tpuvr.ops.geometry import (
        band_bounds, plan_sweep, plan_valid_mask, ray_dt, slice_coeffs,
    )
    from tpuvr.ops.vjp import _future_coverage_masks, sweep_op
    from tpuvr.ref.camera import dominant_axis
    from tpuvr.ref.march import GRID_PERM

    eps = 1e-3
    fog = jnp.full((N, N, N, 4), 0.5, jnp.float32)
    cam = _cams()[0]  # ortho, width 1.4*N: corner rays miss the volume
    axis = dominant_axis(cam)
    grid_sc = jnp.transpose(fog, GRID_PERM[axis])
    plan, _ = plan_sweep(cam, fog.shape[:3], axis)
    coeffs = slice_coeffs(plan, jnp.float32)
    dt_map = ray_dt(plan, jnp.float32)
    enables = jnp.ones((grid_sc.shape[0],), jnp.float32)
    enables = enables * plan_valid_mask(plan, jnp.float32)

    n_chunks = 4
    sc = grid_sc.shape[0] // n_chunks
    masks = _future_coverage_masks(
        coeffs, enables, dt_map.shape[0], dt_map.shape[1],
        grid_sc.shape[2], grid_sc.shape[3], sc, n_chunks,
    )
    # Background rays exist and are uncovered by every later slab.
    assert not bool(masks[0].all())

    # Transmittance after chunk 0 alone (sigma_scale=8 saturates the
    # covered rays inside the first slab).
    op = sweep_op(plan.reverse, 8.0, eps, "xla", "highest",
                  band=band_bounds(plan))
    g_lo = grid_sc.shape[0] - sc if plan.reverse else 0
    _, trans0 = op(grid_sc[g_lo:g_lo + sc],
                   tuple(c[..., :sc] for c in coeffs),
                   enables[..., :sc], dt_map)
    # Unmasked gate would keep every remaining slab live ...
    assert float(jnp.max(trans0)) >= eps
    # ... the coverage-masked gate goes dead after the first slab.
    assert float(jnp.max(jnp.where(masks[0], trans0, 0))) < eps

    # And the skipping path stays within the ERT error bound.
    exact = RenderConfig(early_stop_eps=0.0, precision="highest",
                         sigma_scale=8.0)
    chunked = RenderConfig(early_stop_eps=eps, precision="highest",
                           sigma_scale=8.0, ert_chunks=n_chunks)
    r0, t0 = render_view(fog, cam, exact, impl="xla")
    r1, t1 = render_view(fog, cam, chunked, impl="xla")
    assert float(jnp.max(jnp.abs(r1 - r0))) < 5.0 * eps
    assert float(jnp.max(jnp.abs(t1 - t0))) < eps
