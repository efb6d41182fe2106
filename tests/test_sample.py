"""Trilinear sampling and its transpose (SURVEY.md §4 unit tier)."""

import jax
import jax.numpy as jnp
import numpy as np

from tpuvr.ref.sample import trilinear, trilinear_scatter_add


def _grid(key, shape=(5, 6, 7, 4)):
    return jax.random.normal(key, shape, dtype=jnp.float64)


def test_exact_at_voxel_centers():
    g = _grid(jax.random.PRNGKey(0))
    pts = jnp.asarray([[2.0, 3.0, 1.0], [0.0, 0.0, 0.0], [6.0, 5.0, 4.0]])
    vals = trilinear(g, pts)
    np.testing.assert_allclose(vals[0], g[1, 3, 2], rtol=1e-12)
    np.testing.assert_allclose(vals[1], g[0, 0, 0], rtol=1e-12)
    np.testing.assert_allclose(vals[2], g[4, 5, 6], rtol=1e-12)


def test_manual_8_corner_blend():
    g = _grid(jax.random.PRNGKey(1))
    p = jnp.asarray([1.25, 2.5, 3.75])
    fx, fy, fz = 0.25, 0.5, 0.75
    expected = 0.0
    for dz in (0, 1):
        for dy in (0, 1):
            for dx in (0, 1):
                w = (
                    (fx if dx else 1 - fx)
                    * (fy if dy else 1 - fy)
                    * (fz if dz else 1 - fz)
                )
                expected += w * g[3 + dz, 2 + dy, 1 + dx]
    np.testing.assert_allclose(trilinear(g, p), expected, rtol=1e-12)


def test_zero_outside_and_linear_decay_at_border():
    g = jnp.ones((4, 4, 4, 1), dtype=jnp.float64)
    # Fully outside -> 0.
    far = jnp.asarray([[10.0, 1.0, 1.0], [-2.0, 1.0, 1.0], [1.0, 1.0, 5.0]])
    np.testing.assert_allclose(trilinear(g, far), 0.0)
    # Half a voxel beyond the last center -> weight 0.5.
    edge = jnp.asarray([3.5, 1.0, 1.0])
    np.testing.assert_allclose(trilinear(g, edge), 0.5, rtol=1e-12)


def test_continuity_across_cell_boundary():
    g = _grid(jax.random.PRNGKey(2))
    eps = 1e-9
    below = trilinear(g, jnp.asarray([2.0 - eps, 1.3, 2.7]))
    above = trilinear(g, jnp.asarray([2.0 + eps, 1.3, 2.7]))
    np.testing.assert_allclose(below, above, atol=1e-7)


def test_scatter_add_is_transpose():
    # <trilinear(g, pts), v> == <g, scatter(pts, v)> for random g, v.
    kg, kp, kv = jax.random.split(jax.random.PRNGKey(3), 3)
    g = _grid(kg)
    pts = (
        jax.random.uniform(kp, (20, 3), dtype=jnp.float64)
        * jnp.asarray([8.0, 7.0, 6.0])
        - 1.0
    )  # includes out-of-range points
    v = jax.random.normal(kv, (20, 4), dtype=jnp.float64)
    lhs = jnp.sum(trilinear(g, pts) * v)
    scat = trilinear_scatter_add(g.shape, pts, v, dtype=jnp.float64)
    rhs = jnp.sum(g * scat)
    np.testing.assert_allclose(lhs, rhs, rtol=1e-12)


def test_scatter_add_matches_autodiff_vjp():
    kg, kp, kv = jax.random.split(jax.random.PRNGKey(4), 3)
    g = _grid(kg)
    pts = jax.random.uniform(kp, (15, 3), dtype=jnp.float64) * 4.0
    v = jax.random.normal(kv, (15, 4), dtype=jnp.float64)
    _, vjp = jax.vjp(lambda grid: trilinear(grid, pts), g)
    (g_auto,) = vjp(v)
    g_manual = trilinear_scatter_add(g.shape, pts, v, dtype=jnp.float64)
    np.testing.assert_allclose(g_auto, g_manual, rtol=1e-12, atol=1e-12)
