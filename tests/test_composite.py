"""Compositing identities (SURVEY.md §4 unit tier)."""

import jax
import jax.numpy as jnp
import numpy as np

from tpuvr.ref.composite import (
    alpha_from_sigma,
    composite_ray,
    composite_step,
    segment_compose,
)


def _rand_segment(key, shape=(5,)):
    kc, kt = jax.random.split(key)
    c = jax.random.uniform(kc, (*shape, 3), dtype=jnp.float64)
    t = jax.random.uniform(kt, shape, dtype=jnp.float64)
    return c, t


def test_segment_compose_associative():
    keys = jax.random.split(jax.random.PRNGKey(0), 3)
    a, b, c = (_rand_segment(k) for k in keys)
    left = segment_compose(segment_compose(a, b), c)
    right = segment_compose(a, segment_compose(b, c))
    np.testing.assert_allclose(left[0], right[0], rtol=1e-12)
    np.testing.assert_allclose(left[1], right[1], rtol=1e-12)


def test_segment_identity():
    a = _rand_segment(jax.random.PRNGKey(1))
    ident = (jnp.zeros_like(a[0]), jnp.ones_like(a[1]))
    for out in (segment_compose(ident, a), segment_compose(a, ident)):
        np.testing.assert_allclose(out[0], a[0])
        np.testing.assert_allclose(out[1], a[1])


def test_composite_ray_matches_sequential_steps():
    key = jax.random.PRNGKey(2)
    k1, k2, k3 = jax.random.split(key, 3)
    n, s = 7, 11
    rgbs = jax.random.uniform(k1, (n, s, 3), dtype=jnp.float64)
    sigmas = jax.random.uniform(k2, (n, s), dtype=jnp.float64) * 3.0
    dts = jax.random.uniform(k3, (n, s), dtype=jnp.float64) * 0.5 + 0.1

    color = jnp.zeros((n, 3), dtype=jnp.float64)
    trans = jnp.ones((n,), dtype=jnp.float64)
    for i in range(s):
        color, trans = composite_step(
            color, trans, rgbs[:, i], sigmas[:, i], dts[:, i]
        )
    c2, t2 = composite_ray(rgbs, sigmas, dts)
    np.testing.assert_allclose(color, c2, rtol=1e-12)
    np.testing.assert_allclose(trans, t2, rtol=1e-12)


def test_weights_plus_final_transmittance_is_one():
    # With unit emission, accumulated color + final T == 1 per channel.
    key = jax.random.PRNGKey(3)
    sigmas = jax.random.uniform(key, (4, 9), dtype=jnp.float64) * 2.0
    rgbs = jnp.ones((4, 9, 3), dtype=jnp.float64)
    c, t = composite_ray(rgbs, sigmas, 0.3)
    np.testing.assert_allclose(c + t[..., None], 1.0, rtol=1e-12)


def test_transmittance_monotone_decreasing():
    sigmas = jnp.abs(jax.random.normal(jax.random.PRNGKey(4), (16,))) + 0.1
    trans = jnp.ones(())
    prev = 1.0
    for s in sigmas:
        trans = trans * jnp.exp(-s * 0.5)
        assert float(trans) < prev
        prev = float(trans)


def test_alpha_range():
    sig = jnp.linspace(0.0, 100.0, 50, dtype=jnp.float64)
    a = alpha_from_sigma(sig, 0.7)
    assert float(a[0]) == 0.0
    assert np.all((np.asarray(a) >= 0.0) & (np.asarray(a) <= 1.0))
    assert np.all(np.diff(np.asarray(a)) >= 0.0)
