"""NaN/float sanitizer lane (SURVEY.md §5 'race detection / sanitizers').

TPU Pallas has no ASAN/TSAN; the designed-in substitutes are (a) Pallas
interpret mode as the bounds/semantics sanitizer (the kernel parity
tests), (b) shard_map's static collective checking, and (c) this lane:
the differentiable render under ``jax.debug_nans`` and the XLA twin
under ``checkify.float_checks`` — asserting both that clean inputs run
clean AND that a poisoned grid is actually caught (the hook is live,
not decorative).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpuvr.config import RenderConfig
from tpuvr.io.synth import smoke_sphere
from tpuvr.ops.render import render_view
from tpuvr.ref.camera import look_at_perspective


def _cam(n, res=16):
    c = (n - 1) / 2.0
    return look_at_perspective(
        (c, c - 3.0 * n, c + 0.5 * n), (c, c, c), res_x=res, res_y=res
    )


def _loss(grid, cam, impl):
    rgb, t = render_view(grid, cam, RenderConfig(early_stop_eps=0.0),
                         impl=impl)
    return jnp.mean((rgb - 0.3) ** 2) + jnp.mean(t)


@pytest.mark.parametrize("impl", ["pallas", "xla"])
def test_render_grad_clean_under_debug_nans(impl):
    """fwd+bwd of the differentiable render raises nothing under
    jax_debug_nans on a clean grid — and DOES raise on a poisoned one
    (proving the sanitizer sees through the custom VJP). The poisoned
    assertion runs on the XLA impl only: debug_nans' de-optimized nan
    hunt recurses without bound through Pallas interpret-mode's nested
    jits (a JAX infra limitation, order-dependent on the jit caches),
    while the clean-path check — the CI sanitizer's actual job — is
    stable for both impls."""
    n = 16
    grid = smoke_sphere(n)
    cam = _cam(n)
    # Poison OUTSIDE the debug_nans scope (the .set(nan) itself is a
    # benign nan-producing op that would trip the checker). Poison an
    # EMISSION channel at the volume center: a density NaN would
    # propagate into the occupancy slice-max, whose `nan > 0` enable
    # comes out False — empty-space skipping would mask it.
    bad = grid.at[n // 2, n // 2, n // 2, 1].set(jnp.nan)
    jax.block_until_ready(bad)
    jax.config.update("jax_debug_nans", True)
    try:
        f = jax.jit(jax.value_and_grad(lambda g: _loss(g, cam, impl)))
        val, g = f(grid)
        assert np.isfinite(float(val))
        assert np.isfinite(np.asarray(g)).all()
        if impl == "xla":
            # Fresh jit wrapper: the nan check runs on the compile/slow
            # path; a warmed C++ fast-path call would skip it.
            f2 = jax.jit(
                jax.value_and_grad(lambda g: _loss(g, cam, impl))
            )
            with pytest.raises(FloatingPointError):
                jax.block_until_ready(f2(bad))
    finally:
        jax.config.update("jax_debug_nans", False)


def test_xla_twin_checkify_float_checks():
    """checkify(float_checks) over the XLA-twin render: clean grid ->
    no error; NaN grid -> a reported NaN error."""
    from jax.experimental import checkify

    n = 16
    grid = smoke_sphere(n)
    cam = _cam(n)
    checked = checkify.checkify(
        lambda g: _loss(g, cam, "xla"), errors=checkify.float_checks
    )
    err, out = checked(grid)
    err.throw()  # no error on clean input
    assert np.isfinite(float(out))
    err_bad, _ = checked(grid.at[1, 1, 1, 0].set(jnp.nan))
    with pytest.raises(checkify.JaxRuntimeError):
        err_bad.throw()
