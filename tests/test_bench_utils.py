"""Roofline model + overlap/bootstrap utilities (C13; SURVEY.md §5)."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from tpuvr.bench.roofline import CHIPS, project, roofline_report, sweep_cost
from tpuvr.dist.init import bucketed_psum_grads
from tpuvr.dist.replicated import data_mesh


def test_sweep_cost_scales():
    f1, b1 = sweep_cost(64, 64, 64, 256, 256)
    f2, b2 = sweep_cost(128, 64, 64, 256, 256)
    assert f2 == 2 * f1 and b2 == 2 * b1
    fb, bb = sweep_cost(64, 64, 64, 256, 256, backward=True)
    assert fb == 3 * f1 and bb == 3 * b1


def test_roofline_report_consistency():
    rep = roofline_report(1e-3, 64, 64, 64, 256, 256, chip="v5e")
    assert rep["bound"] in ("compute", "memory")
    assert 0 < rep["sol_fraction"] < 1.0  # 1 ms is far from SoL at 64^3
    assert rep["rays_per_s"] == 256 * 256 / 1e-3
    # Achieved numbers never exceed... (they can exceed peak only if the
    # frame time is below speed of light — which sol_fraction flags).
    assert rep["achieved_tflops"] == rep["flops_per_frame"] / 1e-3 / 1e12


def test_project_across_chips():
    t_v5e = 4e-3
    t_v5p = project(t_v5e, "v5e", "v5p", precision="highest")
    assert t_v5p < t_v5e
    np.testing.assert_allclose(
        t_v5p, t_v5e * CHIPS["v5e"].f32_tflops / CHIPS["v5p"].f32_tflops
    )


def test_bucketed_psum_equals_single_psum(devices8):
    # Per-device distinct gradient grids (leading axis = device), reduced
    # to one replicated grid — the replicated-DP grad pattern.
    mesh = data_mesh(8)
    x = jnp.arange(8 * 16 * 4, dtype=jnp.float32).reshape(8, 16, 4)

    def run(nb):
        return jax.shard_map(
            lambda xs: bucketed_psum_grads(xs[0], "data", nb),
            mesh=mesh, in_specs=P("data"), out_specs=P(),
        )(x)

    ref = jax.shard_map(
        lambda xs: jax.lax.psum(xs[0], "data"),
        mesh=mesh, in_specs=P("data"), out_specs=P(),
    )(x)
    for nb in (1, 3, 4):
        np.testing.assert_allclose(run(nb), ref)
