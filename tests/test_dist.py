"""Distributed paths on the 8-device CPU mesh (SURVEY.md §4).

Invariant: sharded render == single-device render (the mesh is a pure
parallelization, never a different algorithm).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from tpuvr.config import RenderConfig
from tpuvr.dist.replicated import data_mesh, render_view_dp
from tpuvr.io.synth import smoke_sphere
from tpuvr.ops.render import render_view
from tpuvr.ref.camera import OrthoCamera, look_at_perspective

N = 12
RES = 16


@pytest.fixture(scope="module")
def grid():
    return smoke_sphere(N)


@pytest.mark.parametrize("make_cam", [
    lambda c: OrthoCamera(
        center=(c, c, -3.0 * N), forward=(0.0, 0.0, 1.0),
        up=(0.0, 1.0, 0.0), width=1.5 * N, height=1.5 * N,
        res_x=RES, res_y=RES,
    ),
    lambda c: look_at_perspective(
        (c, c - 3.0 * N, c + 0.8 * N), (c, c, c), res_x=RES, res_y=RES
    ),
])
def test_dp_render_matches_single_device(grid, devices8, make_cam):
    cam = make_cam((N - 1) / 2.0)
    mesh = data_mesh(8)
    cfg = RenderConfig(early_stop_eps=0.0)
    rgb_dp, t_dp = render_view_dp(grid, cam, mesh, cfg)
    rgb_1, t_1 = render_view(grid, cam, cfg)
    np.testing.assert_allclose(rgb_dp, rgb_1, atol=1e-6)
    np.testing.assert_allclose(t_dp, t_1, atol=1e-6)


def test_dryrun_multichip_runs():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


def test_dp_training_matches_single_device(grid, devices8, tmp_path):
    """C10: the ray-sharded, bucketed-psum train step produces the same
    loss trajectory as the single-device step."""
    import numpy as np

    from tpuvr.config import TrainConfig
    from tpuvr.io.synth import orbit_cameras
    from tpuvr.train.fit import fit_grid, render_all_views

    cams = orbit_cameras(4, N, res=RES, elevation_deg=25.0)
    targets = render_all_views(grid, cams)
    cfg = TrainConfig(lr=5e-2, steps=8, views_per_batch=2, ckpt_every=0,
                      seed=3)
    rcfg = RenderConfig(early_stop_eps=0.0)
    _, _, hist_1 = fit_grid(
        targets, cams, grid.shape, cfg, rcfg,
        run_dir=str(tmp_path / "a"),
    )
    mesh = data_mesh(8)
    _, _, hist_dp = fit_grid(
        targets, cams, grid.shape, cfg, rcfg, mesh=mesh,
        run_dir=str(tmp_path / "b"),
    )
    # f32 reduction-order differences (bucketed psum, sharded accumulation)
    # bound the trajectory gap at ~1e-3 relative.
    np.testing.assert_allclose(hist_dp["loss"], hist_1["loss"],
                               rtol=2e-3, atol=1e-6)


def test_out_struct_vma_under_shard_map(devices8):
    """Pallas out_shapes inside shard_map(check_vma=True) must declare
    which mesh axes they vary over; kernels/_compat.out_struct derives
    that as the union of the operands' vma. Regression for the TPU-only
    failure 'vma on ShapeDtypeStruct must not be None'. (The full
    kernel-under-checked-shard_map run is TPU-only: Pallas interpret mode
    on CPU hits an unrelated vma limitation inside JAX's HLO interpreter,
    so this asserts the derivation at trace time instead; the TPU
    execution path was verified on hardware — bit-identical to the
    unsharded sweep.)"""
    import jax
    from jax.sharding import PartitionSpec as P

    from tpuvr.kernels._compat import out_struct

    mesh = data_mesh(8)

    def body(a, b):
        s = out_struct((4,), a.dtype, a, b)
        assert s.vma == frozenset({"data"}), s.vma
        s_rep = out_struct((4,), b.dtype, b)
        assert s_rep.vma == frozenset(), s_rep.vma
        return a

    jax.eval_shape(
        jax.shard_map(
            body, mesh=mesh, in_specs=(P("data"), P()),
            out_specs=P("data"),
        ),
        jnp.zeros((8, 2)), jnp.zeros((3,)),
    )
    # Outside any shard_map: empty vma, plain struct.
    x = jnp.zeros((2,))
    assert out_struct((2,), x.dtype, x).vma == frozenset()
