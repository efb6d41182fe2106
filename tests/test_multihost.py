"""Multi-host invariants (SURVEY.md §4) — runs only under a real
``jax.distributed`` job (N>=2 processes). Two ways to get one:

  - localhost CPU (no pod needed):  python tools/run_multihost_cpu.py 2
    (2 processes x 8 virtual CPU devices, gloo cross-process collectives)
  - a real pod slice: run pytest on each host after
    tpuvr.dist.init.initialize().

Under plain single-process pytest these skip.
"""

import jax
import numpy as np
import pytest

multihost = pytest.mark.skipif(
    jax.process_count() < 2, reason="needs >=2 hosts (jax.distributed)"
)


@multihost
def test_global_render_consistent_across_hosts():
    import jax.numpy as jnp

    from tpuvr.config import RenderConfig
    from tpuvr.dist.replicated import data_mesh, render_view_dp
    from tpuvr.io.synth import smoke_sphere
    from tpuvr.ref.camera import look_at_perspective

    n = 32
    grid = smoke_sphere(n)
    c = (n - 1) / 2.0
    cam = look_at_perspective(
        (c, c - 3.0 * n, c + 0.8 * n), (c, c, c),
        res_x=jax.device_count() * 8, res_y=jax.device_count() * 8,
    )
    from jax.experimental.multihost_utils import process_allgather

    mesh = data_mesh()
    rgb, t = render_view_dp(grid, cam, mesh, RenderConfig())
    # Every host computes the same global image.
    digest = float(jnp.sum(rgb))
    digests = np.asarray(process_allgather(jnp.asarray([digest]))).ravel()
    assert digests.shape[0] == jax.process_count()
    np.testing.assert_allclose(digests, digests[0], rtol=1e-6)


@multihost
def test_training_loss_matches_single_host_batch():
    """Invariant (SURVEY.md §4): the loss curve at the same global batch
    is host-count independent. Each process recomputes the single-host
    (mesh=None, purely local) trajectory from the same seed and compares
    the multi-host mesh run against it step by step."""
    from tpuvr.config import RenderConfig, TrainConfig
    from tpuvr.dist.replicated import data_mesh
    from tpuvr.io.synth import orbit_cameras, smoke_sphere
    from tpuvr.train.fit import fit_grid, render_all_views

    n = 16
    grid_true = smoke_sphere(n)
    cams = orbit_cameras(4, n, res=16)
    targets = render_all_views(grid_true, cams)
    cfg = TrainConfig(lr=5e-2, steps=4, views_per_batch=2, ckpt_every=0,
                      seed=3)
    _, _, hist = fit_grid(
        targets, cams, grid_true.shape, cfg,
        RenderConfig(early_stop_eps=0.0), mesh=data_mesh(),
        run_dir="/tmp/tpuvr_mh",
    )
    _, _, hist_local = fit_grid(
        targets, cams, grid_true.shape, cfg,
        RenderConfig(early_stop_eps=0.0), mesh=None,
        run_dir="/tmp/tpuvr_mh_local",
    )
    assert np.isfinite(hist["loss"]).all()
    # f32 reduction-order differences (bucketed psum, row-sharded
    # accumulation) bound the gap; same tolerance as tests/test_dist.py.
    np.testing.assert_allclose(hist["loss"], hist_local["loss"],
                               rtol=2e-3, atol=1e-6)
