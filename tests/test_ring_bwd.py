"""In-kernel RDMA ring grad all-reduce (kernels/ring_bwd.py; C10).

The REAL kernel — remote accumulating DMAs, semaphores, HBM-resident
grad buffer — runs on the 8-virtual-device CPU mesh under Pallas TPU
interpret mode (which simulates remote DMAs and semaphores across
shard_map devices; plain ``interpret=True`` cannot). Equality oracle:
the XLA-twin backward per ray shard + ``lax.psum`` — the reduction the
ring replaces. The AOT Mosaic-lowering proof for real hardware lives in
tools/overlap_evidence.py (deviceless v5e:2x4 compile).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu
from jax.sharding import Mesh, PartitionSpec as P

from tpuvr.io.synth import smoke_sphere
from tpuvr.kernels.ring_bwd import sweep_bwd_ring
from tpuvr.kernels.sweep_xla import sweep_bwd_xla, sweep_fwd_xla
from tpuvr.ops.geometry import (
    plan_sweep, plan_valid_mask, ray_dt, slice_coeffs,
)
from tpuvr.ops.render import grid_to_sweep_layout, slice_enables
from tpuvr.ref.camera import OrthoCamera, dominant_axis

# Interpret mode simulates every DMA/semaphore in Python threads —
# keep the scene tiny or the lane outruns CI (32^3 measured >880 s).
N = 16
RES = 16
D = 8


def _mesh():
    devs = jax.devices()
    if len(devs) < D:
        pytest.skip(f"needs {D} devices, have {len(devs)}")
    return Mesh(np.asarray(devs[:D]), ("data",))


def _scene(reverse_axis=False):
    grid = smoke_sphere(N, dtype=jnp.float32)
    c = (N - 1) / 2.0
    fwd = (0.0, 0.0, -1.0) if reverse_axis else (0.0, 0.0, 1.0)
    z0 = 2.0 * N if reverse_axis else -2.0 * N
    cam = OrthoCamera(center=(c, c, z0), forward=fwd,
                      up=(0.0, 1.0, 0.0), width=1.3 * N, height=1.3 * N,
                      res_x=RES, res_y=RES)
    axis = dominant_axis(cam)
    plan, _ = plan_sweep(cam, grid.shape[:3], axis)
    grid_sc = grid_to_sweep_layout(grid, axis)
    coeffs = slice_coeffs(plan, jnp.float32)
    dt_map = ray_dt(plan, jnp.float32)
    enables = slice_enables(grid_sc, plan.reverse, True)
    enables = enables * plan_valid_mask(plan, jnp.float32)
    return grid_sc, coeffs, enables, dt_map, plan


@pytest.mark.parametrize("ring_chunks", [1, 2])
@pytest.mark.parametrize("reverse_axis", [False, True])
def test_ring_grad_equals_psum_of_local_grads(ring_chunks, reverse_axis):
    mesh = _mesh()
    grid_sc, coeffs, enables, dt_map, plan = _scene(reverse_axis)
    n_v, n_u = dt_map.shape
    rows_local = n_v // D
    rng = np.random.default_rng(3)
    d_color = jnp.asarray(rng.normal(size=(3, n_v, n_u)), jnp.float32)
    d_trans = jnp.asarray(rng.normal(size=(n_v, n_u)), jnp.float32)
    ay, by, ax, bx = coeffs
    kw = dict(reverse=plan.reverse, sigma_scale=1.0,
              early_stop_eps=0.0, precision="highest")

    def body(grid_sc, ay, by, ax, bx, enables, dt_t, dC_t, dT_t):
        row_off = (jax.lax.axis_index("data") * rows_local).astype(
            jnp.float32)
        cfs = (ay, by + row_off * ay, ax, bx)
        rgb, trans = sweep_fwd_xla(grid_sc, cfs, enables, dt_t, **kw)
        g_ring = sweep_bwd_ring(
            grid_sc, cfs, enables, dt_t, rgb, trans, dC_t, dT_t,
            ring_axis="data", ring_size=D, ring_chunks=ring_chunks,
            interpret=pltpu.InterpretParams(), **kw,
        )
        g_ref = sweep_bwd_xla(grid_sc, cfs, enables, dt_t, rgb, trans,
                              dC_t, dT_t, **kw)
        g_ref = jax.lax.psum(g_ref, "data")
        # Leading device axis so the host can check ALL devices' copies.
        return g_ring[None], g_ref[None]

    g_ring, g_ref = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(P(), P(), P(), P(), P(), P(), P("data", None),
                  P(None, "data", None), P("data", None)),
        out_specs=(P("data"), P("data")),
        check_vma=False,
    )(grid_sc, ay, by, ax, bx, enables, dt_map, d_color, d_trans)
    g_ring = np.asarray(g_ring)
    g_ref = np.asarray(g_ref)
    scale = np.abs(g_ref[0]).max()
    # Every device's ring copy equals the psum (summation order differs:
    # the ring accumulates around the ring, psum reduces in XLA's order).
    for d in range(D):
        np.testing.assert_allclose(
            g_ring[d], g_ref[0], atol=1e-5 * scale, rtol=1e-5,
            err_msg=f"device {d}",
        )
    # And the psum reference itself is device-invariant (sanity).
    for d in range(1, D):
        np.testing.assert_allclose(g_ref[d], g_ref[0], rtol=1e-6)


def test_ring_grad_views_batched():
    """views=2 batch (the c4 trainer shape): stacked intermediate
    planes, per-view coeffs, one ring-reduced gradient."""
    mesh = _mesh()
    grid_sc, coeffs, enables, dt_map, plan = _scene()
    n_v, n_u = dt_map.shape
    views = 2
    ay, by, ax, bx = coeffs
    # Two "views": the same sweep with different row intercepts.
    ay2 = jnp.stack([ay, ay])
    by2 = jnp.stack([by, by + 0.37 * ay])
    ax2 = jnp.stack([ax, ax])
    bx2 = jnp.stack([bx, bx + 0.21])
    en2 = jnp.stack([enables, enables])
    dt2 = jnp.concatenate([dt_map, dt_map], axis=0)
    nv2 = 2 * n_v
    rows_local = nv2 // D  # rows per device of the STACKED plane
    v_pv_local = rows_local // views
    rng = np.random.default_rng(5)
    d_color = jnp.asarray(rng.normal(size=(3, nv2, n_u)), jnp.float32)
    d_trans = jnp.asarray(rng.normal(size=(nv2, n_u)), jnp.float32)
    kw = dict(reverse=plan.reverse, sigma_scale=1.0,
              early_stop_eps=0.0, precision="highest")

    def body(grid_sc, cfs, en2, dt_t, dC_t, dT_t):
        # Each device owns v_pv_local stacked rows PER VIEW; fold the
        # shard's per-view base row into by (group_views layout).
        ay2, by2, ax2, bx2 = cfs
        off = (jax.lax.axis_index("data") * v_pv_local).astype(
            jnp.float32)
        by_l = by2 + off * ay2
        rgbs, ts = [], []
        for w in range(views):
            sl = slice(w * v_pv_local, (w + 1) * v_pv_local)
            rgb_w, t_w = sweep_fwd_xla(
                grid_sc, (ay2[w], by_l[w], ax2[w], bx2[w]), en2[w],
                dt_t[sl], **kw)
            rgbs.append(rgb_w)
            ts.append(t_w)
        rgb = jnp.concatenate(rgbs, axis=1)
        trans = jnp.concatenate(ts, axis=0)
        g_ring = sweep_bwd_ring(
            grid_sc, (ay2, by_l, ax2, bx2), en2, dt_t, rgb, trans,
            dC_t, dT_t, views=views, ring_axis="data", ring_size=D,
            ring_chunks=2, interpret=pltpu.InterpretParams(), **kw,
        )
        g_ref = None
        for w in range(views):
            sl = slice(w * v_pv_local, (w + 1) * v_pv_local)
            g_w = sweep_bwd_xla(
                grid_sc, (ay2[w], by_l[w], ax2[w], bx2[w]), en2[w],
                dt_t[sl], rgb[:, sl], trans[sl], dC_t[:, sl], dT_t[sl],
                **kw)
            g_ref = g_w if g_ref is None else g_ref + g_w
        g_ref = jax.lax.psum(g_ref, "data")
        return g_ring[None], g_ref[None]

    # Stacked global plane: device d owns rows [d*v_pv_local, ...) of
    # EVERY view — shard the per-view row axis by reshaping the global
    # cotangents to (views, n_v, U) order-major per view, then
    # interleave so a plain P('data') row shard gives each device its
    # per-view rows. Build that layout directly: global row r of the
    # shard-stacked plane = (d, w, v_local).
    def to_shard_stacked(x, axis):
        # (.., views * n_v, ..) -> rows grouped as d-major, view, local
        xs = jnp.split(x, views, axis=axis)  # per view
        parts = []
        for d in range(D):
            for w in range(views):
                sl = [slice(None)] * x.ndim
                sl[axis] = slice(d * v_pv_local, (d + 1) * v_pv_local)
                parts.append(xs[w][tuple(sl)])
        return jnp.concatenate(parts, axis=axis)

    g_ring, g_ref = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(P(), (P(), P(), P(), P()), P(), P("data", None),
                  P(None, "data", None), P("data", None)),
        out_specs=(P("data"), P("data")),
        check_vma=False,
    )(grid_sc, (ay2, by2, ax2, bx2), en2,
      to_shard_stacked(dt2, 0), to_shard_stacked(d_color, 1),
      to_shard_stacked(d_trans, 0))
    g_ring = np.asarray(g_ring)
    g_ref = np.asarray(g_ref)
    scale = np.abs(g_ref[0]).max()
    for d in range(D):
        np.testing.assert_allclose(
            g_ring[d], g_ref[0], atol=1e-5 * scale, rtol=1e-5,
            err_msg=f"device {d}",
        )


def test_ring_race_detector_clean():
    """The interpreter's vector-clock race detector on a small config:
    no data races between the ring DMAs, the block writes, and compute."""
    mesh = _mesh()
    grid_sc, coeffs, enables, dt_map, plan = _scene()
    n_v, n_u = dt_map.shape
    rows_local = n_v // D
    d_color = jnp.ones((3, n_v, n_u), jnp.float32)
    d_trans = jnp.zeros((n_v, n_u), jnp.float32)
    ay, by, ax, bx = coeffs
    kw = dict(reverse=plan.reverse, sigma_scale=1.0,
              early_stop_eps=0.0, precision="highest")

    def body(grid_sc, ay, by, ax, bx, enables, dt_t, dC_t, dT_t):
        row_off = (jax.lax.axis_index("data") * rows_local).astype(
            jnp.float32)
        cfs = (ay, by + row_off * ay, ax, bx)
        rgb, trans = sweep_fwd_xla(grid_sc, cfs, enables, dt_t, **kw)
        return sweep_bwd_ring(
            grid_sc, cfs, enables, dt_t, rgb, trans, dC_t, dT_t,
            ring_axis="data", ring_size=D, ring_chunks=2,
            interpret=pltpu.InterpretParams(detect_races=True), **kw,
        )[None]

    g = jax.shard_map(
        body, mesh=mesh,
        in_specs=(P(), P(), P(), P(), P(), P(), P("data", None),
                  P(None, "data", None), P("data", None)),
        out_specs=P("data"),
        check_vma=False,
    )(grid_sc, ay, by, ax, bx, enables, dt_map, d_color, d_trans)
    assert np.isfinite(np.asarray(g)).all()


def test_ring_size_one_rejected():
    grid_sc, coeffs, enables, dt_map, plan = _scene()
    n_v, n_u = dt_map.shape
    with pytest.raises(ValueError, match="ring_size"):
        sweep_bwd_ring(
            grid_sc, coeffs, enables, dt_map,
            jnp.zeros((3, n_v, n_u), jnp.float32),
            jnp.ones((n_v, n_u), jnp.float32),
            jnp.ones((3, n_v, n_u), jnp.float32),
            jnp.zeros((n_v, n_u), jnp.float32),
            ring_size=1,
        )


def test_fit_grad_ring_matches_baseline(tmp_path):
    """fit_grid with MeshConfig.grad_ring wiring (XLA twin on the CPU
    mesh: backward + psum, same call shape and step structure as the
    Pallas ring path incl. check_vma=False) vs the baseline trainer:
    identical trajectories up to f32 reduction order. The REAL ring
    kernel's reduction is pinned by the equality tests above; this
    pins the trainer plumbing."""
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
    for ring in (False, True):
        _, params, hist = fit_grid(
            targets, cams, gt.shape, cfg,
            RenderConfig(early_stop_eps=0.0),
            mesh=mesh, run_dir=str(tmp_path / f"ring{ring}"),
            bwd_chunks=2, grad_ring=ring,
        )
        runs[ring] = (np.asarray(params), hist["loss"])
    np.testing.assert_allclose(runs[True][1], runs[False][1], rtol=2e-3,
                               atol=1e-7)
    np.testing.assert_allclose(runs[True][0], runs[False][0], atol=1e-4)


@pytest.mark.parametrize("case", ["softplus", "ert"])
def test_ring_grad_softplus_and_ert(case):
    """Ring backward with the fused-softplus density transform and with
    ERT enabled. Softplus: the in-kernel sigmoid chain must survive the
    ring reduction. ERT: ring rounds are COLLECTIVE — a device whose
    rays all terminate must still run every round (the ring work sits
    outside the liveness gate), or the mesh deadlocks/corrupts; the
    opaque scene here terminates different shards at different slabs."""
    mesh = _mesh()
    grid_sc, coeffs, enables, dt_map, plan = _scene()
    if case == "softplus":
        grid_sc = grid_sc - 0.5  # raw params: negative densities too
        kw = dict(reverse=plan.reverse, sigma_scale=1.0,
                  early_stop_eps=0.0, precision="highest",
                  softplus=True)
    else:
        fog = jnp.asarray([2.0, 0, 0, 0], jnp.float32)
        grid_sc = grid_sc + fog[None, :, None, None]  # dense fog: ERT
        kw = dict(reverse=plan.reverse, sigma_scale=8.0,
                  early_stop_eps=1e-3, precision="highest")
    n_v, n_u = dt_map.shape
    rows_local = n_v // D
    rng = np.random.default_rng(11)
    d_color = jnp.asarray(rng.normal(size=(3, n_v, n_u)), jnp.float32)
    d_trans = jnp.asarray(rng.normal(size=(n_v, n_u)), jnp.float32)
    ay, by, ax, bx = coeffs

    def body(grid_sc, ay, by, ax, bx, enables, dt_t, dC_t, dT_t):
        row_off = (jax.lax.axis_index("data") * rows_local).astype(
            jnp.float32)
        cfs = (ay, by + row_off * ay, ax, bx)
        rgb, trans = sweep_fwd_xla(grid_sc, cfs, enables, dt_t, **kw)
        g_ring = sweep_bwd_ring(
            grid_sc, cfs, enables, dt_t, rgb, trans, dC_t, dT_t,
            ring_axis="data", ring_size=D, ring_chunks=2,
            interpret=pltpu.InterpretParams(), **kw,
        )
        g_ref = sweep_bwd_xla(grid_sc, cfs, enables, dt_t, rgb, trans,
                              dC_t, dT_t, **kw)
        g_ref = jax.lax.psum(g_ref, "data")
        return g_ring[None], g_ref[None]

    g_ring, g_ref = jax.shard_map(
        body, mesh=mesh,
        in_specs=(P(), P(), P(), P(), P(), P(), P("data", None),
                  P(None, "data", None), P("data", None)),
        out_specs=(P("data"), P("data")),
        check_vma=False,
    )(grid_sc, ay, by, ax, bx, enables, dt_map, d_color, d_trans)
    g_ring, g_ref = np.asarray(g_ring), np.asarray(g_ref)
    scale = max(np.abs(g_ref[0]).max(), 1e-6)
    if case == "ert":
        # The Pallas dense-batched kernel gates ERT per BLOCK while the
        # XLA twin gates per SLICE: a shard's last sub-eps slices may
        # differ. Bound by the ERT error model instead of exact parity:
        # differing contributions carry transmittance < eps.
        tol = 1e-3 * scale * 8
    else:
        tol = 1e-5 * scale
    for d in range(D):
        np.testing.assert_allclose(g_ring[d], g_ref[0], atol=tol,
                                   rtol=1e-5, err_msg=f"device {d}")
