"""Scaling sweep: rays/s at 1 chip, 1 host, N hosts (C13/C14).

Frames are chained through a data dependency and the wall clock closes
over a host readback (async queues on some dev runtimes return from
block_until_ready before remote execution completes — see bench.py).
"""

from __future__ import annotations

import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from tpuvr.config import RenderConfig
from tpuvr.dist.replicated import data_mesh, render_view_dp
from tpuvr.ops.render import render_view


def _readback(out):
    """Host-sync on ALL local shards, then fetch one.

    ``block_until_ready`` blocks on every addressable shard — fetching
    only shard 0's data would leave other local devices' work queued
    and weaken the one-frame-in-flight serialization ``sync_each``
    exists to provide on the CPU multi-process lane."""
    jax.block_until_ready(out)
    if getattr(out, "is_fully_addressable", True):
        return np.asarray(out)
    shards = out.addressable_shards
    if len(shards):
        return np.asarray(shards[0].data)
    return out


def _time_chained(step, grid, min_wall: float = 2.0,
                  sync_each: bool = False):
    g, out = step(grid)
    _readback(out)
    iters = 4
    while True:
        g = grid
        t0 = time.time()
        for _ in range(iters):
            g, out = step(g)
            if sync_each:
                # Collective-heavy multi-device programs starve the CPU
                # backend's rendezvous if many frames are queued; force
                # one frame in flight at a time.
                _readback(out)
        _readback(out)
        wall = time.time() - t0
        if wall >= min_wall or iters >= 4096:
            return wall / iters
        iters *= 4


def scaling_table(grid, cam, cfg: RenderConfig = RenderConfig(),
                  impl: Optional[str] = None, min_wall: float = 2.0):
    """rays/s at 1 device and at all local devices (and notes the host
    count for multi-host runs). Returns a list of row dicts."""
    rays = cam.res_x * cam.res_y
    rows = []

    @jax.jit
    def step1(g):
        rgb, _ = render_view(g, cam, cfg, impl=impl)
        return g + jnp.mean(rgb) * 1e-12, rgb

    t1 = _time_chained(step1, grid, min_wall)
    rows.append({
        "devices": 1, "hosts": 1, "ms_per_frame": t1 * 1e3,
        "rays_per_s": rays / t1, "efficiency": 1.0,
    })

    n_local = jax.local_device_count()
    if n_local > 1 and cam.res_y % n_local == 0:
        # THIS process's devices (data_mesh slices the global list, which
        # under multi-process would hand every process process-0's
        # devices).
        from jax.sharding import Mesh

        mesh = Mesh(np.asarray(jax.local_devices()[:n_local]), ("data",))

        @jax.jit
        def stepn(g):
            rgb, _ = render_view_dp(g, cam, mesh, cfg, impl=impl)
            return g + jnp.mean(rgb) * 1e-12, rgb

        sync_each = jax.default_backend() == "cpu"
        tn = _time_chained(stepn, grid, min_wall, sync_each=sync_each)
        rows.append({
            "devices": n_local, "hosts": 1, "ms_per_frame": tn * 1e3,
            "rays_per_s": rays / tn,
            "efficiency": (rays / tn) / (n_local * rays / t1),
        })

    n_glob = jax.device_count()
    if jax.process_count() > 1 and cam.res_y % n_glob == 0:
        # >= 2 hosts (C14): the SAME SPMD program over the global mesh —
        # rows sharded across every process's devices, grid replicated.
        # Every process must execute this branch (gang-scheduled);
        # jax.distributed must already be initialized
        # (tpuvr.dist.init.initialize / tools/run_multihost_cpu.py).
        mesh_g = data_mesh(None)

        @jax.jit
        def stepg(g):
            rgb, _ = render_view_dp(g, cam, mesh_g, cfg, impl=impl)
            return g + jnp.mean(rgb) * 1e-12, rgb

        sync_each = jax.default_backend() == "cpu"
        tg = _time_chained(stepg, grid, min_wall, sync_each=sync_each)
        rows.append({
            "devices": n_glob, "hosts": jax.process_count(),
            "ms_per_frame": tg * 1e3, "rays_per_s": rays / tg,
            "efficiency": (rays / tg) / (n_glob * rays / t1),
        })
    return rows
