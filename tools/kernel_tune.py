#!/usr/bin/env python
"""Micro-sweep of sweep-kernel knobs at the judged c4 shape.

The c4 train step is dominated by the dense sweep kernels (profile:
8-view fwd 7.05 ms + bwd ~14.5 ms of a 23.7 ms step, 2026-08-20), and
the 1-view fwd runs at ~28% MXU utilization — so kernel-level knobs
(slice block size, view batching, exp variant) are where step time
lives. Times sweep_fwd / sweep_bwd directly (device-marginal scan,
bench.py methodology) across variants and prints one JSON line each.

    python tools/kernel_tune.py [--grid 256] [--views 8] [--blocks 2,4,8]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import _timed_scan, log  # noqa: E402


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--grid", type=int, default=256)
    p.add_argument("--res", type=int, default=256)
    p.add_argument("--views", type=int, default=8)
    p.add_argument("--blocks", default="2,4,8,16")
    p.add_argument("--tier", default="default")
    args = p.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/tpuvr_jax_cache_tpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    import jax.numpy as jnp

    from tpuvr.io.synth import orbit_cameras, smoke_sphere
    from tpuvr.kernels.sweep import sweep_fwd
    from tpuvr.kernels.sweep_bwd import sweep_bwd
    from tpuvr.ops.render import grid_to_sweep_layout, slice_enables
    from tpuvr.train.fit import group_views

    n, res, views = args.grid, args.res, args.views
    tier = args.tier
    grid = smoke_sphere(n)
    cams = orbit_cameras(64, n, res=res)
    groups = group_views(cams, (n, n, n, 4))
    key = max(groups, key=lambda k: len(groups[k][0]))
    idxs, stacked, band, _ = groups[key]
    axis, reverse = key[0], key[1]
    gsc = jax.device_put(
        jax.jit(lambda g: grid_to_sweep_layout(g, axis))(grid)
    )
    en_slice = jax.jit(lambda g: slice_enables(g, reverse, True))(gsc)

    gb = jax.tree.map(lambda a: a[:views], stacked)
    c = gb["coeffs"]  # (views, 4, S)
    ay, by, ax, bx = c[:, 0], c[:, 1], c[:, 2], c[:, 3]
    en = en_slice[None, :] * gb["valid"]
    dt = gb["dt"]  # (views, V, U)
    k_v, n_v, n_u = dt.shape
    dt_flat = dt.reshape(k_v * n_v, n_u)
    rng = np.random.default_rng(0)
    d_rgb = jnp.asarray(rng.random((3, k_v * n_v, n_u), dtype=np.float32))
    d_t = jnp.asarray(rng.random((k_v * n_v, n_u), dtype=np.float32))
    rays = k_v * res * res

    def report(name, t, extra=None):
        row = {"metric": f"kernel_tune {name}", "grid": n, "views": k_v,
               "tier": tier, "ms": round(t * 1e3, 3),
               "rays_per_s": round(rays / t, 1)}
        row.update(extra or {})
        print(json.dumps(row), flush=True)

    blocks = [int(b) for b in args.blocks.split(",")]
    for block in blocks:
        kw = dict(reverse=reverse, sigma_scale=1.0, early_stop_eps=0.0,
                  precision=tier, block=block)

        # Per-view loop: k sequential 1-view fwd sweeps.
        def fwd_loop(g, consts):
            acc = 0.0
            for w in range(k_v):
                rgb, t = sweep_fwd(
                    g, (ay[w], by[w], ax[w], bx[w]), en[w], dt[w],
                    band=band, **kw)
                acc = acc + jnp.mean(rgb)
            return g + acc * 1e-30

        t_loop = _timed_scan(jax, jnp, fwd_loop, (gsc, ()), 4, 16)
        report(f"fwd loop block={block}", t_loop)

        # Dense view-batched fwd.
        def fwd_batch(g, consts):
            rgb, t = sweep_fwd(
                g, (ay, by, ax, bx), en, dt_flat, band=band,
                views=k_v, **kw)
            return g + jnp.mean(rgb) * 1e-30

        t_b = _timed_scan(jax, jnp, fwd_batch, (gsc, ()), 4, 16)
        report(f"fwd dbatch block={block}", t_b)

        # Per-view loop bwd (fwd residuals precomputed once outside).
        outs = [
            sweep_fwd(gsc, (ay[w], by[w], ax[w], bx[w]), en[w], dt[w],
                      band=band, **kw)
            for w in range(k_v)
        ]

        def bwd_loop(g, consts):
            acc = None
            for w in range(k_v):
                gr = sweep_bwd(
                    g, (ay[w], by[w], ax[w], bx[w]), en[w], dt[w],
                    outs[w][0], outs[w][1],
                    d_rgb[:, w * n_v:(w + 1) * n_v],
                    d_t[w * n_v:(w + 1) * n_v], band=band, **kw)
                acc = gr if acc is None else acc + gr
            return g + acc * 1e-30

        t_bl = _timed_scan(jax, jnp, bwd_loop, (gsc, ()), 4, 16)
        report(f"bwd loop block={block}", t_bl)

        cb, tb = sweep_fwd(gsc, (ay, by, ax, bx), en, dt_flat,
                           band=band, views=k_v, **kw)

        def bwd_batch(g, consts):
            gr = sweep_bwd(
                g, (ay, by, ax, bx), en, dt_flat, cb, tb, d_rgb, d_t,
                band=band, views=k_v, **kw)
            return g + gr * 1e-30

        t_bb = _timed_scan(jax, jnp, bwd_batch, (gsc, ()), 4, 16)
        report(f"bwd dbatch block={block}", t_bb)


if __name__ == "__main__":
    main()
