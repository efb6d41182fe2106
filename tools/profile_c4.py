#!/usr/bin/env python
"""Attribute the c4 train-step cost (VERDICT r2 missing #2).

Times the EXACT train step fit_grid builds for the judged c4 config
(256^3 grid, 8x 256^2 views/step) on the real chip, then decomposes it:

  step        full step (value_and_grad over 8 views + Adam)
  fwd         forward loss only (8 views)
  sweep1      one view's forward sweep kernel alone
  sweep1_fb   one view's sweep fwd+bwd alone
  warp1       one view's pixel warp alone
  layout      grid -> sweep layout transpose (+ its transpose in bwd)

across precision tiers and rays_per_view settings, using bench.py's
marginal-scan methodology (axon-safe). One JSON line per variant.

    python tools/profile_c4.py [--grid 256] [--res 256]
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
    p.add_argument("--tiers", default="highest,high,default")
    p.add_argument("--rays-per-view", type=int, default=None)
    p.add_argument("--view-batch", action="store_true",
                   help="time the view-batched step (fit_grid default)")
    p.add_argument("--fused", action="store_true",
                   help="fused-softplus layout-resident step "
                        "(fit_grid default when steps_per_call > 1)")
    p.add_argument("--trace", default=None,
                   help="capture an xplane trace of 4 steps into this "
                        "dir and print the top device ops")
    args = p.parse_args()

    import jax

    # Mosaic/XLA compiles at 256^3 cost minutes through the axon tunnel;
    # cache them across invocations so profile iterations are cheap.
    jax.config.update("jax_compilation_cache_dir", "/tmp/tpuvr_jax_cache_tpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    import jax.numpy as jnp
    import optax

    from tpuvr.config import RenderConfig, TrainConfig
    from tpuvr.io.synth import orbit_cameras, smoke_sphere
    from tpuvr.ops.vjp import resolve_impl
    from tpuvr.train.fit import (
        band_rows,
        group_views,
        init_params,
        make_train_step,
        params_to_grid,
    )

    impl = resolve_impl(None)
    n, res, n_views = args.grid, args.res, args.views
    gt = jax.device_put(smoke_sphere(n))
    cams = orbit_cameras(64, n, res=res)
    groups = group_views(cams, (n, n, n, 4))
    key = max(groups, key=lambda k: len(groups[k][0]))
    idxs, stacked, band, tiling = groups[key]
    from tpuvr.ops.warp import WarpTiling
    # The decomposition probes drive warp_to_pixels_dynamic, which
    # understands the (tiled | gather) tilings only.
    probe_tiling = tiling if isinstance(tiling, WarpTiling) else None
    n_v, n_u = stacked["dt"].shape[1], stacked["dt"].shape[2]
    log(f"group {key}: {len(idxs)} views, intermediate {n_v}x{n_u}, "
        f"band {tuple(round(b, 3) for b in band)}, tiling {tiling}")

    targets = jnp.zeros((n_views, res, res, 3), jnp.float32)
    gb0 = jax.tree.map(lambda a: a[:n_views], stacked)
    rays_step = n_views * res * res

    for tier in args.tiers.split(","):
        rcfg = RenderConfig(early_stop_eps=0.0, use_occupancy=True,
                            precision=tier)
        rows = band_rows(args.rays_per_view, n_v, n_u, 1)
        opt = optax.adam(5e-2)
        step = make_train_step(
            key, n_views, opt, rcfg, True, impl, None,
            band=band, rows=rows, warp_tiling=tiling,
            view_batch=args.view_batch,
            kernel_softplus=args.fused,
        )
        params_canon = init_params((n, n, n, 4), True)
        params0 = params_canon
        if args.fused:
            from tpuvr.ops.render import grid_to_sweep_layout as _to_sc

            params0 = jax.jit(lambda p: _to_sc(p, key[0]))(params_canon)
        opt_state0 = opt.init(params0)
        r0s = jnp.zeros((n_views,), jnp.int32)

        def step_body(carry, consts):
            params, opt_state = carry
            gb, tg = consts
            params, opt_state, loss = step(params, opt_state, gb, tg, r0s)
            return (params, opt_state)

        t_step = _timed_scan(jax, jnp, step_body,
                             ((params0, opt_state0), (gb0, targets)), 4, 16)
        log(f"[{tier}] full step: {t_step*1e3:.2f} ms "
            f"({rays_step/t_step:.3e} train rays/s)")

        if args.trace:
            from tools.trace_top import top_ops

            @jax.jit
            def steps4(carry, consts):
                for _ in range(4):
                    carry = step_body(carry, consts)
                return carry

            out = steps4((params0, opt_state0), (gb0, targets))
            jax.block_until_ready(out)  # compile outside the trace
            with jax.profiler.trace(args.trace):
                out = steps4((params0, opt_state0), (gb0, targets))
                jax.block_until_ready(out)
            rows, wall = top_ops(args.trace, 30)
            log(f"[{tier}] trace span {wall:.2f} ms (4 steps)")
            for name, ms, cnt in rows:
                log(f"  {ms:9.3f} ms x{cnt:<4d} {name[:100]}")

        # ---- decomposition (rows=None path for clarity) ----
        from tpuvr.ops.geometry import warp_to_pixels_dynamic
        from tpuvr.ops.render import grid_to_sweep_layout, slice_enables
        from tpuvr.ops.vjp import sweep_op

        axis, reverse = key[0], key[1]
        op = sweep_op(reverse, rcfg.sigma_scale, 0.0, impl, tier, band=band)
        geom1 = jax.tree.map(lambda a: a[0], gb0)
        c = geom1["coeffs"]
        coeffs1 = (c[0], c[1], c[2], c[3])

        grid0 = params_to_grid(params_canon, True)
        gsc0 = jax.jit(lambda g: grid_to_sweep_layout(g, axis))(grid0)
        en0 = jax.jit(
            lambda g: slice_enables(g, reverse, True) * geom1["valid"]
        )(gsc0)

        def fwd_body(params, consts):
            gb, tg = consts

            def loss_fn(params):
                grid = params_to_grid(params, True)
                grid_sc = grid_to_sweep_layout(grid, axis)
                enables = slice_enables(grid_sc, reverse, True)
                tot = 0.0
                for i in range(n_views):
                    gi = jax.tree.map(lambda a: a[i], gb)
                    rgb_t, t_t = op(grid_sc, tuple(gi["coeffs"]),
                                    enables * gi["valid"], gi["dt"])
                    inter = jnp.transpose(
                        jnp.concatenate([rgb_t, t_t[None]], 0), (1, 2, 0))
                    img = warp_to_pixels_dynamic(
                        inter, gi["lattice"], gi["uv"],
                        tiling=probe_tiling,
                        vbase=gi.get("wvb"), ubase=gi.get("wub"))[..., :3]
                    tot = tot + jnp.mean((img - tg[i]) ** 2)
                return tot / n_views

            return params + loss_fn(params) * 1e-30

        t_fwd = _timed_scan(jax, jnp, fwd_body,
                            (params_canon, (gb0, targets)), 4, 16)
        log(f"[{tier}] fwd-only 8 views: {t_fwd*1e3:.2f} ms")

        def sweep1_body(gsc, consts):
            en, dt = consts
            rgb_t, t_t = op(gsc, coeffs1, en, dt)
            return gsc + jnp.mean(rgb_t) * 1e-30

        t_sw1 = _timed_scan(jax, jnp, sweep1_body,
                            (gsc0, (en0, geom1["dt"])), 8, 32)
        log(f"[{tier}] 1-view sweep fwd: {t_sw1*1e3:.2f} ms")

        def sweep1_fb_body(gsc, consts):
            en, dt = consts

            def lf(g):
                rgb_t, t_t = op(g, coeffs1, en, dt)
                return jnp.mean(rgb_t)

            return gsc + jax.grad(lf)(gsc) * 1e-30

        t_sw1fb = _timed_scan(jax, jnp, sweep1_fb_body,
                              (gsc0, (en0, geom1["dt"])), 8, 32)
        log(f"[{tier}] 1-view sweep fwd+bwd: {t_sw1fb*1e3:.2f} ms")

        inter0 = jnp.zeros((n_v, n_u, 4), jnp.float32)

        def warp1_body(inter, _):
            img = warp_to_pixels_dynamic(
                inter, geom1["lattice"], geom1["uv"],
                tiling=probe_tiling,
                vbase=geom1.get("wvb"), ubase=geom1.get("wub"))
            return inter + jnp.mean(img) * 1e-30

        t_w1 = _timed_scan(jax, jnp, warp1_body, (inter0, ()), 32, 128)
        log(f"[{tier}] 1-view warp: {t_w1*1e3:.3f} ms")

        def layout_body(params, _):
            grid = params_to_grid(params, True)
            gsc = grid_to_sweep_layout(grid, axis)
            return params + jnp.mean(gsc) * 1e-30

        t_lay = _timed_scan(jax, jnp, layout_body, (params_canon, ()),
                            8, 32)
        log(f"[{tier}] softplus+layout fwd: {t_lay*1e3:.2f} ms")

        def opt_body(carry, _):
            params, opt_state = carry
            g = params * 1e-9
            updates, opt_state = opt.update(g, opt_state, params)
            return (optax.apply_updates(params, updates), opt_state)

        t_opt = _timed_scan(jax, jnp, opt_body,
                            ((params0, opt_state0), ()), 8, 32)
        log(f"[{tier}] adam update alone: {t_opt*1e3:.2f} ms")

        print(json.dumps({
            "metric": f"c4 step breakdown {n}^3@{res}^2x{n_views}",
            "tier": tier, "rows": rows, "impl": impl,
            "view_batch": args.view_batch, "fused": args.fused,
            "step_ms": round(t_step * 1e3, 2),
            "train_rays_per_s": round(rays_step / t_step, 1),
            "fwd8_ms": round(t_fwd * 1e3, 2),
            "sweep1_fwd_ms": round(t_sw1 * 1e3, 3),
            "sweep1_fwdbwd_ms": round(t_sw1fb * 1e3, 3),
            "warp1_ms": round(t_w1 * 1e3, 3),
            "layout_ms": round(t_lay * 1e3, 3),
            "adam_ms": round(t_opt * 1e3, 2),
            "n_views_group": len(idxs), "n_v": n_v, "n_u": n_u,
        }), flush=True)


if __name__ == "__main__":
    main()
