#!/usr/bin/env python
"""Run the judged driver configs at full scale on the real chip.

VERDICT.md (round 1) item 1: C7/C9/C15 (BASELINE.json:9-11) must be
measurements, not paper claims. Subcommands:

  c3   256^3 @ 512^2 with the N=16 hemisphere light volume (config c3):
       lit frame cost (bake outside the frame, the production loop),
       bake cost per grid update, and an everything-per-frame number.
  c5   512^3 @ 1024^2 lit forward (config c5 single-chip slice): rays/s
       at the three precision tiers via chunked_sweep, plus fwd+bwd.
  c4   full-size inverse rendering (config c4): recover a 256^3 grid
       from 64 posed 256^2 views; reports PSNR (train + held-out),
       steady-state train-step time / rays/s, writes PNG artifacts.

Each subcommand prints one JSON line to stdout (details on stderr); rows
are transcribed into BASELINE.md by hand.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import _timed_scan, log  # noqa: E402  (repo-root bench harness)

TIERS = ("default", "high", "highest")  # bf16 / 3-pass ~f32 / true f32


def _scene(n: int, res: int, scene: str = "smoke"):
    import jax

    from tpuvr.io.synth import hollow_shell, smoke_sphere
    from tpuvr.io.synth import orbit_cameras

    make = hollow_shell if scene == "shell" else smoke_sphere
    grid = jax.device_put(make(n))
    cam = orbit_cameras(1, n, res=res)[0]
    return grid, cam


def bench_lit_frame(jax, jnp, grid, cam, cfg, lcfg, impl):
    """Per-frame cost with the light volume baked OUTSIDE the frame loop
    (the production structure: bake per grid update, sweep per frame)."""
    from tpuvr.ops.render import prepare_grid, render_prepared
    from tpuvr.ref.camera import dominant_axis

    axis = dominant_axis(cam)
    prep0 = jax.jit(
        lambda g: prepare_grid(g, axes=(axis,), lighting=lcfg,
                               precision=cfg.precision)
    )(grid)
    gsc, smax0 = prep0[axis]

    def body(smax, consts):
        (gsc,) = consts
        rgb, t = render_prepared({axis: (gsc, smax)}, cam, cfg,
                                 impl=impl)
        return smax + jnp.mean(rgb) * 1e-30

    n_lo, n_hi = (16, 64) if grid.shape[0] >= 512 else (64, 256)
    return _timed_scan(jax, jnp, body, (smax0, (gsc,)), n_lo, n_hi)


def bench_bake(jax, jnp, grid, lcfg, precision, impl):
    """Per-grid-update cost of the hemisphere light-volume bake alone."""
    from tpuvr.ops.lighting import light_volume

    def body(g, _):
        lv = light_volume(g[..., 0], lcfg, precision, impl=impl)
        # Chain frames through an O(1) probe of the bake output.
        return g + jnp.mean(lv) * 1e-30

    n_lo, n_hi = (4, 16) if grid.shape[0] >= 512 else (8, 32)
    return _timed_scan(jax, jnp, body, (grid, ()), n_lo, n_hi)


def bench_lit_e2e(jax, jnp, grid, cam, cfg, lcfg, impl):
    """Everything per frame: bake + layout + occupancy + sweep."""
    from tpuvr.ops.render import render_view

    def body(g, _):
        rgb, t = render_view(g, cam, cfg, lighting=lcfg, impl=impl)
        return g + jnp.mean(rgb) * 1e-30

    n_lo, n_hi = (4, 16) if grid.shape[0] >= 512 else (8, 32)
    return _timed_scan(jax, jnp, body, (grid, ()), n_lo, n_hi)


def bench_lit_fwd_bwd(jax, jnp, grid, cam, cfg, lcfg, impl):
    """Lit training-step fwd+bwd: grad w.r.t. the raw grid THROUGH the
    differentiable bake (LightingConfig.detach=False exercises the
    tau-sweep adjoint kernels at full scale)."""
    from tpuvr.ops.render import prepare_grid, render_prepared
    from tpuvr.ref.camera import dominant_axis

    axis = dominant_axis(cam)

    def body(g, _):
        def loss(g):
            prep = prepare_grid(g, axes=(axis,), lighting=lcfg,
                                precision=cfg.precision)
            rgb, t = render_prepared(prep, cam, cfg, impl=impl)
            return jnp.mean((rgb - 0.25) ** 2)

        grads = jax.grad(loss)(g)
        return g + grads * 1e-30

    n_lo, n_hi = (4, 16) if grid.shape[0] >= 512 else (8, 32)
    return _timed_scan(jax, jnp, body, (grid, ()), n_lo, n_hi)


def _save_lit_png(jax, grid, cam, cfg, lcfg, impl, name):
    """Judged-config lit frame artifact (VERDICT r2 hygiene item)."""
    import numpy as np

    from tpuvr.io.image import write_png
    from tpuvr.ops.render import render_view

    rgb, _ = render_view(grid, cam, cfg, lighting=lcfg, impl=impl)
    path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "..", "artifacts",
        name,
    )
    path = os.path.normpath(path)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    write_png(path, np.asarray(rgb))
    log(f"wrote {path}")
    return path


def cmd_c3(args):
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/tpuvr_jax_cache_tpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    import jax.numpy as jnp

    from tpuvr.config import LightingConfig, RenderConfig
    from tpuvr.ops.vjp import resolve_impl

    impl = resolve_impl(None)
    n, res = (args.grid, args.res)
    grid, cam = _scene(n, res)
    lcfg = LightingConfig(mode="lightvolume", n_samples=16)
    lcfg_diff = LightingConfig(mode="lightvolume", n_samples=16,
                               detach=False)
    rays = res * res
    out = {"metric": f"c3 lit fwd {n}^3@{res}^2", "unit": "rays/s",
           "grid": n, "frame": res, "n_samples": 16, "impl": impl,
           "backend": jax.default_backend()}
    for tier in TIERS:
        cfg = RenderConfig(early_stop_eps=1e-4, precision=tier)
        t_frame = bench_lit_frame(jax, jnp, grid, cam, cfg, lcfg, impl)
        log(f"c3 lit frame ({tier}): {t_frame*1e3:.3f} ms")
        t_bake = bench_bake(jax, jnp, grid, lcfg, tier, impl)
        log(f"c3 bake ({tier}): {t_bake*1e3:.3f} ms")
        out[f"lit_frame_ms_{tier}"] = round(t_frame * 1e3, 3)
        out[f"bake_ms_{tier}"] = round(t_bake * 1e3, 3)
        out[f"lit_rays_per_s_{tier}"] = round(rays / t_frame, 1)
    cfg = RenderConfig(early_stop_eps=1e-4, precision="default")
    t_e2e = bench_lit_e2e(jax, jnp, grid, cam, cfg, lcfg, impl)
    log(f"c3 e2e incl bake (default): {t_e2e*1e3:.3f} ms")
    out["e2e_ms_default"] = round(t_e2e * 1e3, 3)
    t_fb = bench_lit_fwd_bwd(jax, jnp, grid, cam, cfg, lcfg_diff, impl)
    log(f"c3 lit fwd+bwd detach=False (default): {t_fb*1e3:.3f} ms")
    out["lit_fwd_bwd_ms_default"] = round(t_fb * 1e3, 3)
    out["lit_fwd_bwd_rays_per_s_default"] = round(rays / t_fb, 1)
    out["value"] = out["lit_rays_per_s_default"]
    out["vs_baseline"] = round(out["value"] / 5e7, 4)
    out["artifact"] = _save_lit_png(
        jax, grid, cam, RenderConfig(early_stop_eps=1e-4), lcfg, impl,
        f"c3_lit_{n}cubed_{res}sq.png",
    )
    print(json.dumps(out), flush=True)


def cmd_c5(args):
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/tpuvr_jax_cache_tpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    import jax.numpy as jnp

    from tpuvr.config import LightingConfig, RenderConfig
    from tpuvr.ops.vjp import resolve_impl

    impl = resolve_impl(None)
    n, res = (args.grid, args.res)
    grid, cam = _scene(n, res)
    lcfg = LightingConfig(mode="lightvolume", n_samples=16)
    rays = res * res
    out = {"metric": f"c5 lit fwd {n}^3@{res}^2", "unit": "rays/s",
           "grid": n, "frame": res, "n_samples": 16, "impl": impl,
           "backend": jax.default_backend()}
    tiers = TIERS if not args.fast else ("default",)
    for tier in tiers:
        cfg = RenderConfig(early_stop_eps=1e-4, precision=tier)
        t_frame = bench_lit_frame(jax, jnp, grid, cam, cfg, lcfg, impl)
        log(f"c5 lit frame ({tier}): {t_frame*1e3:.3f} ms "
            f"({rays/t_frame:.3e} rays/s)")
        out[f"lit_frame_ms_{tier}"] = round(t_frame * 1e3, 3)
        out[f"lit_rays_per_s_{tier}"] = round(rays / t_frame, 1)
    cfg = RenderConfig(early_stop_eps=1e-4, precision="default")
    t_bake = bench_bake(jax, jnp, grid, lcfg, "default", impl)
    log(f"c5 bake (default): {t_bake*1e3:.3f} ms")
    out["bake_ms_default"] = round(t_bake * 1e3, 3)
    if not args.fast:
        lcfg_d = LightingConfig(mode="lightvolume", n_samples=16,
                                detach=True)
        t_fb = bench_lit_fwd_bwd(jax, jnp, grid, cam, cfg, lcfg_d, impl)
        log(f"c5 lit fwd+bwd detached (default): {t_fb*1e3:.3f} ms")
        out["lit_fwd_bwd_ms_default"] = round(t_fb * 1e3, 3)
        out["lit_fwd_bwd_rays_per_s_default"] = round(rays / t_fb, 1)
    out["value"] = out["lit_rays_per_s_default"]
    out["vs_baseline"] = round(out["value"] / 5e7, 4)
    out["artifact"] = _save_lit_png(
        jax, grid, cam, RenderConfig(early_stop_eps=1e-4), lcfg, impl,
        f"c5_lit_{n}cubed_{res}sq.png",
    )
    print(json.dumps(out), flush=True)


def cmd_c4(args):
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/tpuvr_jax_cache_tpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    import jax.numpy as jnp

    from tpuvr.config import RenderConfig, TrainConfig
    from tpuvr.io.image import write_png
    from tpuvr.io.synth import orbit_cameras, smoke_sphere
    from tpuvr.ops.vjp import resolve_impl
    from tpuvr.train.fit import evaluate_psnr, fit_grid
    from tpuvr.utils.metrics import psnr

    impl = resolve_impl(None)
    n, res, n_views = args.grid, args.res, 64
    run_dir = args.run_dir
    os.makedirs(run_dir, exist_ok=True)
    gt = jax.device_put(smoke_sphere(n))
    cams = orbit_cameras(n_views, n, res=res)
    # Held-out views: different elevation, never trained on.
    eval_cams = orbit_cameras(8, n, res=res, elevation_deg=35.0)

    log(f"c4: rendering {n_views} target views at {res}^2 ...")
    render_cfg = RenderConfig(early_stop_eps=0.0, use_occupancy=True,
                              precision=args.precision)
    target_cfg = RenderConfig(early_stop_eps=0.0, use_occupancy=True,
                              precision="highest")
    from tpuvr.train.fit import render_views_grouped

    # One compiled program per view group (not per camera): 72 target
    # renders would otherwise be 72 multi-minute remote compiles on
    # this box's tunneled backend.
    targets = np.asarray(render_views_grouped(gt, cams, target_cfg, impl))
    eval_targets = np.asarray(
        render_views_grouped(gt, eval_cams, target_cfg, impl))

    cfg = TrainConfig(lr=args.lr, steps=args.steps,
                      views_per_batch=args.views_per_batch,
                      rays_per_view=args.rays_per_view,
                      steps_per_call=args.steps_per_call,
                      # r5: halve the save cadence and bf16 the state
                      # (VERDICT r4 weak #7: each orbax save fetched
                      # ~768 MB through the tunnel at ~30 s; 2 bf16
                      # saves cut the wall stall ~4x at one bf16
                      # rounding per resume).
                      ckpt_every=max(args.steps // 2, 1),
                      ckpt_bf16=True,
                      ckpt_dir=os.path.join(run_dir, "ckpt"))
    opt = None
    if args.mu_bf16:
        # Adam is HBM-bound (2.43 ms of the 17.2 ms step moves
        # params+mu+nu+grad at ~SoL); bf16 mu drops a full-grid f32
        # stream. Opt-in until PSNR parity is confirmed per config.
        import optax
        import jax.numpy as _jnp

        opt = optax.adam(args.lr, mu_dtype=_jnp.bfloat16)
    t0 = time.time()
    grid, params, history = fit_grid(
        targets, cams, (n, n, n, 4), cfg, render_cfg,
        impl=impl, run_dir=run_dir, opt=opt,
    )
    wall = time.time() - t0

    # Steady-state step time from the metrics JSONL. Records within one
    # steps_per_call block share a wall stamp, so step time = MEDIAN
    # block delta / block size: the median excludes compiles AND the
    # periodic orbax checkpoint saves (which on this box fetch ~768 MB
    # of state through the axon tunnel, ~30 s each — a tunnel artifact,
    # not step cost; the mean-based figure is reported alongside).
    recs = [json.loads(l) for l in
            open(os.path.join(run_dir, "metrics.jsonl"))]
    walls = sorted({round(r["wall_s"], 6) for r in recs})
    K = max(args.steps_per_call, 1)
    if len(walls) > 4:
        deltas = np.diff(np.asarray(walls))
        deltas = deltas[deltas > 0]
        t_step = float(np.median(deltas)) / K
    else:
        t_step = ((recs[-1]["wall_s"] - recs[0]["wall_s"])
                  / max(len(recs) - 1, 1))
    half = len(recs) // 2
    t_step_mean = ((recs[-1]["wall_s"] - recs[half]["wall_s"])
                   / max(len(recs) - 1 - half, 1))
    # Rays actually marched per step: with rays_per_view subsampling the
    # sweep renders a `rows`-high intermediate band per view (n_v = res
    # at oversample 1.0 for these non-separable orbit cameras).
    from tpuvr.train.fit import band_rows

    rows = band_rows(args.rays_per_view, res, res, 1)
    rays_per_step = cfg.views_per_batch * (rows or res) * res
    train_rays = rays_per_step / t_step

    psnr_train = evaluate_psnr(grid, cams[::8], targets[::8], target_cfg,
                               impl)
    psnr_eval = evaluate_psnr(grid, eval_cams, eval_targets, target_cfg,
                              impl)
    log(f"c4: wall {wall:.1f}s, steady step {t_step*1e3:.1f} ms, "
        f"PSNR train {psnr_train:.2f} dB / held-out {psnr_eval:.2f} dB")

    from tpuvr.ops.render import render_view

    pred0 = np.asarray(render_view(grid, cams[0], target_cfg,
                                   impl=impl)[0])
    panel = np.concatenate([targets[0], pred0], axis=1)
    png = os.path.join(run_dir, "c4_fit_view0_target_vs_pred.png")
    write_png(png, panel)
    pred_e = np.asarray(render_view(grid, eval_cams[0], target_cfg,
                                    impl=impl)[0])
    panel_e = np.concatenate([eval_targets[0], pred_e], axis=1)
    png_e = os.path.join(run_dir, "c4_fit_heldout_target_vs_pred.png")
    write_png(png_e, panel_e)
    log(f"c4: wrote {png} and {png_e}")

    out = {
        "metric": f"c4 fit {n}^3 from {n_views}x{res}^2 views",
        "value": round(train_rays, 1), "unit": "train rays/s",
        "vs_baseline": round(train_rays / 5e7, 4),
        "steps": args.steps, "precision": args.precision,
        "views_per_batch": args.views_per_batch,
        "rays_per_view": args.rays_per_view,
        "steps_per_call": args.steps_per_call,
        "psnr_train_db": round(float(psnr_train), 2),
        "psnr_heldout_db": round(float(psnr_eval), 2),
        "step_ms": round(t_step * 1e3, 2),
        "step_ms_incl_ckpt_stalls": round(t_step_mean * 1e3, 2),
        "wall_s": round(wall, 1),
        "final_loss": history["loss"][-1],
        "grid": n, "frame": res, "impl": impl,
        "backend": jax.default_backend(),
        "artifact": png,
    }
    print(json.dumps(out), flush=True)


def main():
    p = argparse.ArgumentParser(description=__doc__)
    sub = p.add_subparsers(dest="cmd", required=True)
    p3 = sub.add_parser("c3")
    p3.add_argument("--grid", type=int, default=256)
    p3.add_argument("--res", type=int, default=512)
    p3.set_defaults(fn=cmd_c3)
    p5 = sub.add_parser("c5")
    p5.add_argument("--grid", type=int, default=512)
    p5.add_argument("--res", type=int, default=1024)
    p5.add_argument("--fast", action="store_true")
    p5.set_defaults(fn=cmd_c5)
    p4 = sub.add_parser("c4")
    p4.add_argument("--grid", type=int, default=256)
    p4.add_argument("--res", type=int, default=256)
    p4.add_argument("--steps", type=int, default=2000)
    p4.add_argument("--lr", type=float, default=5e-2)
    p4.add_argument("--precision", default="highest")
    p4.add_argument("--views-per-batch", type=int, default=8)
    p4.add_argument("--rays-per-view", type=int, default=None)
    p4.add_argument("--steps-per-call", type=int, default=16)
    p4.add_argument("--run-dir", default="/tmp/tpuvr_c4")
    p4.add_argument("--mu-bf16", action="store_true",
                    help="bf16 Adam mu. MEASURED SLOWER at c4 (18.75 "
                         "vs 17.19 ms/step, 2026-08-21): the cast "
                         "round-trips break XLA's fused Adam and cost "
                         "more than the saved f32 stream. Kept opt-in "
                         "as the honest negative; PSNR parity held "
                         "(52.04/33.69).")
    p4.set_defaults(fn=cmd_c4)
    args = p.parse_args()
    args.fn(args)


if __name__ == "__main__":
    main()
