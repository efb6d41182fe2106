"""tpuvr command line: render / fit / bench / gradcheck (SURVEY.md §2.2).

The reference's ``main`` parsed argv and ran the render loop; here each
subcommand drives the library at full scale from one of the checked-in
driver configs (configs/c1..c5) with key=value overrides::

  python -m tpuvr.cli render --config c3 --out /tmp/c3.png --scale 0.25
  python -m tpuvr.cli fit --config c4 --scale 0.125 --steps 200
  python -m tpuvr.cli bench --config c1
  python -m tpuvr.cli gradcheck

``--scale`` shrinks grid/res for dev boxes; 1.0 is the judged shape.
"""

from __future__ import annotations

import argparse
import json
import logging
import sys
import time


def _load_config(name: str, scale: float, sets=None):
    import configs

    cfg = dict(configs.load(name))
    cfg["grid_n"] = max(8, int(cfg["grid_n"] * scale))
    cfg["res"] = max(8, int(cfg["res"] * scale))
    return _apply_overrides(cfg, sets or [])


def _apply_overrides(cfg, sets):
    """Apply ``--set field=value`` overrides to the config dataclasses.

    The field is looked up across the render / train / lighting /
    mesh_cfg dataclasses (plus the top-level int keys grid_n / res /
    n_views); values parse by the field's annotated type. Example:
    ``--set ert_chunks=8 --set steps_per_call=16 --set grid_n=128``.
    """
    import dataclasses

    for kv in sets:
        key, _, raw = kv.partition("=")
        if not _:
            raise SystemExit(f"--set expects key=value, got {kv!r}")
        if key in ("grid_n", "res", "n_views"):
            cfg[key] = int(raw)
            continue
        for slot in ("render", "train", "lighting", "mesh_cfg"):
            dc = cfg.get(slot)
            if dc is None or not dataclasses.is_dataclass(dc):
                continue
            fields = {f.name: f for f in dataclasses.fields(dc)}
            if key not in fields:
                continue
            cur = getattr(dc, key)
            if raw in ("None", "none"):
                val = None
            elif isinstance(cur, bool):
                val = raw.lower() in ("1", "true", "yes")
            elif isinstance(cur, int):
                val = int(raw)
            elif isinstance(cur, float):
                val = float(raw)
            else:
                # None-defaulted Optional fields and strings: try int,
                # then float, then keep the string.
                try:
                    val = int(raw)
                except ValueError:
                    try:
                        val = float(raw)
                    except ValueError:
                        val = raw
            cfg[slot] = dataclasses.replace(dc, **{key: val})
            break
        else:
            raise SystemExit(
                f"--set: no config field named {key!r} in "
                "render/train/lighting/mesh_cfg"
            )
    return cfg


def _scene_and_camera(cfg):
    from configs.common import front_ortho, orbit_persp, smoke_scene

    grid = smoke_scene(cfg["grid_n"])
    cam_kind = cfg.get("camera", "front_ortho")
    cam = (front_ortho if cam_kind == "front_ortho" else orbit_persp)(
        cfg["grid_n"], cfg["res"]
    )
    return grid, cam


def cmd_render(args):
    import numpy as np

    from tpuvr.io.image import write_png
    from tpuvr.ops.render import render_view

    cfg = _load_config(args.config, args.scale, args.sets)
    grid, cam = _scene_and_camera(cfg)
    t0 = time.time()
    rgb, trans = render_view(
        grid, cam, cfg["render"], lighting=cfg.get("lighting"),
        impl=args.impl,
    )
    rgb = np.asarray(rgb)
    dt = time.time() - t0
    print(f"rendered {cfg['res']}x{cfg['res']} in {dt:.2f}s "
          f"(incl. compile); mean {rgb.mean():.4f}")
    if args.out:
        write_png(args.out, rgb)
        print(f"wrote {args.out}")


def cmd_turntable(args):
    """Orbit render loop — the batch analog of the reference's interactive
    viewer: the volume is prepared once (layout + occupancy + lighting) and
    each frame costs exactly one sweep + pixel warp (render_prepared)."""
    import numpy as np

    from tpuvr.io.image import write_png
    from tpuvr.io.synth import orbit_cameras
    from tpuvr.ops.render import prepare_grid, render_prepared
    from tpuvr.ref.camera import dominant_axis

    import os

    cfg = _load_config(args.config, args.scale, args.sets)
    grid, _ = _scene_and_camera(cfg)
    cams = orbit_cameras(args.frames, cfg["grid_n"], res=cfg["res"])
    os.makedirs(args.out_dir, exist_ok=True)
    axes = tuple(sorted({dominant_axis(c) for c in cams}))
    prep = prepare_grid(grid, axes=axes, lighting=cfg.get("lighting"),
                        precision=cfg["render"].precision, impl=args.impl)
    t0 = time.time()
    for i, cam in enumerate(cams):
        rgb, _ = render_prepared(prep, cam, cfg["render"], impl=args.impl)
        write_png(f"{args.out_dir}/frame_{i:04d}.png", np.asarray(rgb))
    dt = time.time() - t0
    print(json.dumps({
        "frames": len(cams), "out_dir": args.out_dir,
        "s_per_frame_incl_io_and_compile": round(dt / len(cams), 4),
    }))


def cmd_fit(args):
    import jax

    from tpuvr.dist.replicated import data_mesh
    from tpuvr.io.synth import orbit_cameras
    from tpuvr.train.fit import evaluate_psnr, fit_grid, render_all_views
    from configs.common import smoke_scene

    cfg = _load_config(args.config, args.scale, args.sets)
    n = cfg["grid_n"]
    n_views = cfg.get("n_views", 16)
    tcfg = cfg["train"]
    if args.steps:
        import dataclasses

        tcfg = dataclasses.replace(tcfg, steps=args.steps)
    grid_true = smoke_scene(n)
    cams = orbit_cameras(n_views, n, res=cfg["res"])
    print(f"rendering {n_views} target views at {cfg['res']}^2 ...")
    targets = render_all_views(grid_true, cams, cfg["render"],
                               impl=args.impl)
    # Mesh selection: MeshConfig (c5-style "mesh_cfg") wins; the legacy
    # "mesh": "data" key maps to MeshConfig(data=0) (= all local devices).
    from tpuvr.config import MeshConfig

    mesh_cfg = cfg.get("mesh_cfg")
    if mesh_cfg is None and cfg.get("mesh") == "data":
        mesh_cfg = MeshConfig(data=0)
    mesh, grad_buckets, bwd_chunks, grad_ring = None, 4, 1, False
    if mesh_cfg is not None:
        grad_buckets = mesh_cfg.grad_buckets
        bwd_chunks = mesh_cfg.bwd_chunks
        grad_ring = mesh_cfg.grad_ring
        n_dev = jax.local_device_count()
        if mesh_cfg.zshard > 1 and n_dev >= 2 * mesh_cfg.zshard:
            from tpuvr.dist.sharded_grid import grid_mesh

            n_data = (mesh_cfg.data or n_dev // mesh_cfg.zshard)
            mesh = grid_mesh(n_data, mesh_cfg.zshard)
        elif n_dev > 1:
            mesh = data_mesh(mesh_cfg.data or None)
    print(f"fitting {n}^3 grid from {n_views} views "
          f"(mesh={dict(mesh.shape) if mesh else None}) ...")
    grid, params, hist = fit_grid(
        targets, cams, grid_true.shape, tcfg, cfg["render"],
        mesh=mesh, impl=args.impl, run_dir=args.run_dir,
        resume=args.resume, grad_buckets=grad_buckets,
        bwd_chunks=bwd_chunks, grad_ring=grad_ring,
    )
    psnr = evaluate_psnr(grid, cams, targets, cfg["render"], impl=args.impl)
    print(json.dumps({
        "final_loss": hist["loss"][-1], "psnr_db": psnr,
        "steps": len(hist["loss"]),
    }))


def cmd_bench(args):
    from tpuvr.bench.roofline import roofline_report
    from tpuvr.bench.sweep import scaling_table

    cfg = _load_config(args.config, args.scale, args.sets)
    grid, cam = _scene_and_camera(cfg)
    if args.profile:
        # Tracing/profiling subsystem (SURVEY.md §5): dump an xprof trace
        # of one warm frame for per-kernel cost attribution (the
        # TPU-native replacement for the reference's OpenCL event
        # profiling). View with TensorBoard's profile plugin.
        import jax

        from tpuvr.ops.render import render_view

        rgb, trans = render_view(grid, cam, cfg["render"], impl=args.impl)
        rgb.block_until_ready()
        with jax.profiler.trace(args.profile):
            rgb, trans = render_view(grid, cam, cfg["render"],
                                     impl=args.impl)
            rgb.block_until_ready()
        print(json.dumps({"trace_dir": args.profile}))
    rows = scaling_table(grid, cam, cfg["render"], impl=args.impl)
    for row in rows:
        print(json.dumps(row))
    from tpuvr.bench.roofline import measured_active_fraction

    af = measured_active_fraction(grid, cam, cfg["render"])
    rep = roofline_report(
        rows[0]["ms_per_frame"] / 1e3,
        cfg["grid_n"], cfg["grid_n"], cfg["grid_n"],
        cam.res_y, cam.res_x,
        chip=args.chip, precision=cfg["render"].precision,
        active_fraction=af,
    )
    print(json.dumps(rep))


def cmd_gradcheck(args):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from tpuvr.config import RenderConfig
    from tpuvr.io.synth import smoke_sphere
    from tpuvr.ops.render import render_view
    from tpuvr.ref.camera import look_at_perspective

    n, res = args.grid_n, args.res
    grid = smoke_sphere(n)
    c = (n - 1) / 2.0
    cam = look_at_perspective((c, c - 3.0 * n, c + 0.7 * n), (c, c, c),
                              res_x=res, res_y=res)
    rcfg = RenderConfig(early_stop_eps=0.0)

    def loss(g):
        rgb, t = render_view(g, cam, rcfg, impl=args.impl)
        return jnp.sum(rgb**2) + jnp.sum(t)

    g = jax.grad(loss)(grid)
    rng = np.random.default_rng(0)
    h, worst = 1e-3, 0.0
    for _ in range(args.probes):
        idx = tuple(int(rng.integers(0, s)) for s in grid.shape)
        fd = float(
            (loss(grid.at[idx].add(h)) - loss(grid.at[idx].add(-h)))
            / (2 * h)
        )
        worst = max(worst, abs(float(g[idx]) - fd))
    print(json.dumps({"max_abs_err_vs_fd": worst, "probes": args.probes}))


def main(argv=None):
    logging.basicConfig(level=logging.INFO, stream=sys.stderr)
    p = argparse.ArgumentParser(prog="tpuvr")
    sub = p.add_subparsers(dest="cmd", required=True)

    def common(sp):
        sp.add_argument("--config", default="c1")
        sp.add_argument("--scale", type=float, default=1.0)
        sp.add_argument("--impl", default=None,
                        choices=[None, "pallas", "xla"])
        sp.add_argument("--set", action="append", default=[],
                        metavar="FIELD=VALUE", dest="sets",
                        help="override any config dataclass field, "
                             "e.g. --set ert_chunks=8")

    sp = sub.add_parser("render", help="render one view to PNG")
    common(sp)
    sp.add_argument("--out", default=None)
    sp.set_defaults(fn=cmd_render)

    sp = sub.add_parser("turntable", help="orbit render loop to PNGs")
    common(sp)
    sp.add_argument("--frames", type=int, default=24)
    sp.add_argument("--out-dir", default="/tmp/tpuvr_turntable")
    sp.set_defaults(fn=cmd_turntable)

    sp = sub.add_parser("fit", help="inverse rendering (C9)")
    common(sp)
    sp.add_argument("--steps", type=int, default=None)
    sp.add_argument("--run-dir", default="/tmp/tpuvr_run")
    sp.add_argument("--resume", action="store_true")
    sp.set_defaults(fn=cmd_fit)

    sp = sub.add_parser("bench", help="rays/s + roofline + scaling")
    common(sp)
    sp.add_argument("--chip", default="v5e")
    sp.add_argument("--profile", default=None, metavar="DIR",
                    help="dump a jax.profiler xprof trace of one frame")
    sp.set_defaults(fn=cmd_bench)

    sp = sub.add_parser("gradcheck", help="finite-difference gradcheck")
    sp.add_argument("--grid-n", type=int, default=12)
    sp.add_argument("--res", type=int, default=16)
    sp.add_argument("--probes", type=int, default=10)
    sp.add_argument("--impl", default=None)
    sp.set_defaults(fn=cmd_gradcheck)

    args = p.parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
