#!/usr/bin/env python
"""Measure RenderConfig.tile_skip where it claims to win (VERDICT #7).

The per-(slice, 128^2-tile) occupancy gate costs ~1.8x on dense scenes
(branches defeat Mosaic's cross-slice pipelining — measured r1, knob
default-off since) and only skips work when a whole 128-voxel-wide
slice window is empty. Its claimed habitat (config.py tile_skip doc):
LARGE grids with LOCALIZED density — a >= 512^3 hollow shell viewed
near-axis, where the banded kernel keeps full 128^2 output tiles and
interior/exterior tiles of most slices are empty.

This tool measures exactly that: 512^3 hollow shell, axis-aligned
ortho view, frame time with tile_skip on vs off (both through the
resident-volume frame loop), plus the dense smoke-sphere control where
the knob is documented to lose. The verdict lands in BASELINE.md: a
measured win keeps the knob, a loss deletes it.

    python tools/tile_skip_bench.py [--grid 512] [--res 1024]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import bench_fwd_prepared, log  # noqa: E402


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--grid", type=int, default=512)
    p.add_argument("--res", type=int, default=1024)
    p.add_argument("--precision", default="default")
    args = p.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir",
                      "/tmp/tpuvr_jax_cache_tpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    import jax.numpy as jnp

    from tpuvr.config import RenderConfig
    from tpuvr.io.synth import hollow_shell, smoke_sphere
    from tpuvr.ref.camera import OrthoCamera

    n, res = args.grid, args.res
    c = (n - 1) / 2.0
    # Axis-aligned ortho: slope ~0 -> full 128^2 banded tiles, the only
    # shape where the tile gates are defined.
    cam = OrthoCamera(center=(c, c, -2.0 * n), forward=(0.0, 0.0, 1.0),
                      up=(0.0, 1.0, 0.0), width=1.2 * n, height=1.2 * n,
                      res_x=res, res_y=res)
    out = {"metric": f"tile_skip {n}^3 @ {res}^2", "grid": n,
           "frame": res, "precision": args.precision}
    for scene, make in (("shell", hollow_shell), ("smoke", smoke_sphere)):
        grid = jax.device_put(make(n))
        for skip in (False, True):
            cfg = RenderConfig(early_stop_eps=1e-4,
                               precision=args.precision,
                               tile_skip=skip)
            t = bench_fwd_prepared(jax, jnp, grid, cam, cfg, "pallas")
            out[f"{scene}_skip_{skip}_ms"] = round(t * 1e3, 3)
            log(f"{scene} tile_skip={skip}: {t*1e3:.3f} ms/frame")
        out[f"{scene}_speedup"] = round(
            out[f"{scene}_skip_False_ms"] / out[f"{scene}_skip_True_ms"],
            3,
        )
        del grid
    print(json.dumps(out), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
