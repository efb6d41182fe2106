#!/usr/bin/env python
"""Measure tile_skip where its docstring claims it wins (VERDICT r3 #4).

``RenderConfig.tile_skip`` gates each banded 128^2 output tile's window
contraction on per-slice brick occupancy. At 256^3 smoke it measured a
1.8x LOSS (the per-tile branches defeat Mosaic's cross-slice
pipelining); the docstring claims it pays off only on >= 512^3 grids
with localized density (hollow shells). This tool measures exactly that
claim on the real chip and prints one JSON line for BASELINE.md.

    python tools/feature_bench.py [--grid 512] [--res 1024]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import _timed_scan, log  # noqa: E402


def main() -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--grid", type=int, default=512)
    p.add_argument("--res", type=int, default=1024)
    p.add_argument("--scene", default="shell", choices=("shell", "smoke"))
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from tpuvr.config import RenderConfig
    from tpuvr.io.synth import hollow_shell, smoke_sphere
    from tpuvr.ops.render import prepare_grid, render_prepared
    from tpuvr.ops.vjp import resolve_impl
    from tpuvr.ref.camera import OrthoCamera, dominant_axis

    impl = resolve_impl(None)
    n, res = args.grid, args.res
    make = hollow_shell if args.scene == "shell" else smoke_sphere
    grid = jax.device_put(make(n))
    c = (n - 1) / 2.0
    cam = OrthoCamera(
        center=(c, c, -2.0 * n), forward=(0.0, 0.0, 1.0),
        up=(0.0, 1.0, 0.0), width=1.4 * n, height=1.4 * n,
        res_x=res, res_y=res,
    )
    axis = dominant_axis(cam)
    prep0 = jax.jit(lambda g: prepare_grid(g, axes=(axis,)))(grid)
    gsc, smax0, bmax = prep0[axis]

    def bench(cfg):
        def body(smax, consts):
            gsc, bmax = consts
            rgb, t = render_prepared(
                {axis: (gsc, smax, bmax)}, cam, cfg, impl=impl
            )
            return smax + jnp.mean(rgb) * 1e-30

        n_lo, n_hi = (16, 64) if n >= 512 else (64, 256)
        return _timed_scan(jax, jnp, body, (smax0, (gsc, bmax)),
                           n_lo, n_hi)

    out = {"metric": f"tile_skip {args.scene} {n}^3 @ {res}^2",
           "impl": impl, "backend": jax.default_backend()}
    for tier in ("default", "highest"):
        t_on = bench(RenderConfig(early_stop_eps=0.0, precision=tier,
                                  tile_skip=True))
        t_off = bench(RenderConfig(early_stop_eps=0.0, precision=tier,
                                   tile_skip=False))
        log(f"{tier}: tile_skip on {t_on*1e3:.3f} / off {t_off*1e3:.3f} "
            f"ms/frame (speedup {t_off/t_on:.3f}x)")
        out[f"on_ms_{tier}"] = round(t_on * 1e3, 3)
        out[f"off_ms_{tier}"] = round(t_off * 1e3, 3)
        out[f"speedup_{tier}"] = round(t_off / t_on, 3)
    print(json.dumps(out), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
