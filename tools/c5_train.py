#!/usr/bin/env python
"""c5-shaped TRAINING step: 512^3 grid, 1024^2 LIT views, on one chip.

Config c5 (BASELINE.json:11) is a *training* configuration — sharded
rays, overlapped grid-grad allreduce, single-scatter lighting — whose
forward half has run on-chip since round 3 (BASELINE.md c5 rows) but
whose inverse-rendering step had never executed anywhere (VERDICT r4
missing #2). This tool runs it REPLICATED on the dev chip: a few Adam
steps of lit inverse rendering at full scale, loss decreasing, step
time and HBM high-water mark recorded.

Memory budget on the 16 GB v5e (f32): params 2 GB + Adam mu (bf16,
optax mu_dtype) 1 GB + nu 2 GB + grad 2 GB + lit grid 2 GB + sweep
layout 2 GB + light volume 0.5 GB + activations ~1 GB — feasible only
with density_softplus=False (params ARE the grid; the materialized
softplus pass would add another full-grid buffer) and donated state.
The multi-chip version of this config is exercised by the z-sharded
CPU-mesh trainer (tools/zsharded_512.py) and the grad-ring AOT
schedule (tools/overlap_evidence.py).

    python tools/c5_train.py [--steps 4] [--views 4] [--res 1024]
        [--grid 512] [--light-samples 16] [--precision default]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=4)
    p.add_argument("--views", type=int, default=4)
    p.add_argument("--res", type=int, default=1024)
    p.add_argument("--grid", type=int, default=512)
    p.add_argument("--light-samples", type=int, default=16)
    p.add_argument("--precision", default="default")
    p.add_argument("--steps-per-call", type=int, default=2)
    args = p.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir",
                      "/tmp/tpuvr_jax_cache_tpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    from tpuvr.config import LightingConfig, RenderConfig, TrainConfig
    from tpuvr.io.synth import orbit_cameras, smoke_sphere
    from tpuvr.train.fit import fit_grid, render_views_grouped

    n, res = args.grid, args.res
    lcfg = LightingConfig(mode="lightvolume",
                          n_samples=args.light_samples)
    rcfg = RenderConfig(early_stop_eps=1e-4, precision=args.precision)
    grid_true = smoke_sphere(n)
    cams = orbit_cameras(args.views, n, res=res)

    t0 = time.time()
    targets = np.asarray(render_views_grouped(
        grid_true, cams, rcfg, lighting=lcfg))
    print(f"lit targets: {targets.shape} in {time.time()-t0:.1f}s",
          file=sys.stderr, flush=True)
    del grid_true

    cfg = TrainConfig(
        lr=3e-2, steps=args.steps, views_per_batch=1, ckpt_every=0,
        density_softplus=False,  # HBM: no materialized softplus pass
        steps_per_call=args.steps_per_call, seed=0,
    )
    # density_softplus=False + zero density = dead relu gradients;
    # start from a faint uniform fog instead (the same escape the
    # softplus parameterization provides implicitly).
    import jax.numpy as jnp

    params0 = jnp.full((n, n, n, 4), 0.5, jnp.float32)
    params0 = params0.at[..., 0].set(0.01)
    import optax

    opt = optax.adam(cfg.lr, mu_dtype=jnp.bfloat16)  # -1 GB at 512^3
    t0 = time.time()
    grid, params, hist = fit_grid(
        targets, cams, (n, n, n, 4), cfg, rcfg,
        run_dir="/tmp/tpuvr_c5_train", lighting=lcfg,
        params_init=params0, opt=opt,
    )
    wall = time.time() - t0
    losses = [float(x) for x in hist["loss"]]
    stats = jax.local_devices()[0].memory_stats() or {}
    out = {
        "metric": f"c5 lit train step {n}^3 @ {res}^2",
        "steps": args.steps,
        "losses": losses,
        "loss_decreasing": bool(losses[-1] < losses[0]),
        "wall_s": round(wall, 1),
        "wall_per_step_ms": round(wall / max(args.steps, 1) * 1e3, 1),
        "step_ms_steady": round(
            float(np.median(np.diff(hist["t"]))) * 1e3, 1
        ) if "t" in hist and len(hist.get("t", [])) > 2 else None,
        "hbm_peak_gb": round(
            stats.get("peak_bytes_in_use", 0) / 2 ** 30, 2),
        "precision": args.precision,
        "light_samples": args.light_samples,
    }
    print(json.dumps(out), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
