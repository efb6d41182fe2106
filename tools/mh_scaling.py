#!/usr/bin/env python
"""Per-process body for the >=2-host scaling row (C13/C14).

Launched by ``tools/run_multihost_cpu.py N --scaling``: N localhost
processes x 8 virtual CPU devices under a real jax.distributed job run
``tpuvr.bench.sweep.scaling_table`` over the GLOBAL mesh. Process 0
prints one JSON line with the 1-device / 1-host / N-host rows — the
measured stand-in for pod-slice scaling on a box with one TPU chip
(BASELINE.md records the row; the v5p projection comes from
tools/comm_model.py).
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(
    coordinator_address=os.environ["TPUVR_MH_COORD"],
    num_processes=int(os.environ["TPUVR_MH_NPROC"]),
    process_id=int(os.environ["TPUVR_MH_PROC"]),
)

import numpy as np  # noqa: E402

from tpuvr.bench.sweep import scaling_table  # noqa: E402
from tpuvr.config import RenderConfig  # noqa: E402
from tpuvr.io.synth import orbit_cameras, smoke_sphere  # noqa: E402


def main() -> int:
    n = int(os.environ.get("TPUVR_MH_GRID", "64"))
    res = int(os.environ.get("TPUVR_MH_RES", "128"))
    grid = smoke_sphere(n)
    cam = orbit_cameras(1, n, res=res)[0]
    rows = scaling_table(grid, cam, RenderConfig(early_stop_eps=0.0),
                         min_wall=1.0)
    if jax.process_index() == 0:
        print(json.dumps({
            "metric": f"render scaling {n}^3 @ {res}^2 (CPU-simulated)",
            "backend": jax.default_backend(),
            "devices_per_host": jax.local_device_count(),
            "rows": [
                {k: (round(v, 4) if isinstance(v, float) else v)
                 for k, v in r.items()} for r in rows
            ],
        }), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
