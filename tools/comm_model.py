#!/usr/bin/env python
"""Roofline comm model: projected multi-chip scaling efficiency (C14).

Real ≥2-chip hardware is unavailable in this container (one v5e via a
tunnel), so the 85%-at-2-hosts target (BASELINE.json:5) is projected
from first principles against MEASURED single-chip times:

  efficiency(n) = t_compute / (t_compute + t_exposed_comm)

The DP trainer's only cross-chip traffic is the grid-gradient
all-reduce: ring reduce-scatter + all-gather moves
``2 * (n-1)/n * grad_bytes`` per chip per step over ICI. With the
round-3 chunked backward (sweep_op bwd_chunks) every chunk's psum
except the LAST overlaps the remaining backward march, so the exposed
time is one chunk's all-reduce; unoverlapped, all of it is exposed.

Chip constants are public figures from "How to Scale Your Model"
(jax-ml.github.io/scaling-book): per-link ICI one-way bandwidth, links
per chip used by a 1-D ring along one torus axis.

    python tools/comm_model.py --step-ms 13.4 --grid 256 [--chunks 8]

Feed --step-ms with the measured per-step compute time from
/tmp/c4_step_bench or bench.py's train_step_ms on the v5e dev chip.
Cross-chip compute scaling (--scale-basis) defaults to the bf16 MXU
FLOPs ratio 459/197 = 2.33 (tpuvr/bench/roofline.py CHIPS): the c4
step is MXU/VPU-bound, not HBM-bound (xplane trace, BASELINE.md r3
row; VERDICT r4 weak #3 reconciliation — earlier rows mislabeled a
2.23 'HBM-BW' factor that matched no table entry). --scale-basis hbm
(2765/819 = 3.38) is the right basis only for stream-bound shapes.

The efficiency_chunked_overlap column assumes all but one chunk's
reduction hides behind backward compute. Round 5 made that assumption
REAL on the wire: MeshConfig.grad_ring routes the reduction through
in-kernel remote DMAs issued between the backward kernel's own grid
steps (kernels/ring_bwd.py; AOT schedule has zero grad collectives —
tools/overlap_evidence.py), so the modeled exposed comm (the final
slab's drain, t_allreduce/chunks) is the mechanism's true tail.
"""

from __future__ import annotations

import argparse
import json

# Public per-chip figures (scaling book, v5e/v5p pages). ICI figures are
# ONE-WAY bytes/s per link; a 1-D ring all-reduce along one torus axis
# uses one link pair per chip.
CHIPS = {
    "v5e": {"ici_link_oneway": 4.5e10, "hbm_bw": 8.1e11,
            "bf16_flops": 197e12, "f32_flops": 49e12},
    "v5p": {"ici_link_oneway": 9.0e10, "hbm_bw": 2.765e12,
            "bf16_flops": 459e12, "f32_flops": 115e12},
}


def allreduce_time(bytes_total: float, n: int, link_bw: float) -> float:
    """Ring RS+AG over one torus axis: 2 (n-1)/n * bytes / link_bw."""
    return 2.0 * (n - 1) / n * bytes_total / link_bw


def project(step_ms: float, grid_n: int, n_chips: int, chip: str,
            chunks: int, v5e_measured: bool,
            scale_basis: str = "bf16") -> dict:
    c = CHIPS[chip]
    basis = {"hbm": "hbm_bw", "bf16": "bf16_flops",
             "f32": "f32_flops"}[scale_basis]
    scale = CHIPS["v5e"][basis] / c[basis] if v5e_measured else 1.0
    t_comp = step_ms * 1e-3 * scale  # binding-resource scaling
    grad_bytes = grid_n ** 3 * 4 * 4  # 4 channels, f32
    t_ar = allreduce_time(grad_bytes, n_chips, c["ici_link_oneway"])
    # Chunked overlap: all but the last chunk's psum hides under the
    # remaining backward kernels (they are data-independent); exposed
    # comm is ~one chunk. Unoverlapped: everything is exposed.
    exposed_overlap = t_ar / max(chunks, 1)
    return {
        "chip": chip, "n_chips": n_chips,
        "t_compute_ms": round(t_comp * 1e3, 3),
        "grad_mb": round(grad_bytes / 2 ** 20, 1),
        "t_allreduce_ms": round(t_ar * 1e3, 3),
        "efficiency_unoverlapped":
            round(t_comp / (t_comp + t_ar), 4),
        "efficiency_chunked_overlap":
            round(t_comp / (t_comp + exposed_overlap), 4),
    }


def main() -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--step-ms", type=float, required=True,
                   help="measured per-step compute time (v5e dev chip)")
    p.add_argument("--grid", type=int, default=256)
    p.add_argument("--chunks", type=int, default=8,
                   help="sweep_op bwd_chunks in the overlap projection")
    p.add_argument("--chip", default="v5p", choices=sorted(CHIPS))
    p.add_argument("--no-v5e-scale", action="store_true",
                   help="--step-ms was measured on the target chip")
    p.add_argument("--scale-basis", default="bf16",
                   choices=("bf16", "f32", "hbm"),
                   help="binding resource for the cross-chip compute "
                        "scaling (c4 is MXU/VPU-bound: bf16 = 2.33x)")
    args = p.parse_args()
    rows = [
        project(args.step_ms, args.grid, n, args.chip, args.chunks,
                not args.no_v5e_scale, args.scale_basis)
        for n in (2, 8, 16)
    ]
    print(json.dumps({
        "metric": f"projected {args.chip} DP scaling, {args.grid}^3 grid",
        "measured_step_ms_v5e": args.step_ms,
        "model": "ring RS+AG over one ICI axis; exposed comm = "
                 f"t_ar (unoverlapped) or t_ar/{args.chunks} (chunked; "
                 "realized in-kernel by MeshConfig.grad_ring)",
        "scale_basis": args.scale_basis,
        "rows": rows,
        "target": "85% at 2 hosts (BASELINE.json:5)",
    }))
    return 0


if __name__ == "__main__":
    import sys

    sys.exit(main())
