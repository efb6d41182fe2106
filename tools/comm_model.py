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
/tmp/c4_step_bench or bench.py's train_step_ms on the v5e dev chip;
--v5p scales compute by the v5p/v5e HBM-bandwidth ratio (the sweep is
bandwidth-bound; see tpuvr/bench/roofline.py).
"""

from __future__ import annotations

import argparse
import json

# Public per-chip figures (scaling book, v5e/v5p pages). ICI figures are
# ONE-WAY bytes/s per link; a 1-D ring all-reduce along one torus axis
# uses one link pair per chip.
CHIPS = {
    "v5e": {"ici_link_oneway": 4.5e10, "hbm_bw": 8.1e11},
    "v5p": {"ici_link_oneway": 9.0e10, "hbm_bw": 2.765e12},
}


def allreduce_time(bytes_total: float, n: int, link_bw: float) -> float:
    """Ring RS+AG over one torus axis: 2 (n-1)/n * bytes / link_bw."""
    return 2.0 * (n - 1) / n * bytes_total / link_bw


def project(step_ms: float, grid_n: int, n_chips: int, chip: str,
            chunks: int, v5e_measured: bool) -> dict:
    c = CHIPS[chip]
    scale = CHIPS["v5e"]["hbm_bw"] / c["hbm_bw"] if v5e_measured else 1.0
    t_comp = step_ms * 1e-3 * scale  # bandwidth-bound scaling
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
    args = p.parse_args()
    rows = [
        project(args.step_ms, args.grid, n, args.chip, args.chunks,
                not args.no_v5e_scale)
        for n in (2, 8, 16)
    ]
    print(json.dumps({
        "metric": f"projected {args.chip} DP scaling, {args.grid}^3 grid",
        "measured_step_ms_v5e": args.step_ms,
        "model": "ring RS+AG over one ICI axis; exposed comm = "
                 f"t_ar (unoverlapped) or t_ar/{args.chunks} (chunked)",
        "rows": rows,
        "target": "85% at 2 hosts (BASELINE.json:5)",
    }))
    return 0


if __name__ == "__main__":
    import sys

    sys.exit(main())
