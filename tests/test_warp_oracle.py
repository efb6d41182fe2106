"""Warp-approximation bound vs a TRUE per-pixel oracle (C5/C12).

The production perspective path marches a regular intermediate lattice
of base-plane rays and bilinearly warps to pixel rays. The other oracle
tests (tests/test_kernel_vs_ref.py) march the SAME lattice and apply
the SAME warp — they validate the implementation, not the
lattice+warp approximation itself. This file marches the ACTUAL pixel
rays (per-pixel f64 plane-sweep, non-separable rolled camera) and
bounds the full sweep+warp output against it at oversample 1.0 / 2.0:

    oversample 1.0:  max |err| ~ 4.0e-2   (this scene, 64^3 @ 64^2)
    oversample 2.0:  max |err| ~ 1.3e-2   (~3.3x: bilinear is O(h^2))
    oversample 4.0:  max |err| ~ 4.1e-3

The default stays 1.0: one lattice ray per pixel matches the judged
throughput configs, and the O(h^2) knob (RenderConfig.oversample) is
there when a scene needs the tighter bound.
"""

import jax.numpy as jnp
import numpy as np

from tpuvr.config import RenderConfig
from tpuvr.io.synth import smoke_sphere
from tpuvr.ops.render import render_view
from tpuvr.ref.camera import camera_rays, dominant_axis, look_at_perspective
from tpuvr.ref.march import render_plane_sweep

N = 64


def _scene():
    c = (N - 1) / 2.0
    # Rolled + tilted perspective: genuinely non-separable, the final
    # bilinear warp is active (a separable camera would bypass it).
    cam = look_at_perspective(
        (c + 0.3 * N, c - 2.5 * N, c + 0.9 * N), (c, c, c),
        up=(0.15, 0.2, 1.0), res_x=64, res_y=64,
    )
    return smoke_sphere(N), cam


def test_warp_error_bound_vs_per_pixel_oracle():
    grid, cam = _scene()
    o, d = camera_rays(cam, dtype=jnp.float64)
    rgb_o, t_o = render_plane_sweep(
        grid.astype(jnp.float64), o, d, axis=dominant_axis(cam),
        cfg=RenderConfig(early_stop_eps=0.0),
    )
    errs = {}
    for ov, bound in ((1.0, 6e-2), (2.0, 2e-2)):
        cfg = RenderConfig(early_stop_eps=0.0, oversample=ov)
        rgb, t = render_view(grid, cam, cfg)
        e = max(float(jnp.abs(rgb - rgb_o).max()),
                float(jnp.abs(t - t_o).max()))
        assert e < bound, f"oversample {ov}: {e} >= {bound}"
        errs[ov] = e
    # O(h^2) convergence: doubling the lattice should cut the worst
    # pixel error by clearly more than 2x.
    assert errs[2.0] < errs[1.0] / 2.0
