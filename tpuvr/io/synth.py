"""Synthetic scenes and posed-view fixtures.

Replaces the reference's volume file loader for tests and benches: the
driver configs (BASELINE.json:7) specify a synthetic smoke-sphere density
grid, so no data files are needed (SURVEY.md §4 "Fixtures/fakes").
"""

from __future__ import annotations

import math
from typing import List

import jax.numpy as jnp

from tpuvr.ref.camera import look_at_perspective


def smoke_sphere(n: int, dtype=jnp.float32):
    """Asymmetric smoke-sphere voxel field of shape (n, n, n, 4).

    Two smooth Gaussian density lobes (one off-center so the scene is
    rotation-sensitive for inverse rendering) with a position-dependent
    emission color ramp. Smooth everywhere => good for convergence and
    finite-difference tests.
    """
    c = (n - 1) / 2.0
    ax = jnp.arange(n, dtype=dtype)
    z, y, x = jnp.meshgrid(ax, ax, ax, indexing="ij")

    def lobe(cx, cy, cz, radius, amp):
        r2 = (x - cx) ** 2 + (y - cy) ** 2 + (z - cz) ** 2
        return amp * jnp.exp(-r2 / (2.0 * radius**2))

    # Amplitudes scale ~1/n so the optical depth through the core is
    # resolution-independent (~tau = amp * 0.22n * sqrt(2*pi) ≈ 3.3): dense
    # enough to exercise ERT, thin enough that a 1-voxel-step quadrature
    # stays within a few percent of the exact integral.
    sigma = lobe(c, c, c, 0.3 * n, 6.0 / n)
    sigma = sigma + lobe(c + 0.18 * n, c - 0.1 * n, c + 0.12 * n, 0.15 * n, 3.0 / n)

    ramp = (x + y + z) / (3.0 * max(n - 1, 1))
    r = 0.9 * ramp + 0.1
    g = 0.5 * jnp.ones_like(ramp)
    b = 1.0 - 0.8 * ramp
    return jnp.stack([sigma, r, g, b], axis=-1).astype(dtype)


def orbit_cameras(
    n_views: int,
    grid_n: int,
    res: int = 64,
    fov_y: float = math.radians(40.0),
    elevation_deg: float = 20.0,
    distance_factor: float = 2.2,
) -> List:
    """``n_views`` perspective cameras orbiting the grid center (C9 fixture).

    Cameras sit on a tilted circle at ``distance_factor * grid_n`` from the
    center, all looking at the center — the 64-posed-views setup of the
    inverse-rendering config (BASELINE.json:10).
    """
    c = (grid_n - 1) / 2.0
    dist = distance_factor * grid_n
    elev = math.radians(elevation_deg)
    cams = []
    for i in range(n_views):
        az = 2.0 * math.pi * i / n_views
        eye = (
            c + dist * math.cos(az) * math.cos(elev),
            c + dist * math.sin(az) * math.cos(elev),
            c + dist * math.sin(elev),
        )
        cams.append(
            look_at_perspective(
                eye, (c, c, c), fov_y=fov_y, res_x=res, res_y=res
            )
        )
    return cams


def hollow_shell(n: int, r0: float = 0.35, width: float = 0.06,
                 amp: float | None = None, dtype=jnp.float32):
    """Hollow spherical shell with EXACTLY zero density off the shell.

    The stress scene for per-(slice, tile) empty-space skipping: every
    slice through the sphere touches density (slice-level skipping does
    nothing) yet most of each slice — and the entire interior — is empty.
    Density is a truncated raised cosine over ``|r - r0*n| < width*n``
    (smooth inside the band, identically zero outside). Emission ramps
    like :func:`smoke_sphere`.
    """
    import math as _math

    c = (n - 1) / 2.0
    ax = jnp.arange(n, dtype=dtype)
    z, y, x = jnp.meshgrid(ax, ax, ax, indexing="ij")
    r = jnp.sqrt((x - c) ** 2 + (y - c) ** 2 + (z - c) ** 2)
    d = jnp.abs(r - r0 * n)
    w = width * n
    if amp is None:
        amp = 24.0 / n  # ~ tau 1.5 through one shell wall
    sigma = jnp.where(
        d < w, amp * 0.5 * (1.0 + jnp.cos(_math.pi * d / w)), 0.0
    )
    ramp = (x + y + z) / (3.0 * max(n - 1, 1))
    rgb = jnp.stack(
        [0.9 * ramp + 0.1, 0.5 * jnp.ones_like(ramp), 1.0 - 0.8 * ramp],
        axis=-1,
    )
    return jnp.concatenate([sigma[..., None], rgb], axis=-1).astype(dtype)
