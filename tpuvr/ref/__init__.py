"""Pure-jnp reference math core — the correctness oracle (C12).

Everything here is straight ``jax.numpy``: it runs on CPU in float64 for
gradchecks and on TPU as the naive baseline. The Pallas kernels in
``tpuvr/kernels`` are validated against these functions to allclose on both
images and gradients.
"""

from tpuvr.ref.camera import OrthoCamera, PerspectiveCamera, camera_rays  # noqa: F401
from tpuvr.ref.composite import (  # noqa: F401
    alpha_from_sigma,
    composite_ray,
    segment_compose,
)
from tpuvr.ref.march import render_fixed_dt, render_plane_sweep  # noqa: F401
from tpuvr.ref.sample import trilinear, trilinear_scatter_add  # noqa: F401
