"""Front-to-back emission-absorption compositing math (C2).

The reference renderer's per-pixel compositing loop (reconstructed OpenCL
kernel, SURVEY.md §1.1) maintains accumulated color C and transmittance T:

    alpha_i = 1 - exp(-sigma_i * dt_i)
    C      += T * alpha_i * c_i
    T      *= 1 - alpha_i

The segment-merge operator ``(C1, T1) ⊕ (C2, T2) = (C1 + T1*C2, T1*T2)`` is
associative; this is load-bearing for the spatially-sharded grid path, where
per-device ray segments fold over a device ring in depth order exactly like
online-softmax partials in ring attention (SURVEY.md §5 "long-context").
"""

from __future__ import annotations

import jax.numpy as jnp


def alpha_from_sigma(sigma, dt):
    """Opacity of a homogeneous segment: ``1 - exp(-sigma * dt)``."""
    return 1.0 - jnp.exp(-sigma * dt)


def composite_step(color_acc, trans, sample_rgb, sigma, dt):
    """One front-to-back step. Returns updated ``(color_acc, trans)``.

    Shapes: ``color_acc``/``sample_rgb`` (..., 3); ``trans``/``sigma``/``dt``
    (...,) or broadcastable.
    """
    att = jnp.exp(-sigma * dt)
    alpha = 1.0 - att
    color_acc = color_acc + (trans * alpha)[..., None] * sample_rgb
    trans = trans * att
    return color_acc, trans


def segment_compose(seg_a, seg_b):
    """Associative merge of two consecutive ray segments (a in front of b).

    ``seg = (C, T)`` with C (..., 3) and T (...,). Front-to-back:
    ``(Ca + Ta*Cb, Ta*Tb)``.
    """
    ca, ta = seg_a
    cb, tb = seg_b
    return ca + ta[..., None] * cb, ta * tb


def composite_ray(rgbs, sigmas, dts):
    """Composite a whole ray given per-sample emissions and densities.

    Args:
      rgbs: (..., S, 3) per-sample emission.
      sigmas: (..., S) per-sample density.
      dts: (..., S) or scalar per-sample segment length.

    Returns:
      (color (..., 3), transmittance (...,)).

    Closed form via prefix-exclusive transmittance:
      T_i = exp(-sum_{j<i} sigma_j dt_j),  C = sum_i T_i * alpha_i * rgb_i.
    """
    tau = sigmas * dts
    # Exclusive prefix sum of optical depth along the sample axis.
    tau_cum = jnp.cumsum(tau, axis=-1)
    t_excl = jnp.exp(-(tau_cum - tau))
    alpha = 1.0 - jnp.exp(-tau)
    w = t_excl * alpha
    color = jnp.sum(w[..., None] * rgbs, axis=-2)
    trans = jnp.exp(-tau_cum[..., -1])
    return color, trans
