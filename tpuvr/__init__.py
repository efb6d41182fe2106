"""tpuvr — a TPU-native differentiable volume renderer.

A brand-new framework with the capabilities of the reference
``cl-volume-renderer/cl-volume-renderer`` (a C/C++ + OpenCL per-pixel
ray-marching volume renderer; mount was empty at build time, capability
contract reconstructed in SURVEY.md from BASELINE.json), re-designed
TPU-first rather than ported:

- the hot ray-march is a *plane-sweep*: samples are taken where rays cross
  integer grid planes along the view's dominant axis, so every march step is
  a separable 2D slice resample expressed as MXU matmuls (no vector gathers,
  TPU's historic weak spot), with front-to-back transmittance compositing in
  VPU registers (see ``tpuvr/kernels``);
- gradients w.r.t. voxel density and emission are analytic via a custom VJP
  that re-runs the sweep backward with O(1) state (no per-step activation
  storage, no scatter-add: each slice's gradient is a dense matmul);
- rays tile and shard across TPU meshes via ``jax.sharding`` + ``shard_map``
  with grid gradients all-reduced over ICI (``tpuvr/dist``);
- a pure-``jnp`` reference marcher (``tpuvr/ref``) is the correctness oracle
  for images and gradients.

Layering (bottom-up): ref -> kernels -> ops -> dist -> train -> bench/cli.
"""

__version__ = "0.1.0"

import os as _os


def _setup_compilation_cache():
    """Persist XLA compiles across processes (compiles on this dev setup go
    through a remote helper at ~minutes each; the cache makes them one-time).
    Disable with TPUVR_NO_CACHE=1."""
    if _os.environ.get("TPUVR_NO_CACHE"):
        return
    import jax

    try:
        jax.config.update(
            "jax_compilation_cache_dir",
            _os.environ.get("TPUVR_CACHE_DIR", "/tmp/tpuvr_jax_cache"),
        )
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:  # pragma: no cover - older jax without these flags
        pass


_setup_compilation_cache()

from tpuvr.config import (  # noqa: F401
    LightingConfig,
    MeshConfig,
    RenderConfig,
    TrainConfig,
)
