"""Frozen, hashable config dataclasses.

These double as static arguments to ``jax.jit`` (frozen dataclasses are
hashable), replacing the reference renderer's argv flag plumbing
(SURVEY.md §5 "Config / flag system"). The five driver configs
(BASELINE.json:6-12) are instantiated in ``configs/``.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple


@dataclasses.dataclass(frozen=True)
class RenderConfig:
    """Controls the ray-march discretization and termination.

    Attributes:
      mode: 'plane_sweep' — samples at integer-plane crossings along the
        dominant axis (the TPU-native path; each step is one slice);
        'fixed_dt' — classic fixed step size along the ray (the oracle path,
        matching the reference's per-pixel OpenCL ray-march semantics).
      step_dt: step size in voxel units for mode='fixed_dt'.
      max_steps: static number of steps for mode='fixed_dt'; if None it is
        derived from the grid diagonal at trace time.
      early_stop_eps: transmittance threshold for early ray termination (C6);
        0.0 disables ERT.
      ert_chunks: slab-chunk count for REAL early termination: > 1
        splits the slice axis into this many slabs with a lax.cond
        between them, so once every ray terminates the remaining
        slabs' kernels AND their HBM streams are skipped entirely (the
        in-kernel ERT gate only skips compute — the stream-bound bf16
        sweep measured ~1.0x from it even on opaque scenes). Wins on
        high-optical-depth scenes (see BASELINE.md ert rows); costs a
        few percent of launch overhead on transparent ones. 1 = one
        kernel for the whole sweep.
      use_occupancy: enable empty-space skipping via the coarse occupancy
        grid (C6).
      occupancy_brick: brick edge length (voxels) for the occupancy grid.
      sigma_scale: global multiplier on density before alpha conversion.
      tmin: samples with ray parameter t <= tmin are ignored (rays start at
        their origin).
      precision: matmul precision for the sweep resamples — 'highest'
        (true f32, 6 MXU passes; required for allclose vs the CPU
        oracle), 'high' (3 passes, ~1e-6 relative error, ~2x faster
        than 'highest'), or 'default' (1 bf16 pass; ~5e-3 image error,
        fastest).
      max_rows_per_call: intermediate-image rows per sweep kernel call;
        larger frames are row-chunked (tpuvr.ops.vjp.chunked_sweep) to
        bound resident VMEM. None disables chunking.
      oversample: intermediate-lattice density relative to the pixel
        grid for NON-separable cameras (rolled/tilted: the final
        bilinear warp resamples lattice rays to pixel rays). 1.0 = one
        lattice ray per pixel; 2.0 halves the warp's interpolation
        error at 4x the sweep rays (see
        tests/test_warp_oracle.py for the measured bound).
    """

    mode: str = "plane_sweep"
    precision: str = "highest"
    step_dt: float = 0.5
    max_steps: Optional[int] = None
    early_stop_eps: float = 1e-4
    ert_chunks: int = 1
    use_occupancy: bool = True
    occupancy_brick: int = 8
    sigma_scale: float = 1.0
    tmin: float = 0.0
    max_rows_per_call: Optional[int] = 512
    oversample: float = 1.0


@dataclasses.dataclass(frozen=True)
class LightingConfig:
    """Hemisphere-sampled single-scatter lighting (C4).

    Attributes:
      mode: 'none' — emission-absorption only; 'lightvolume' — precompute a
        per-voxel sky-transmittance volume by N directional sweeps, sampled
        during the primary march (the TPU-native fast path); 'persample' —
        exact N secondary marches per voxel (oracle path, slow).
      n_samples: hemisphere sample count (N=16 per BASELINE.json:9).
      sky_intensity: radiance of the sky dome.
      up: world up axis for the hemisphere, as (x, y, z).
      secondary_dt: step size (voxels) for secondary (shadow) marches.
      detach: True stops gradients at the light volume (detached
        shadows); False differentiates the lighting pass end-to-end (the
        Pallas tau sweeps carry a custom adjoint sweep).
    """

    mode: str = "none"
    n_samples: int = 16
    sky_intensity: float = 1.0
    up: Tuple[float, float, float] = (0.0, 0.0, 1.0)
    secondary_dt: float = 1.0
    detach: bool = True


@dataclasses.dataclass(frozen=True)
class MeshConfig:
    """Device mesh layout for the distributed paths (C10, C11).

    Attributes:
      data: number of devices sharding rays (replicated-grid DP path).
      zshard: number of devices sharding the grid in z-slabs (sharded-grid
        path); 1 disables grid sharding.
      grad_buckets: number of buckets for the grid-grad all-reduce
        (the non-overlapped reduction).
      bwd_chunks: slab-chunk count for the backward sweep; > 1
        all-reduces each chunk's gradient between backward kernels (the
        C10 allreduce/backward overlap). 1 disables chunking.
      grad_ring: replace the grad-reduction psums with the IN-KERNEL
        RDMA ring backward (tpuvr.kernels.ring_bwd): the all-reduce's
        remote DMAs issue between the backward kernel's own grid steps
        so the wire time hides behind slab recompute instead of
        scheduling synchronously next to the kernel. Replicated-grid
        DP path only (1-D 'data' mesh); ``bwd_chunks`` doubles as the
        ring's slab count.
    """

    data: int = 1
    zshard: int = 1
    grad_buckets: int = 4
    bwd_chunks: int = 1
    grad_ring: bool = False


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Inverse-rendering loop (C9).

    Attributes:
      lr: Adam learning rate on the voxel grid.
      steps: optimization steps.
      views_per_batch: posed views per minibatch.
      rays_per_view: if set, subsample this many rays per view per step.
      ckpt_every: checkpoint interval in steps (0 disables).
      ckpt_dir: orbax checkpoint directory.
      ckpt_bf16: cast f32 state arrays to bf16 in checkpoints (halves
        save bytes; restore casts back — one bf16 rounding of
        params/moments per resume).
      seed: PRNG seed.
      density_softplus: parameterize density through softplus for
        positivity.
      steps_per_call: train steps chained inside ONE jitted lax.scan
        dispatch. >1 runs each view group in consecutive blocks of this
        size (instead of per-step round-robin) and amortizes the
        host-device round trip over the block — on this box's tunneled
        chip the per-step dispatch+sync costs ~30 ms against a ~24 ms
        device step at the judged c4 config. Metrics/checkpoints land
        at block boundaries.
    """

    lr: float = 1e-1
    steps: int = 500
    views_per_batch: int = 8
    rays_per_view: Optional[int] = None
    ckpt_every: int = 100
    ckpt_dir: str = "/tmp/tpuvr_ckpt"
    ckpt_bf16: bool = False
    seed: int = 0
    density_softplus: bool = True
    steps_per_call: int = 1
