"""Multi-host bootstrap + gradient-allreduce overlap (C10, SURVEY.md §5).

The reference is single-process; the TPU-native equivalent of a comms
backend is ``jax.distributed.initialize()`` (one process per host, gang-
scheduled SPMD) plus XLA collectives over ICI/DCN. No NCCL/MPI layer
exists or is needed.

Overlap (BASELINE.json:5 "all-reduced over ICI, overlapped with the
backward sweep"): the view-batched training step computes each view's
backward sequentially; ``bucketed_psum_grads`` issues the grid-grad
all-reduce in buckets, so XLA's async collective scheduler can overlap
bucket i's reduction with the remaining backward work (later views /
later buckets). On a single host this degenerates gracefully.
"""

from __future__ import annotations

import logging
from typing import Optional

import jax
import jax.numpy as jnp

log = logging.getLogger("tpuvr")


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
):
    """Bring up multi-host JAX (no-op when single-process or already up).

    With no arguments, relies on the cluster environment (TPU metadata) as
    ``jax.distributed.initialize`` does natively.
    """
    if jax.process_count() > 1:
        return  # already initialized by the launcher
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
        log.info(
            "jax.distributed up: process %d/%d, %d devices (%d local)",
            jax.process_index(), jax.process_count(),
            jax.device_count(), jax.local_device_count(),
        )
    except Exception as e:  # single-host dev boxes
        log.info("single-process mode (%s)", e)


def bucketed_psum_grads(grads, axis_name: str, n_buckets: int = 4):
    """All-reduce a gradient grid in slice buckets along dim 0.

    Exactly equivalent to one ``psum``. Measured on a deviceless v5e:2x4
    AOT compile (tools/overlap_evidence.py): XLA's CRS combiner re-merges
    the buckets by default, and even with the combiner threshold lowered
    the collectives stay synchronous — XLA:TPU's async collective fusion
    cannot fuse them with opaque Pallas custom-calls — so bucketing buys
    schedule granularity, not overlap, today. The honest overlap path is
    an in-kernel RDMA ring (future work); see tpuvr/train/fit.py.
    """
    s = grads.shape[0]
    if n_buckets <= 1 or s < n_buckets:
        return jax.lax.psum(grads, axis_name)
    bounds = [s * i // n_buckets for i in range(n_buckets + 1)]
    parts = [
        jax.lax.psum(grads[bounds[i]:bounds[i + 1]], axis_name)
        for i in range(n_buckets)
    ]
    return jnp.concatenate(parts, axis=0)
