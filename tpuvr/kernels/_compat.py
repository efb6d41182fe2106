"""Kernel execution-mode helpers."""

from __future__ import annotations

import os
from functools import lru_cache

import jax


def out_struct(shape, dtype, *operands) -> jax.ShapeDtypeStruct:
    """``ShapeDtypeStruct`` whose ``vma`` is the union of the operands'.

    Inside ``jax.shard_map(..., check_vma=True)`` every ``pallas_call``
    output must declare which mesh axes it varies over; the kernel outputs
    vary over exactly the axes any input does (the grid is replicated, the
    per-device ray-tile params are not). Outside shard_map all vmas are
    empty and this is a plain ShapeDtypeStruct.
    """
    vma = frozenset()
    for op in operands:
        vma |= getattr(jax.typeof(op), "vma", frozenset())
    return jax.ShapeDtypeStruct(shape, dtype, vma=vma)


@lru_cache(maxsize=1)
def use_interpret() -> bool:
    """Run Pallas kernels in interpret mode off-TPU (tests run on CPU).

    Override with TPUVR_INTERPRET=0/1.
    """
    env = os.environ.get("TPUVR_INTERPRET")
    if env is not None:
        return env not in ("0", "false", "False")
    return jax.default_backend() != "tpu"
