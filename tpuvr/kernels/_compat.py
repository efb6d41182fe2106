"""Kernel execution-mode helpers."""

from __future__ import annotations

import os
from functools import lru_cache

import jax


@lru_cache(maxsize=1)
def use_interpret() -> bool:
    """Run Pallas kernels in interpret mode off-TPU (tests run on CPU).

    Override with TPUVR_INTERPRET=0/1.
    """
    env = os.environ.get("TPUVR_INTERPRET")
    if env is not None:
        return env not in ("0", "false", "False")
    return jax.default_backend() != "tpu"
