"""Checkpoint/resume via orbax (SURVEY.md §5 checkpoint/resume).

The reference renders statelessly and has no checkpointing; inverse
rendering (C9) does: ``{params, opt_state, step}`` saved every K steps,
sharding-aware (orbax restores to whatever shardings the abstract target
carries), with auto-resume from the latest step.
"""

from __future__ import annotations

import logging
from typing import Any, Optional, Tuple

log = logging.getLogger("tpuvr")


class Checkpointer:
    """Thin orbax CheckpointManager wrapper for the training loop."""

    def __init__(self, directory: str, max_to_keep: int = 3):
        import orbax.checkpoint as ocp

        self._ocp = ocp
        self.mgr = ocp.CheckpointManager(
            directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True
            ),
        )

    def save(self, step: int, state: Any, cast_bf16: bool = False):
        """Save ``state``; ``cast_bf16`` halves the checkpoint's f32
        array bytes (TrainConfig.ckpt_bf16) — on this container the
        device->host fetch rides a ~25 MB/s tunnel, so a 768 MB c4
        state costs ~30 s per save; bf16 halves that stall. Restore
        casts back to the abstract target's dtype (orbax honors the
        target dtype), costing one bf16 rounding of params/moments per
        resume — bounded by the same rounding the bf16 compute tiers
        already apply every step."""
        if cast_bf16:
            import jax
            import jax.numpy as jnp

            def cast(x):
                if getattr(x, "dtype", None) == jnp.float32:
                    return x.astype(jnp.bfloat16)
                return x

            state = jax.tree.map(cast, state)
        self.mgr.save(step, args=self._ocp.args.StandardSave(state))

    def latest_step(self) -> Optional[int]:
        return self.mgr.latest_step()

    def restore(self, abstract_state: Any) -> Tuple[int, Any]:
        """Restore the latest checkpoint into ``abstract_state``'s shape."""
        step = self.mgr.latest_step()
        if step is None:
            raise FileNotFoundError("no checkpoint to restore")
        state = self.mgr.restore(
            step, args=self._ocp.args.StandardRestore(abstract_state)
        )
        return step, state

    def wait(self):
        self.mgr.wait_until_finished()

    def close(self):
        self.mgr.close()
