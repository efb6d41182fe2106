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

    def save(self, step: int, state: Any):
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
