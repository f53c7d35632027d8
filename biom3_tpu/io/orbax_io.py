"""Native checkpointing via orbax (save/restore/resume).

Replaces the reference's Lightning ``.ckpt`` files (``stage3_config.json:
10-11,46``) for training state persistence: params, optimizer state, EMA and
step all save/restore as one sharded pytree — resumable across process
restarts and device-mesh changes (orbax reshards on load).
"""

from __future__ import annotations

import os
from typing import Any

import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(self, directory: str, *, max_to_keep: int = 3):
        self.directory = os.path.abspath(directory)
        self.manager = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True
            ),
        )

    def save(self, step: int, state: Any, *, wait: bool = False) -> None:
        self.manager.save(step, args=ocp.args.StandardSave(state))
        if wait:
            self.manager.wait_until_finished()

    def restore(self, state_template: Any, step: int | None = None) -> Any:
        step = step if step is not None else self.manager.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoints in {self.directory}")
        return self.manager.restore(
            step, args=ocp.args.StandardRestore(state_template)
        )

    def latest_step(self) -> int | None:
        return self.manager.latest_step()

    def close(self) -> None:
        self.manager.wait_until_finished()
        self.manager.close()
