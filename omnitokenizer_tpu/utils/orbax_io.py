"""Orbax-backed production checkpointing (async, retention policy).

Complements the msgpack single-file format (utils/checkpoint.py /
training/loop.py): Orbax gives atomic directory checkpoints, async saves
that overlap training, and max_to_keep retention — the production analogue
of the reference's Lightning ModelCheckpoint (vqgan_train.py:101-110).
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax


class OrbaxCheckpointer:
    def __init__(self, root_dir: str, max_to_keep: int = 3, async_save: bool = True):
        import orbax.checkpoint as ocp

        self.root = os.path.abspath(os.path.join(root_dir, "orbax"))
        os.makedirs(self.root, exist_ok=True)
        options = ocp.CheckpointManagerOptions(
            max_to_keep=max_to_keep, create=True,
            enable_async_checkpointing=async_save)
        self.manager = ocp.CheckpointManager(self.root, options=options)

    def save(self, step: int, state: Any):
        import orbax.checkpoint as ocp

        self.manager.save(step, args=ocp.args.StandardSave(jax.device_get(state)))

    def restore(self, template: Any, step: Optional[int] = None) -> Any:
        import orbax.checkpoint as ocp

        step = step if step is not None else self.manager.latest_step()
        if step is None:
            return None
        return self.manager.restore(step, args=ocp.args.StandardRestore(template))

    def latest_step(self) -> Optional[int]:
        return self.manager.latest_step()

    def wait(self):
        self.manager.wait_until_finished()

    def close(self):
        self.manager.close()
