"""Orbax-backed checkpointing (production alternative to the pickle
save_model/load_model in models/model.py; async, atomic, multi-host
safe — the TPU-native analogue of the reference's torch.save flow,
reference: src/lib/model/model.py:92-101).
"""

from __future__ import annotations

import os
from typing import Any, Optional

import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(self, directory: str, max_to_keep: int = 5):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self.mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True))

    def save(self, step: int, params, batch_stats, opt_state=None,
             wait: bool = False) -> None:
        payload = {"params": params, "batch_stats": batch_stats}
        if opt_state is not None:
            payload["opt_state"] = opt_state
        self.mgr.save(step, args=ocp.args.StandardSave(payload))
        if wait:
            self.mgr.wait_until_finished()

    def restore(self, step: Optional[int] = None, templates=None):
        if step is None:
            step = self.mgr.latest_step()
        if step is None:
            return None
        if templates is not None:
            return step, self.mgr.restore(
                step, args=ocp.args.StandardRestore(templates))
        return step, self.mgr.restore(step)

    def close(self):
        self.mgr.wait_until_finished()
        self.mgr.close()
