"""Orbax checkpointing (replaces mmcv CheckpointHook + resume_from,
core/apis/mmdet_train.py:199-203, far3d.py:280).

Saves the full TrainState (params, frozen-BN stats, head BN stats, optimizer
state, step). The temporal memory carry is deliberately NOT checkpointed —
matching the reference, whose memory queue lives in plain attributes and
restarts cold on resume (farhead.py:446-451); streams re-warm within a few
frames.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(self, directory: str, max_to_keep: int = 1,
                 save_interval: int = 1):
        os.makedirs(directory, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            os.path.abspath(directory),
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep,
                save_interval_steps=save_interval,
                create=True))

    def save(self, step: int, state: Any):
        self._mgr.save(step, args=ocp.args.StandardSave(state))
        self._mgr.wait_until_finished()

    def restore(self, state_template: Any, step: Optional[int] = None) -> Any:
        step = step if step is not None else self._mgr.latest_step()
        if step is None:
            return None
        return self._mgr.restore(
            step, args=ocp.args.StandardRestore(state_template))

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def close(self):
        self._mgr.close()
