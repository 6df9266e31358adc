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

    def save(self, step: int, state: Any, force: bool = False):
        self._mgr.save(step, args=ocp.args.StandardSave(state), force=force)
        self._mgr.wait_until_finished()

    def restore(self, state_template: Any, step: Optional[int] = None) -> Any:
        step = step if step is not None else self._mgr.latest_step()
        if step is None:
            return None
        restored = self._mgr.restore(
            step, args=ocp.args.StandardRestore(state_template))
        # Orbax hands back COMMITTED device arrays while jit-created states
        # hold UNCOMMITTED ones; the mismatch changes the resolved input
        # shardings, so a jitted train step silently RECOMPILES on the first
        # post-resume call — on the TPU runtime that is a multi-minute remote
        # compile per resume. Reshape every leaf to the template leaf's
        # placement AND committed-ness so the resumed state is
        # dispatch-identical to a fresh one.
        import jax
        import jax.numpy as jnp
        import numpy as np

        def _match(tmpl, leaf):
            if not isinstance(tmpl, jax.Array):
                return leaf
            if tmpl.committed:
                return jax.device_put(leaf, tmpl.sharding)
            # uncommitted template (plain jit output): a host round-trip is
            # the only public way to produce an uncommitted device array
            return jnp.asarray(np.asarray(leaf), dtype=tmpl.dtype)
        return jax.tree_util.tree_map(_match, state_template, restored)

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def close(self):
        self._mgr.close()
