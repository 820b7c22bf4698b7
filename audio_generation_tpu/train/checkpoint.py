"""Checkpoint/resume via Orbax.

Reference semantics (networks/training.py:225-245,464-480 and
networks/utils.py:201-210): periodic full-trainer-state checkpoints with
newest-checkpoint auto-resume. Here the whole TrainState pytree (generator
params, codebook state, optimizer states, discriminator states, step, rng) is
one Orbax item plus a JSON metadata blob (epoch, mini_epoch counter, loss
ledger) — crash-and-resume restores everything the reference's
trainer_state.pkl did.
"""
from __future__ import annotations

import json
import os
from typing import Any, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(self, directory: str, max_to_keep: Optional[int] = 3):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._mngr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep, create=True),
        )

    def save(self, step: int, state, metadata: Optional[dict] = None):
        args = {"state": ocp.args.StandardSave(state)}
        if metadata is not None:
            args["meta"] = ocp.args.JsonSave(metadata)
        self._mngr.save(step, args=ocp.args.Composite(**args))
        self._mngr.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        return self._mngr.latest_step()

    def restore_latest(self, example_state):
        """Restore the newest checkpoint (None if none exist).
        Returns (state, metadata, step)."""
        step = self._mngr.latest_step()
        if step is None:
            return None
        restored = self._mngr.restore(
            step,
            args=ocp.args.Composite(
                state=ocp.args.StandardRestore(example_state),
                meta=ocp.args.JsonRestore(),
            ),
        )
        meta = restored.get("meta") if hasattr(restored, "get") else restored["meta"]
        return restored["state"], (meta or {}), step

    def close(self):
        self._mngr.close()
