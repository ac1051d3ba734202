"""Orbax checkpointing with real resume.

Upgrades the reference's checkpoint story (SURVEY.md §5): accelerate
save_state with a hand-edited `initial_epoch` global and no optimizer restore
(reference train.py:20-21,288-290) becomes versioned orbax checkpoints of the
full TrainState (trainable params, frozen params optional, optimizer state,
step) with automatic latest-step resume.
"""
from __future__ import annotations

import os
from typing import Any, Dict, Optional

import orbax.checkpoint as ocp

from ..training.train_step import TrainState


class CheckpointManager:
    def __init__(self, directory: str, max_to_keep: int = 5,
                 save_frozen: bool = False):
        self.directory = os.path.abspath(directory)
        self.save_frozen = save_frozen
        self.manager = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep,
                                                 create=True),
        )

    def save(self, state: TrainState, metrics: Optional[Dict] = None):
        step = int(state.step)
        payload = {
            "trainable": state.trainable,
            "opt_state": state.opt_state,
            "step": state.step,
        }
        if self.save_frozen:
            payload["frozen"] = state.frozen
        self.manager.save(step, args=ocp.args.StandardSave(payload))
        self.manager.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        return self.manager.latest_step()

    def restore(self, state: TrainState,
                step: Optional[int] = None) -> TrainState:
        """Restore into the structure of `state` (frozen params reused from
        `state` unless they were saved)."""
        step = step if step is not None else self.manager.latest_step()
        if step is None:
            return state
        template = {
            "trainable": state.trainable,
            "opt_state": state.opt_state,
            "step": state.step,
        }
        if self.save_frozen:
            template["frozen"] = state.frozen
        restored = self.manager.restore(
            step, args=ocp.args.StandardRestore(template))
        return TrainState(
            trainable=restored["trainable"],
            frozen=restored.get("frozen", state.frozen),
            opt_state=restored["opt_state"],
            step=restored["step"],
        )


def export_adapter_numpy(state_or_params) -> Dict[str, Any]:
    """Strip the trainable adapter subtree into a plain numpy dict — the
    analogue of the reference's convert_weights.py distributable artifact."""
    import numpy as np
    from flax import traverse_util

    params = getattr(state_or_params, "trainable", state_or_params)
    flat = traverse_util.flatten_dict(params, sep="/")
    return {k: np.asarray(v) for k, v in flat.items()}
