"""Checkpoint / resume via Orbax.

The reference has no serialization at all; its closest analog is the
in-memory named_parameters map (SURVEY.md §5; src/nn.cpp:110-138). Here the
checkpointable view is exactly that map — :func:`gnn_tpu.nn.state_dict`'s
qualified names — plus optimizer state and the buffer State store, saved
with Orbax (sharding-aware, multi-host safe on real pods).
"""

from __future__ import annotations

import os
from typing import Any, Optional, Tuple

import jax
import numpy as np

from gnn_tpu import nn

__all__ = ["Checkpointer"]


class Checkpointer:
    def __init__(self, directory: str, *, max_to_keep: int = 3):
        import orbax.checkpoint as ocp

        self._ocp = ocp
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self.manager = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep),
        )

    def save(
        self,
        step: int,
        model,
        opt_state: Any = None,
        state: Optional[nn.State] = None,
        extra: Optional[dict] = None,
    ) -> None:
        # Each component is its own sub-checkpoint (Composite), so restore
        # can pick any subset (e.g. model only for inference).
        items = {"model": self._ocp.args.StandardSave(nn.state_dict(model))}
        if opt_state is not None:
            items["opt_state"] = self._ocp.args.StandardSave(opt_state)
        if state is not None:
            items["buffers"] = self._ocp.args.StandardSave(
                jax.tree_util.tree_flatten(state)[0]
            )
        if extra:
            items["extra"] = self._ocp.args.JsonSave(extra)
        self.manager.save(step, args=self._ocp.args.Composite(**items))
        self.manager.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        return self.manager.latest_step()

    def restore(
        self,
        model,
        opt_state: Any = None,
        state: Optional[nn.State] = None,
        step: Optional[int] = None,
    ) -> Tuple[Any, Any, Optional[nn.State], Optional[dict]]:
        """Returns (model, opt_state, state, extra) with values restored.

        Pass templates (same structure as saved) for anything you want back.
        """
        step = self.latest_step() if step is None else step
        if step is None:
            raise FileNotFoundError(f"no checkpoint found in {self.directory}")
        items = {
            "model": self._ocp.args.StandardRestore(nn.state_dict(model))
        }
        if opt_state is not None:
            items["opt_state"] = self._ocp.args.StandardRestore(opt_state)
        if state is not None:
            items["buffers"] = self._ocp.args.StandardRestore(
                jax.tree_util.tree_flatten(state)[0]
            )
        restored = self.manager.restore(
            step, args=self._ocp.args.Composite(**items)
        )
        model = nn.load_state_dict(model, restored["model"])
        new_opt = restored.get("opt_state", opt_state)
        new_state = state
        if state is not None and restored.get("buffers") is not None:
            treedef = jax.tree_util.tree_flatten(state)[1]
            new_state = jax.tree_util.tree_unflatten(treedef, restored["buffers"])
        return model, new_opt, new_state, restored.get("extra")

    def close(self):
        self.manager.close()
