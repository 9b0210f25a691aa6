"""Orbax checkpointing with the reference's resume semantics.

Reference behavior being matched (gan-model/train_lipreading.py:264-305):
checkpoints carry params + optimizer state + global_step + global_epoch and
resume restores all of them; the diffusion driver's bare state_dict overwrite
(video-generation/diffusion/train.py:137) becomes a step-numbered save here.
No ``module.`` prefix surgery is needed — JAX pytrees have no DataParallel
wrappers.

Saves are async (Orbax) so the device never waits on the filesystem.
"""
from __future__ import annotations

import os
from typing import Any, Optional

import orbax.checkpoint as ocp


class CheckpointManager:
    """Thin wrapper over ``ocp.CheckpointManager`` for train-state pytrees."""

    def __init__(self, directory: str, max_to_keep: int = 5, async_save: bool = True):
        directory = os.path.abspath(directory)
        os.makedirs(directory, exist_ok=True)
        options = ocp.CheckpointManagerOptions(
            max_to_keep=max_to_keep,
            enable_async_checkpointing=async_save,
        )
        self._mgr = ocp.CheckpointManager(directory, options=options)

    def save(self, step: int, state: Any) -> None:
        self._mgr.save(step, args=ocp.args.StandardSave(state))

    def restore(self, state_template: Any, step: Optional[int] = None) -> Any:
        step = self.latest_step() if step is None else step
        if step is None:
            raise FileNotFoundError("no checkpoint found")
        return self._mgr.restore(step, args=ocp.args.StandardRestore(state_template))

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def wait(self) -> None:
        self._mgr.wait_until_finished()

    def close(self) -> None:
        self._mgr.wait_until_finished()
        self._mgr.close()


def save_once(path: str, state: Any) -> None:
    """One-shot save (inference export), analog of torch.save(state_dict)."""
    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, state, force=True)
    ckptr.wait_until_finished()


def load_once(path: str, state_template: Any) -> Any:
    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(path, state_template)
