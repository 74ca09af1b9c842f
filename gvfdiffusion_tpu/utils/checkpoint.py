"""Orbax checkpointing: save/auto-resume of train state + EMA.

Replaces the reference's raw torch.save checkpoint files and auto-resume scan
(train_latent.py:107-155,231-253: `<exp>/checkpoints/{name}_{step:06d}.pt`,
`ema_{name}_{rate}_{step}.pt`, `opt{step}.pt`; resume loads the EMA weights as
model weights). Orbax writes one composite checkpoint per step and restores
the latest on resume.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import orbax.checkpoint as ocp


def _manager(ckpt_dir: str, max_to_keep: int = 5) -> ocp.CheckpointManager:
    return ocp.CheckpointManager(
        ckpt_dir,
        options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep, create=True),
    )


class CheckpointManager:
    """Thin wrapper: save(state, step) / latest_step() / restore(template)."""

    def __init__(self, ckpt_dir: str, max_to_keep: int = 5):
        self.ckpt_dir = os.path.abspath(ckpt_dir)
        self._mgr = _manager(self.ckpt_dir, max_to_keep)

    def save(self, state: Any, step: int, force: bool = False) -> bool:
        if step in self._mgr.all_steps():
            # already on disk (e.g. resuming an already-finished run and
            # hitting the final save again) — a no-op, not an error
            return False
        saved = self._mgr.save(
            step, args=ocp.args.StandardSave(state), force=force
        )
        self._mgr.wait_until_finished()
        return saved

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def restore(self, template: Any, step: Optional[int] = None) -> Any:
        step = step if step is not None else self.latest_step()
        if step is None:
            return None
        return self._mgr.restore(step, args=ocp.args.StandardRestore(template))

    def close(self):
        self._mgr.close()


def auto_resume(ckpt_dir: str, state_template: Any):
    """Restore the newest checkpoint if one exists (reference auto_resume
    train_latent.py:107-155). Returns (state_or_template, resumed_step)."""
    if not os.path.isdir(ckpt_dir):
        return state_template, 0
    mgr = CheckpointManager(ckpt_dir)
    step = mgr.latest_step()
    if step is None:
        return state_template, 0
    state = mgr.restore(state_template, step)
    return state, step
