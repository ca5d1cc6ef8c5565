"""Checkpoint / resume via orbax.

Replaces the reference's torch.save of {model, optimizer, lr_scheduler,
epoch} every SAVE_INTERVAL epochs plus a best-model snapshot
(/root/reference/models/pangu_sample.py:93-98,160-166;
finetune/lora_tune.py:143-148 for resume). Improvements over the
reference (SURVEY.md §5.4): async saves that overlap training, *step*-level
granularity (the reference can only resume at epoch boundaries), atomic
writes, and restart-from-latest discovery.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp


class Checkpointer:
    """Thin orbax wrapper bound to one result directory.

    Layout: <root>/models/<step>/...  (managed, max_to_keep rotated)
            <root>/models/best/...    (best-on-validation snapshot)
    """

    def __init__(self, root: str, max_to_keep: int = 5):
        self.root = os.path.abspath(root)
        self.dir = os.path.join(self.root, "models")
        os.makedirs(self.dir, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self.dir,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True,
                enable_async_checkpointing=True),
        )
        self._best = ocp.StandardCheckpointer()

    # -- periodic ----------------------------------------------------------
    def save(self, state: Any, epoch: int = 0, step: Optional[int] = None,
             batch: int = 0):
        """Periodic checkpoint keyed by global step (falls back to the
        epoch number when no step is given, the reference's granularity).
        ``batch`` = train batches already consumed in ``epoch``, so resume
        can restart mid-epoch at the exact data-iterator position — the
        step-level granularity the reference lacks
        (models/pangu_sample.py:93-98 is epoch-only)."""
        key = int(step if step is not None else epoch)
        if key in self._mgr.all_steps():
            return   # epoch boundary coinciding with a step-interval save
        payload = {"state": state,
                   "progress": {"epoch": int(epoch), "batch": int(batch)}}
        self._mgr.save(key, args=ocp.args.StandardSave(payload))

    def restore_latest(self, template: Any
                       ) -> tuple[Any, Optional[int], dict]:
        """Returns (state, key, progress). progress = {"epoch", "batch"}:
        the position the next training step should run at."""
        step = self._mgr.latest_step()
        if step is None:
            return template, None, {"epoch": 1, "batch": 0}
        payload = {"state": template, "progress": {"epoch": 0, "batch": 0}}
        out = self._mgr.restore(step, args=ocp.args.StandardRestore(payload))
        return out["state"], step, jax.tree.map(int, out["progress"])

    # -- best-on-validation ------------------------------------------------
    @property
    def best_path(self) -> str:
        return os.path.join(self.dir, "best")

    def save_best(self, state: Any):
        self._best.save(self.best_path, state, force=True)

    def restore_best(self, template: Any) -> Any:
        return self._best.restore(self.best_path, template)

    def wait(self):
        self._mgr.wait_until_finished()
        self._best.wait_until_finished()

    def close(self):
        self.wait()
        self._mgr.close()


def save_params(path: str, params: Any):
    """One-shot parameter snapshot (e.g. converted pretrained weights);
    blocks until the (async) write is durable."""
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(path), params, force=True)
    ckptr.wait_until_finished()
    ckptr.close()


def load_params(path: str, template: Optional[Any] = None) -> Any:
    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(os.path.abspath(path), template)
