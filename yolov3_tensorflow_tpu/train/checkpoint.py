"""Orbax checkpointing (reference: keras ModelCheckpoint weights-only with
period=50 + latest-checkpoint auto-resume, yolov3/trainer.py:47-67,90-91).

Unlike the reference, the FULL train state is checkpointed — params, BN
stats, optimizer slots, step, rectified image counter, and RNG — so resume
is bit-exact rather than weights-only."""
from __future__ import annotations

import os
from typing import Any, Optional

import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(self, directory: str, max_keep: int = 3):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self.mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(max_to_keep=max_keep,
                                                 create=True),
        )

    def save(self, step: int, state: Any, force: bool = False,
             wait: bool = True):
        """``wait=False`` makes the save async: orbax snapshots device
        arrays to host before returning, so the caller continues while
        the write hits disk — the trainer's in-loop periodic saves use
        this (blocking there added the full serialize latency to every
        ckpt_period-th epoch for no gain).  The default stays
        synchronous: a DIFFERENT CheckpointManager (another process, or
        a fresh Trainer on the same dir) cannot see this manager's
        pending writes, so fire-and-forget is only safe when all
        subsequent readers go through this instance (latest_step/restore
        below do wait)."""
        self.mgr.save(step, args=ocp.args.StandardSave(state), force=force)
        if wait:
            self.mgr.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        self.mgr.wait_until_finished()
        return self.mgr.latest_step()

    def restore(self, state_template: Any, step: Optional[int] = None):
        self.mgr.wait_until_finished()
        step = self.mgr.latest_step() if step is None else step
        if step is None:
            return None
        return self.mgr.restore(
            step, args=ocp.args.StandardRestore(state_template))

    def close(self):
        # orbax finalizes pending async saves inside close()
        self.mgr.close()
