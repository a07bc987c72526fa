"""Checkpoint inspection (the reference's graph-inspection note,
utils/script_note.py:9-16, reimagined for Orbax): print the train-state
tree of a checkpoint directory — step, rectified-image counter, parameter
shapes/counts, optimizer slots — without building the model."""
from __future__ import annotations

import argparse

import numpy as np


def inspect(directory: str, show_arrays: bool = False):
    import orbax.checkpoint as ocp

    mgr = ocp.CheckpointManager(directory)
    steps = mgr.all_steps()
    print(f"checkpoints at {directory}: steps {steps}")
    if not steps:
        return
    step = max(steps)
    restored = mgr.restore(step)  # raw pytree, no template
    tree = restored if not isinstance(restored, dict) or \
        "default" not in restored else restored["default"]

    def walk(node, prefix=""):
        total = 0
        if isinstance(node, dict):
            for k in sorted(node):
                total += walk(node[k], f"{prefix}/{k}" if prefix else k)
            return total
        arr = np.asarray(node)
        n = int(np.prod(arr.shape)) if arr.shape else 1
        if show_arrays or arr.size <= 4:
            print(f"  {prefix}: shape={arr.shape} dtype={arr.dtype} "
                  f"value={arr if arr.size <= 4 else '...'}")
        else:
            print(f"  {prefix}: shape={arr.shape} dtype={arr.dtype}")
        return n

    total = walk(tree)
    print(f"total leaves: {total:,d} elements")


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("directory")
    p.add_argument("--arrays", action="store_true",
                   help="print small array values")
    a = p.parse_args(argv)
    inspect(a.directory, a.arrays)


if __name__ == "__main__":
    main()
