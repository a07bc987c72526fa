"""Average the weights of the last k (or an explicit list of) checkpoints.

Checkpoint averaging (Polyak-style, as popularized for detection by the
YOLOv4/Scaled-YOLO training recipes) is the offline cousin of the
trainer's ``--ema_decay`` shadow: a uniform mean of the params (and, when
present, EMA shadows and BN moving statistics) over the last few saved
checkpoints, written out as a NEW checkpoint directory that every
downstream surface — ``--mode test/predict/save_pb/save_serving``,
``export-keras`` — consumes like any trained run.  The reference keeps
only weights-only Keras files (yolov3/trainer.py:90-91, period-50
ModelCheckpoint) and has no averaging; this closes that gap TPU-side.

The averaged checkpoint carries the NEWEST member's step, optimizer
slots, RNG and counters, so resuming training from it is well-defined
(slots simply correspond to the newest member, the standard convention).

Usage:
  python -m yolov3_tensorflow_tpu.tools.average_checkpoints \
      --checkpoint ckpt_dir --out avg_ckpt_dir [--last 3 | --steps 100,150,200]
"""
from __future__ import annotations

import argparse
import logging
from typing import Sequence

import numpy as np


def _tree_mean(trees: Sequence):
    """Uniform elementwise mean over structurally identical nested dicts.
    Accumulates in float64 and casts back to each leaf's dtype (bf16/f32
    params lose nothing to summation order at k<=10)."""
    first = trees[0]
    if isinstance(first, dict):
        return {k: _tree_mean([t[k] for t in trees]) for k in first}
    if first is None:
        return None
    acc = np.zeros(np.shape(first), np.float64)
    for t in trees:
        acc += np.asarray(t, np.float64)
    return (acc / len(trees)).astype(np.asarray(first).dtype)


def average_checkpoints(checkpoint_dir: str, out_dir: str,
                        last: int = 3, steps: Sequence[int] | None = None):
    """Returns the list of averaged steps.  ``steps`` overrides ``last``."""
    import os

    import orbax.checkpoint as ocp

    # refuse an --out that is (or lives inside) the source directory:
    # the force=True save below would overwrite the newest source
    # checkpoint in place, destroying a member of its own average
    src = os.path.abspath(checkpoint_dir)
    dst = os.path.abspath(out_dir)
    if dst == src or dst.startswith(src + os.sep):
        raise ValueError(
            f"--out {out_dir} is inside the source --checkpoint "
            f"{checkpoint_dir}; pick a separate output directory")

    mgr = ocp.CheckpointManager(checkpoint_dir)
    try:
        all_steps = sorted(mgr.all_steps())
        if not all_steps:
            raise FileNotFoundError(
                f"no checkpoints under {checkpoint_dir}")
        if steps:
            if len(set(steps)) != len(steps):
                raise ValueError(
                    f"--steps contains duplicates: {sorted(steps)} — each "
                    f"checkpoint enters the uniform mean exactly once")
            use = sorted(steps)
        else:
            use = all_steps[-last:]
        missing = [s for s in use if s not in all_steps]
        if missing:
            raise ValueError(f"steps {missing} not in {all_steps} "
                             f"(kept checkpoints only; see ckpt_max_keep)")
        if len(use) < 2:
            raise ValueError(
                f"averaging needs >=2 checkpoints, have {use} — "
                f"save more often (ckpt period) or raise ckpt_max_keep")
        raws = [mgr.restore(s) for s in use]
    finally:
        mgr.close()
    newest = raws[-1]
    # average every weight-like subtree; keep the newest member's
    # optimizer slots / step / RNG / counters verbatim.  Membership can
    # be mixed per-key (--ema_decay may be enabled mid-project on the
    # same checkpoint_dir), so each key averages over exactly the
    # members that carry it as a dict — never indexing the others, and
    # never letting an EMA-less OLDEST member strip the newest
    # checkpoint's shadow from the output.
    for key in ("params", "ema_params", "batch_stats"):
        if not isinstance(newest.get(key), dict):
            continue
        have = [(s, r[key]) for s, r in zip(use, raws)
                if isinstance(r.get(key), dict)]
        if len(have) < len(raws):
            logging.warning(
                "'%s' present only in steps %s of %s; averaging over "
                "those members only", key, [s for s, _ in have], use)
        newest[key] = _tree_mean([t for _, t in have])
    out = ocp.CheckpointManager(
        out_dir, options=ocp.CheckpointManagerOptions(create=True))
    try:
        out.save(use[-1], args=ocp.args.StandardSave(newest), force=True)
        out.wait_until_finished()
    finally:
        out.close()
    logging.info("averaged steps %s of %s -> %s (step %d)",
                 use, checkpoint_dir, out_dir, use[-1])
    return use


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--checkpoint", required=True,
                   help="source checkpoint directory (a training run)")
    p.add_argument("--out", required=True,
                   help="output checkpoint directory for the average")
    p.add_argument("--last", type=int, default=3,
                   help="average the newest k kept checkpoints (default 3)")
    p.add_argument("--steps", default=None,
                   help="explicit comma-separated step list (overrides "
                        "--last)")
    args = p.parse_args(argv)
    logging.basicConfig(level=logging.INFO)
    steps = ([int(s) for s in args.steps.split(",")]
             if args.steps else None)
    used = average_checkpoints(args.checkpoint, args.out,
                               last=args.last, steps=steps)
    print(f"averaged {len(used)} checkpoints {used} -> {args.out}")


if __name__ == "__main__":
    main()
