"""Transfer-learning initialization (Config.init_from).

The reference's checkpoints are Keras weights-only files, and its users
fine-tune by ``model.load_weights(path, by_name=True, skip_mismatch=True)``
after editing ``class_num`` — matching layers load, the class-dependent
head output convs silently keep their fresh init (the trainer's own
resume is the strict-match variant, yolov3/trainer.py:47-67).  This
module is the same contract over Orbax checkpoints: copy every donor
leaf whose TREE PATH and SHAPE both match the freshly-initialized
model, leave the rest (and report exactly what happened).
"""
from __future__ import annotations

import logging
from typing import Any, Optional

import jax
import jax.numpy as jnp
import orbax.checkpoint as ocp


def _flatten(tree: Any, prefix=()) -> dict:
    """Nested-dict pytree -> {path tuple: leaf}.  Donor trees come from a
    template-free Orbax restore, which returns plain nested dicts."""
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten(v, prefix + (str(k),)))
    elif tree is not None:
        out[prefix] = tree
    return out


def _graft(target: Any, donor_leaves: dict, report: dict, prefix=()):
    """Rebuild ``target`` with matching donor leaves substituted."""
    if isinstance(target, dict):
        return {k: _graft(v, donor_leaves, report, prefix + (str(k),))
                for k, v in target.items()}
    path = prefix
    if path not in donor_leaves:
        report["missing"].append("/".join(path))
        return target
    donor = donor_leaves[path]
    if tuple(donor.shape) != tuple(target.shape):
        report["shape_skipped"].append(
            f"{'/'.join(path)} {tuple(donor.shape)}->{tuple(target.shape)}")
        return target
    report["copied"] += 1
    return jnp.asarray(donor, dtype=target.dtype)


def load_pretrained(state, directory: str, step: Optional[int] = None,
                    prefer_ema: bool = True):
    """Graft a donor checkpoint's weights + batch_stats into ``state``.

    Returns ``(new_state, report)`` where report counts copied leaves and
    lists shape-mismatched / donor-absent paths.  Raises if the donor
    directory has no checkpoint or if NOTHING matches (a wrong path is a
    config error, not a quiet no-op).  ``state.step``, optimizer slots,
    RNG and the rectified counter are untouched (fresh run); when the
    state carries an EMA shadow it is re-seeded from the grafted weights
    (the shadow must track the weights actually being trained).

    ``prefer_ema`` (default): a donor trained with ``--ema_decay``
    serves, evaluates and exports its EMA SHADOW, not its live weights —
    so fine-tuning starts from the shadow too (grafting the live
    weights would start from parameters nobody ever validated).  Pass
    False to take the live weights deliberately.
    """
    mgr = ocp.CheckpointManager(directory)
    try:
        step = mgr.latest_step() if step is None else step
        if step is None:
            raise FileNotFoundError(
                f"init_from: no checkpoint found under {directory}")
        raw = mgr.restore(step)  # template-free: nested plain dicts
    finally:
        mgr.close()
    report = {"copied": 0, "shape_skipped": [], "missing": [], "step": step,
              "used_ema": False}
    donor_weights = raw.get("params", {})
    if prefer_ema and isinstance(raw.get("ema_params"), dict):
        donor_weights = raw["ema_params"]
        report["used_ema"] = True
        logging.info("init_from: donor carries an EMA shadow — grafting "
                     "the shadow (the donor's serving weights)")
    donor_params = _flatten(donor_weights)
    donor_stats = _flatten(raw.get("batch_stats", {}))
    new_params = _graft(state.params, donor_params, report)
    new_stats = _graft(state.batch_stats, donor_stats, report)
    if report["copied"] == 0:
        raise ValueError(
            f"init_from: checkpoint at {directory} (step {step}) shares no "
            f"compatible leaves with this model — wrong backbone or path?")
    new_ema = state.ema_params
    if new_ema is not None:
        new_ema = jax.tree.map(jnp.copy, new_params)
    logging.info(
        "init_from %s (step %d): copied %d leaves, %d shape-skipped, "
        "%d absent", directory, step, report["copied"],
        len(report["shape_skipped"]), len(report["missing"]))
    for line in report["shape_skipped"]:
        logging.info("init_from shape-skip (fresh init kept): %s", line)
    return (state.replace(params=new_params, batch_stats=new_stats,
                          ema_params=new_ema), report)
