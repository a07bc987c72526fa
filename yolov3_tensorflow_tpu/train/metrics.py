"""Observability: per-epoch detailed loss logging + TensorBoard.

Replaces the reference's mutable-variable contract between the loss and two
Keras callbacks (yolov3_loss.py:71-79 <-> utils/logger_callback.py:41-47 <->
utils/board_callback.py:55-61): our loss returns the breakdown dict
functionally, and these writers just consume it — no variable scopes, no
extra device round-trips per epoch.

* ``log_epoch`` reproduces DetailLossLogger's per-epoch record
  (logger_callback.py:87-140): lr, total loss, kernel/gamma regularizer
  sums, and the 6 sub-losses x 3 heads.
* ``TensorBoardWriter`` reproduces MyTensorBoard (board_callback.py:12-148):
  every sub-loss scalar written under its OWN writer subdirectory with the
  same tag ``loss`` so TensorBoard overlays them in one chart, plus a
  histogram of all BN gammas concatenated (channel-pruning insight) and the
  learning rate.
"""
from __future__ import annotations

import logging
from typing import Dict, Optional

import jax
import numpy as np

HEAD_TAGS = ("head_8", "head_16", "head_32")
LOSS_KEYS = ("rectified_coord_loss", "coord_loss_xy", "coord_loss_wh",
             "noobj_iou_loss", "obj_iou_loss", "class_loss")


def log_epoch(epoch: int, lr: float, total_loss: float, kernel_reg: float,
              gamma_reg: float, breakdown: Dict[str, np.ndarray],
              seconds: float):
    """DetailLossLogger-format epoch record (logger_callback.py:87-140)."""
    logging.info("Epoch %d (%.2fs): lr=%.6g loss=%.5f "
                 "kernel_reg=%.5f gamma_reg=%.5f",
                 epoch, seconds, lr, total_loss, kernel_reg, gamma_reg)
    for key in LOSS_KEYS:
        vals = np.asarray(breakdown[key])
        logging.info("  %s: %s", key,
                     " ".join(f"{t}={v:.5f}"
                              for t, v in zip(HEAD_TAGS, vals)))


class TensorBoardWriter:
    """Sub-loss overlay + gamma histogram TB writer (board_callback parity).

    TF-free: events are written by the in-repo pure-Python encoder
    (utils/tb_writer.py), so observability works in a JAX-only install."""

    def __init__(self, log_dir: str):
        from ..utils.tb_writer import EventFileWriter
        self.log_dir = log_dir
        self._cls = EventFileWriter
        self._writers = {}
        self._main = EventFileWriter(log_dir)

    def _writer(self, name: str):
        if name not in self._writers:
            self._writers[name] = self._cls(f"{self.log_dir}/{name}")
        return self._writers[name]

    def write_epoch(self, epoch: int, lr: float, total_loss: float,
                    breakdown: Dict[str, np.ndarray],
                    params: Optional[dict] = None,
                    val_loss: Optional[float] = None):
        # each sub-loss in its own subdir, same tag -> TB overlays
        # (board_callback.py:43-50, 91-104)
        for key in LOSS_KEYS:
            vals = np.asarray(breakdown[key])
            for tag, v in zip(HEAD_TAGS, vals):
                self._writer(f"{key}/{tag}").scalar("loss", float(v), epoch)
        self._writer("total").scalar("loss", float(total_loss), epoch)
        if val_loss is not None:
            # keras puts val_loss into the logs dict the reference's TB
            # callback forwards (board_callback.py:82-89); same overlay
            # layout so train/val plot on one chart
            self._writer("val_total").scalar("loss", float(val_loss),
                                             epoch)
        self._main.scalar("learning_rate", float(lr), epoch)
        if params is not None:
            gammas = gamma_vector(params)
            if gammas.size:
                self._main.histogram("bn_gamma", gammas, epoch)

    def scalar(self, tag: str, value: float, step: int):
        """One-off scalar on the main writer (e.g. periodic validation
        mAP from the CLI's --val_map_every epoch callback)."""
        self._main.scalar(tag, float(value), step)

    def write_model_structure(self, hlo_text: str, param_summary: str):
        """Model-structure artifact at train start (the analog of
        MyTensorBoard's Keras graph dump, board_callback.py:42-43): the
        jitted train step's StableHLO module plus a parameter-tree summary,
        written both as TB text summaries and as plain files in log_dir."""
        import os
        self._main.text("model/param_tree", param_summary)
        self._main.text("model/stablehlo", hlo_text[:500_000])
        with open(os.path.join(self.log_dir, "train_step_hlo.txt"),
                  "w") as fh:
            fh.write(hlo_text)
        with open(os.path.join(self.log_dir, "param_tree.txt"), "w") as fh:
            fh.write(param_summary)

    def close(self):
        for w in self._writers.values():
            w.close()
        self._main.close()


def gamma_vector(params) -> np.ndarray:
    """All BN gamma vectors concatenated (board_callback.py:72-80)."""
    out = []
    for path, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        keys = [getattr(p, "key", str(p)) for p in path]
        if keys and keys[-1] == "scale":
            out.append(np.asarray(leaf).ravel())
    return np.concatenate(out) if out else np.zeros((0,), np.float32)
