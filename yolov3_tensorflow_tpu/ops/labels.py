"""Label decoder (reference: yolov3/label_decoder.py:10-60).

Targets arrive as (N, max_boxes, 5) rows of [cx, cy, w, h, class] in
normalized coordinates, padded with -1 (static max_boxes instead of the
reference's per-batch dynamic padding, dataset/file_util.py:97).  For each
head the decoder scales to grid units and emits corner boxes.
"""
from __future__ import annotations

from typing import List, Tuple

import jax.numpy as jnp

from ..config import Config


def decode_labels_single_head(targets, grid_hw) -> Tuple:
    """(label_decoder.py:45-60): scale normalized cxcywh to grid units.

    targets: (N, M, 5).  Returns (targets_grid (N,M,5), boxes (N,M,4)).
    """
    h, w = grid_hw
    wh_scale = jnp.asarray([w, h], jnp.float32)
    txy = targets[..., 0:2] * wh_scale
    twh = targets[..., 2:4] * wh_scale
    tcls = targets[..., 4:5]
    scaled = jnp.concatenate([txy, twh, tcls], axis=-1)
    half = twh / 2.0
    boxes = jnp.concatenate([txy - half, txy + half], axis=-1)
    return scaled, boxes


class LabelDecoder:
    def __init__(self, cfg: Config):
        self.grids = cfg.head_grid_sizes

    def decode(self, targets) -> List[Tuple]:
        """targets: (N, M, 5) or (N, M*5) flat (reference layout,
        label_decoder.py:35).  Returns [(targets, boxes)] per head."""
        if targets.ndim == 2:
            targets = targets.reshape(targets.shape[0], -1, 5)
        targets = targets.astype(jnp.float32)
        return [decode_labels_single_head(targets, g) for g in self.grids]


def valid_mask(targets) -> jnp.ndarray:
    """(N, M) float mask of real (non-padding) objects; padding rows have
    cx = -1 (reference yolov3_loss.py:239)."""
    if targets.ndim == 2:
        targets = targets.reshape(targets.shape[0], -1, 5)
    return (targets[..., 0] >= 0).astype(jnp.float32)
