"""Prediction decoder (reference: yolov3/yolov3_decoder.py:11-192).

Pure functions; all shapes static.  For each head:
  * xy    = clip(sigmoid(t_xy), eps, 1-eps) + grid_left_top   (:142-156)
  * wh    = exp(t_wh) * anchor_wh_in_grid_units               (:158-169)
  * score = clip(sigmoid(t_conf), eps, 1-eps)                 (:171-180)
  * class = clip(softmax(t_cls - max), eps, 1-eps)            (:182-192)
  * boxes = [xy - wh/2, xy + wh/2] corner form                (:138-139)

eps is the Keras epsilon the reference sets to 1e-8 (run.py:26).
Unlike the reference, decode() consumes the three raw head tensors directly
(the merged-tensor packing was a Keras artifact; see models/detector.py);
:func:`unpack_heads` in models/detector.py exists for the legacy layout.
"""
from __future__ import annotations

from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Config

# Effective clip top bound: 1 - 1e-8 rounds to exactly 1.0 in f32, so
# the reference's Keras epsilon alone makes the upper clip a no-op.
# 1 - 1e-7 IS representable (same guard as ops/loss.py _SAFE_HI); the
# tighter of the two applies so any consumer that takes a log of the
# decoded probabilities is safe (CLAUDE.md stability invariants).
_SAFE_HI = float(np.float32(1.0) - np.float32(1e-7))


def grid_left_top(height: int, width: int) -> np.ndarray:
    """Meshgrid left-top coords (H, W, 1, 2) ordered [x, y]
    (yolov3_decoder.py:47-60)."""
    xs, ys = np.meshgrid(np.arange(width), np.arange(height))
    return np.stack([xs, ys], axis=-1).reshape(height, width, 1, 2).astype(
        np.float32)


def anchors_in_grid_units(anchor_boxes, grid_hw) -> np.ndarray:
    """Anchors ([W,H] normalized) scaled to grid units
    (yolov3_decoder.py:35-40)."""
    h, w = grid_hw
    return np.asarray(anchor_boxes, np.float32) * np.array(
        [w, h], np.float32)


def decode_single_head(raw, left_top, anchors, class_num: int, eps: float,
                       gaussian: bool = False):
    """raw: (N, H, W, B, box_len) -> (raw_txywh, decoded, corner_boxes).

    With ``gaussian`` (Gaussian YOLO, config.is_gaussian_yolo) the raw
    layout is [t_xywh, sigma_xywh, obj, classes] and the decoded
    objectness is multiplied by the localization certainty
    (1 - mean sigma), Choi et al. ICCV 2019's detection criterion — the
    DECODED layout stays [xy, wh, score, probs] so every downstream
    consumer (NMS, post-process, evaluator) works unchanged.
    """
    raw = raw.astype(jnp.float32)
    # jax.nn.sigmoid for a gradient that is finite at extreme logits
    # (see ops/loss.py _flat_decode note)
    hi = min(1.0 - eps, _SAFE_HI)
    xy = jnp.clip(jax.nn.sigmoid(raw[..., 0:2]), eps, hi)
    xy = xy + left_top
    # exp clamp mirrors ops/loss.py: overflow guard, inactive normally
    wh = jnp.exp(jnp.clip(raw[..., 2:4], -15.0, 15.0)) * anchors
    si = 8 if gaussian else 4
    score = jnp.clip(jax.nn.sigmoid(raw[..., si:si + 1]), eps, hi)
    if gaussian:
        sigma = jnp.clip(jax.nn.sigmoid(raw[..., 4:8]), eps, hi)
        certainty = 1.0 - jnp.mean(sigma, axis=-1, keepdims=True)
        score = jnp.clip(score * certainty, eps, hi)
    if class_num >= 1:
        probs = jnp.clip(jax.nn.softmax(raw[..., si + 1:], axis=-1),
                         eps, hi)
        decoded = jnp.concatenate([xy, wh, score, probs], axis=-1)
    else:
        decoded = jnp.concatenate([xy, wh, score], axis=-1)
    half = wh / 2.0
    boxes = jnp.concatenate([xy - half, xy + half], axis=-1)
    return raw[..., 0:4], decoded, boxes


class YOLOv3Decoder:
    """Precomputes per-head grids/anchors from a Config and decodes the
    three raw head tensors (N,H,W,C) or (N,H,W,B,5+C)."""

    def __init__(self, cfg: Config):
        self.cfg = cfg
        self.class_num = cfg.class_num
        self.box_len = cfg.box_len
        self.box_num = cfg.box_num
        self.grids = cfg.head_grid_sizes
        self.left_tops = [jnp.asarray(grid_left_top(h, w))
                          for (h, w) in self.grids]
        self.anchors = [jnp.asarray(anchors_in_grid_units(a, g))
                        for a, g in zip(cfg.anchor_boxes, self.grids)]

    def _reshape(self, raw, head_idx):
        h, w = self.grids[head_idx]
        b = self.box_num[head_idx]
        return jnp.reshape(raw, (-1, h, w, b, self.box_len))

    def decode(self, raw_heads: Sequence) -> List[Tuple]:
        """raw_heads: (p8, p16, p32).  Returns, per head,
        (raw_txywh, decoded, corner_boxes) like yolov3_decoder.py:84-87."""
        out = []
        for i, raw in enumerate(raw_heads):
            if raw.ndim == 4:
                raw = self._reshape(raw, i)
            out.append(decode_single_head(raw, self.left_tops[i],
                                          self.anchors[i], self.class_num,
                                          self.cfg.epsilon,
                                          self.cfg.is_gaussian_yolo))
        return out
