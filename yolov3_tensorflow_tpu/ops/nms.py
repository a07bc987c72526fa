"""On-device batched NMS.

The reference's inference post-process is pure Python/NumPy on the host:
per-head score filtering (yolov3_post_process.py:43-76) followed by a
greedy per-class NMS written as a Python while-loop with list deletion
(yolov3_post_process.py:107-129).  That is the throughput bottleneck of the
reference's test/predict path.

TPU-native re-design: everything runs on device with static shapes —
  1. score filter becomes a masked top-K selection over the flattened
     (H*W*B) candidates of all three heads at once;
  2. greedy per-class NMS becomes a fori_loop over the K sorted candidates
     with a vectorized IOU row per step (O(K^2) VPU work, K = 128-256);
  3. the result is a fixed-size (K, 10) tensor
     [x0, y0, x1, y1, conf, cls_prob, cls, score, head_idx, keep]
     (columns 0-7 as yolov3_post_process.py:73-75, plus the head-provenance
     index the reference tags on in apply_nms:81-89 and a keep flag in
     place of dynamic-length lists).

Batched over images with vmap; semantics match the reference greedy
algorithm: candidates sorted by score descending, a surviving candidate
suppresses every lower-scored candidate of the SAME class with
IOU > nms_thresh (strict).
"""
from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp

from ..config import Config
from .decoder import YOLOv3Decoder

NMS_COLS = 10  # x0 y0 x1 y1 conf cls_prob cls score head keep


def _pairwise_iou_row(box, boxes):
    """IOU of one corner box vs (K, 4) boxes (yolov3_post_process.py:131-159
    semantics: non-positive overlap in either axis -> 0)."""
    lt = jnp.maximum(box[0:2], boxes[:, 0:2])
    rb = jnp.minimum(box[2:4], boxes[:, 2:4])
    wh = jnp.maximum(rb - lt, 0.0)
    inter = wh[:, 0] * wh[:, 1]
    area_a = (box[2] - box[0]) * (box[3] - box[1])
    area_b = (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])
    union = jnp.maximum(area_a + area_b - inter, 1e-12)
    return inter / union


def greedy_nms(boxes, scores, classes, valid, nms_thresh: float):
    """Greedy class-aware NMS over score-sorted candidates.

    boxes (K,4) corner, scores (K,), classes (K,), valid (K,) bool.
    Returns keep mask (K,) aligned with the INPUT order.
    """
    k = boxes.shape[0]
    neg = jnp.where(valid, scores, -jnp.inf)
    order = jnp.argsort(-neg)
    sb, scls, sv = boxes[order], classes[order], valid[order]

    def body(i, alive):
        iou_row = _pairwise_iou_row(sb[i], sb)
        idx = jnp.arange(k)
        # alive starts as sv and is only ever cleared, so alive[i]
        # already implies sv[i]
        suppress = alive[i] & (iou_row > nms_thresh) & \
            (scls == scls[i]) & (idx > i)
        return alive & jnp.logical_not(suppress)

    alive = jax.lax.fori_loop(0, k, body, sv)
    # scatter back to input order
    keep = jnp.zeros((k,), bool).at[order].set(alive)
    return keep & valid


class BatchedNMS:
    """Filter + cross-head per-class NMS, fully on device.

    ``__call__(raw_heads)`` -> (N, K, 10) detections tensor.  Candidates
    below ``confidence_thresh`` never enter; boxes are in normalized [0,1]
    coordinates (the reference normalizes by grid size,
    yolov3_post_process.py:65-68).
    """

    def __init__(self, cfg: Config, score_thresh: float = None,
                 nms_thresh: float = None, top_k: int = None):
        self.cfg = cfg
        self.decoder = YOLOv3Decoder(cfg)
        self.score_thresh = (cfg.confidence_thresh if score_thresh is None
                             else score_thresh)
        self.nms_thresh = cfg.nms_thresh if nms_thresh is None else nms_thresh
        self.top_k = cfg.max_detections if top_k is None else top_k

    def _candidates(self, decoded_heads):
        """Flatten the three heads into one candidate table per image."""
        cfg = self.cfg
        cols = []
        for head_idx, (_, decoded, boxes) in enumerate(decoded_heads):
            h, w = cfg.head_grid_sizes[head_idx]
            n = decoded.shape[0]
            conf = decoded[..., 4].reshape(n, -1)
            if cfg.class_num >= 1:
                cls_prob = jnp.max(decoded[..., 5:], axis=-1).reshape(n, -1)
                cls_idx = jnp.argmax(decoded[..., 5:], axis=-1).reshape(
                    n, -1).astype(jnp.float32)
                score = conf * cls_prob
            else:
                cls_prob = jnp.ones_like(conf)
                cls_idx = jnp.zeros_like(conf)
                score = conf
            scale = jnp.asarray([w, h, w, h], jnp.float32)
            nboxes = (boxes / scale).reshape(n, -1, 4)
            head_col = jnp.full_like(conf, float(head_idx))
            cols.append(jnp.concatenate([
                nboxes,
                conf[..., None], cls_prob[..., None], cls_idx[..., None],
                score[..., None], head_col[..., None]], axis=-1))
        return jnp.concatenate(cols, axis=1)  # (N, T, 9)

    def __call__(self, raw_heads: Sequence,
                 return_candidate_counts: bool = False):
        """-> (N, K, 10) detections; with return_candidate_counts also the
        (N,) number of above-threshold candidates BEFORE the static top-K
        truncation, so callers can detect dense scenes that overflow
        ``max_detections`` (the reference's host NMS had no cap; ours is
        static-shape — don't let the cap be silent)."""
        decoded = self.decoder.decode(raw_heads)
        cand = self._candidates(decoded)  # (N, T, 9)

        def per_image(c):
            score = c[:, 7]
            valid = score > self.score_thresh
            n_above = jnp.sum(valid.astype(jnp.int32))
            masked = jnp.where(valid, score, -jnp.inf)
            k = min(self.top_k, c.shape[0])
            top_score, top_idx = jax.lax.top_k(masked, k)
            sel = c[top_idx]
            sel_valid = top_score > self.score_thresh
            keep = greedy_nms(sel[:, 0:4], sel[:, 7], sel[:, 6], sel_valid,
                              self.nms_thresh)
            det = jnp.concatenate(
                [sel, keep[:, None].astype(jnp.float32)], axis=-1)
            return det, n_above

        det, counts = jax.vmap(per_image)(cand)  # (N, K, 10), (N,)
        if return_candidate_counts:
            return det, counts
        return det
