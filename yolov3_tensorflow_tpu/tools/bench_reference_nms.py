"""Measure the reference's host-side post-process as the inference
baseline (VERDICT r1 item 6).

The reference runs detection post-processing per image on the host in
pure Python/NumPy: threshold-filter each head's decoded predictions
(reference: yolov3/yolov3_post_process.py:20-76), then a greedy
O(n^2) class-aware NMS implemented as a sorted-list while/del loop
(yolov3_post_process.py:107-159).  This tool re-implements that
pipeline faithfully (same data flow: per-image, per-head numpy filter
-> python list NMS with pairwise scalar IOU) and measures its
throughput on this host, so "the device NMS path beats the reference
by Nx" is a measurement rather than a claim.

Synthetic inputs mimic real decoded heads at 416x416 with a controlled
number of above-threshold candidates per image.

Usage: python -m yolov3_tensorflow_tpu.tools.bench_reference_nms
           [--images 64] [--candidates 60]
"""
from __future__ import annotations

import argparse
import time

import numpy as np


# ------------------------------------------------------------------ #
# faithful re-implementation of the reference host pipeline
def filter_single_head(prediction, boxes, score_thresh):
    """(H, W, B, 5+cls) decoded head -> (k, 8) rows
    [x0 y0 x1 y1 iou prob cls score] (yolov3_post_process.py:44-76)."""
    height, width, _, box_len = prediction.shape
    score = prediction[..., 4]
    cls_prob = np.ones_like(score)
    cls_idx = np.zeros_like(score)
    if box_len > 5:
        cls_prob = np.max(prediction[..., 5:], axis=-1)
        cls_idx = np.argmax(prediction[..., 5:], axis=-1)
        score = cls_prob * prediction[..., 4]
    keep = np.where(score.reshape(-1) > score_thresh)
    if len(keep[0]) == 0:
        return np.empty((0, 8), np.float64)
    cols = [np.take(boxes[..., 0], keep) / width,
            np.take(boxes[..., 1], keep) / height,
            np.take(boxes[..., 2], keep) / width,
            np.take(boxes[..., 3], keep) / height,
            np.take(prediction[..., 4], keep),
            np.take(cls_prob, keep),
            np.take(cls_idx.astype(np.float64), keep),
            np.take(score, keep)]
    return np.transpose(np.concatenate(cols, axis=0))


def scalar_iou(a, b):
    w = min(a[2], b[2]) - max(a[0], b[0])
    h = min(a[3], b[3]) - max(a[1], b[1])
    if w <= 0 or h <= 0:
        return 0.0
    inter = w * h
    union = ((a[2] - a[0]) * (a[3] - a[1])
             + (b[2] - b[0]) * (b[3] - b[1]) - inter)
    return inter / union


def greedy_list_nms(rows, nms_thresh):
    """The reference's sorted-list while/del loop with per-pair scalar
    IOU in Python (yolov3_post_process.py:107-130)."""
    sorted_boxes = sorted(rows, key=lambda d: d[7], reverse=True)
    index, box_num = 0, len(sorted_boxes) - 1
    while index < box_num:
        same = [(index + 1 + i, b)
                for i, b in enumerate(sorted_boxes[index + 1:])
                if b[6] == sorted_boxes[index][6]]
        removed = 0
        for i, b in same:
            if scalar_iou(sorted_boxes[index], b) > nms_thresh:
                del sorted_boxes[i - removed]
                removed += 1
                box_num -= 1
        index += 1
    return sorted_boxes


def host_postprocess(heads, boxes, score_thresh, nms_thresh):
    per_head = [filter_single_head(p, b, score_thresh)
                for p, b in zip(heads, boxes)]
    rows = np.concatenate(per_head, axis=0)
    return greedy_list_nms(list(rows), nms_thresh)


# ------------------------------------------------------------------ #
def synth_heads(rng, class_num, candidates):
    """Decoded heads at 416x416 (grids 52/26/13, B=3/2/3) with roughly
    `candidates` above-threshold boxes spread over the heads."""
    shapes = [(52, 52, 3), (26, 26, 2), (13, 13, 3)]
    heads, boxes = [], []
    for (h, w, b) in shapes:
        pred = rng.rand(h, w, b, 5 + class_num) * 0.3  # below threshold
        n_hot = max(1, candidates // 3)
        idx = (rng.randint(0, h, n_hot), rng.randint(0, w, n_hot),
               rng.randint(0, b, n_hot))
        pred[..., 4][idx] = 0.6 + 0.4 * rng.rand(n_hot)
        cls = rng.randint(5, 5 + class_num, n_hot)
        pred[idx[0], idx[1], idx[2], cls] = 0.9
        bx = np.stack([rng.rand(h, w, b) * w, rng.rand(h, w, b) * h,
                       np.zeros((h, w, b)), np.zeros((h, w, b))], -1)
        bx[..., 2] = bx[..., 0] + 1 + rng.rand(h, w, b) * w * 0.3
        bx[..., 3] = bx[..., 1] + 1 + rng.rand(h, w, b) * h * 0.3
        heads.append(pred)
        boxes.append(bx)
    return heads, boxes


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--images", type=int, default=64)
    ap.add_argument("--candidates", type=int, default=60,
                    help="~above-threshold boxes per image")
    ap.add_argument("--class_num", type=int, default=13)
    ap.add_argument("--score_thresh", type=float, default=0.5)
    ap.add_argument("--nms_thresh", type=float, default=0.4)
    a = ap.parse_args(argv)
    rng = np.random.RandomState(0)
    data = [synth_heads(rng, a.class_num, a.candidates)
            for _ in range(a.images)]
    # warmup
    host_postprocess(*data[0], a.score_thresh, a.nms_thresh)
    t0 = time.perf_counter()
    kept = 0
    for heads, boxes in data:
        kept += len(host_postprocess(heads, boxes, a.score_thresh,
                                     a.nms_thresh))
    dt = time.perf_counter() - t0
    print(f"reference host post-process: {a.images / dt:.1f} img/s "
          f"({a.candidates} candidates/img, {kept / a.images:.1f} "
          f"kept/img, single host core)")
    return a.images / dt


if __name__ == "__main__":
    main()
