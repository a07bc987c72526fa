"""In-repo mAP evaluation.

The reference computes NO metric in-repo — mAP is explicitly delegated to
the external Cartucho/mAP tool (run.py:78-79, README.md:137).  This module
makes it first-class, in two styles:

* :func:`evaluate_map` — PASCAL-VOC-style per-class average precision at
  a single IOU threshold with all-point interpolation (the Cartucho
  default), greedy matching of score-ranked detections to the
  highest-IOU ground truth.  This is the parity metric.
* :func:`evaluate_map_range` — COCO-style AP averaged over the IOU
  threshold range .50:.05:.95 with 101-point interpolation and COCO
  matching (each detection claims the highest-IOU *unmatched* GT above
  the threshold).  Natural companion of tools/coco_to_labels.py.
"""
from __future__ import annotations

from collections import defaultdict
from typing import Dict, List, Sequence

import numpy as np


def box_iou(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """IOU matrix of (k,4) vs (m,4) corner boxes."""
    if len(a) == 0 or len(b) == 0:
        return np.zeros((len(a), len(b)))
    lt = np.maximum(a[:, None, 0:2], b[None, :, 0:2])
    rb = np.minimum(a[:, None, 2:4], b[None, :, 2:4])
    wh = np.clip(rb - lt, 0, None)
    inter = wh[..., 0] * wh[..., 1]
    area_a = (a[:, 2] - a[:, 0]) * (a[:, 3] - a[:, 1])
    area_b = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
    union = np.maximum(area_a[:, None] + area_b[None, :] - inter, 1e-12)
    return inter / union


def average_precision(recall: np.ndarray, precision: np.ndarray) -> float:
    """All-point interpolated AP (VOC2012 / Cartucho default)."""
    mrec = np.concatenate([[0.0], recall, [1.0]])
    mpre = np.concatenate([[0.0], precision, [0.0]])
    for i in range(len(mpre) - 2, -1, -1):
        mpre[i] = max(mpre[i], mpre[i + 1])
    idx = np.where(mrec[1:] != mrec[:-1])[0]
    return float(np.sum((mrec[idx + 1] - mrec[idx]) * mpre[idx + 1]))


def average_precision_101(recall: np.ndarray,
                          precision: np.ndarray) -> float:
    """COCO 101-point interpolated AP: the mean over the recall grid
    {0.00, 0.01, ..., 1.00} of the maximum precision achieved at any
    recall >= that grid point (pycocotools' accumulate convention)."""
    if len(recall) == 0:
        return 0.0
    # monotone non-increasing precision envelope (right to left)
    mpre = np.asarray(precision, float).copy()
    for i in range(len(mpre) - 2, -1, -1):
        mpre[i] = max(mpre[i], mpre[i + 1])
    grid = np.linspace(0.0, 1.0, 101)
    # first detection index whose recall >= grid point; past-the-end
    # grid points contribute precision 0
    idx = np.searchsorted(recall, grid, side="left")
    vals = np.where(idx < len(mpre), mpre[np.minimum(idx, len(mpre) - 1)],
                    0.0)
    return float(vals.mean())


def _gather(detections, ground_truths):
    """Shared indexing pass: per-class score-sorted detection records and
    per-image per-class GT boxes (parsed once — the per-class loops would
    otherwise re-scan every GT array per class and per threshold)."""
    per_class_dets = defaultdict(list)
    gt_count = defaultdict(int)
    for img_idx, dets in enumerate(detections):
        for row in np.asarray(dets).reshape(-1, 6):
            per_class_dets[int(row[5])].append((row[4], img_idx, row[0:4]))
    for cls in per_class_dets:
        per_class_dets[cls].sort(key=lambda d: -d[0])
    per_img_cls_gts = []
    for gts in ground_truths:
        g = np.asarray(gts).reshape(-1, 5)
        per_img_cls_gts.append(
            {int(c): g[g[:, 4] == c, 0:4] for c in np.unique(g[:, 4])})
        for c, boxes in per_img_cls_gts[-1].items():
            gt_count[c] += len(boxes)
    return per_class_dets, per_img_cls_gts, gt_count


def _class_tp_fp(dets, per_img_cls_gts, cls, iou_thresh,
                 coco_match: bool):
    """Greedy TP/FP flags for one class's score-sorted detections.

    ``coco_match=False``: VOC/Cartucho — a detection is matched against
    its single highest-IOU GT; if that GT is already claimed the
    detection is a false positive even when another GT above the
    threshold remains free.  ``coco_match=True``: COCO — the detection
    claims the highest-IOU *unmatched* GT above the threshold."""
    matched = {}  # image_idx -> per-GT-box claimed flags, built lazily
    tp = np.zeros(len(dets))
    fp = np.zeros(len(dets))
    for d_idx, (score, img_idx, box) in enumerate(dets):
        gts_cls = per_img_cls_gts[img_idx].get(cls)
        if gts_cls is None or len(gts_cls) == 0:
            fp[d_idx] = 1
            continue
        if img_idx not in matched:
            matched[img_idx] = np.zeros(len(gts_cls), bool)
        ious = box_iou(box[None, :], gts_cls)[0]
        if coco_match:
            free = np.where((ious >= iou_thresh) & ~matched[img_idx])[0]
            if len(free):
                tp[d_idx] = 1
                matched[img_idx][free[np.argmax(ious[free])]] = True
            else:
                fp[d_idx] = 1
        else:
            best = int(np.argmax(ious))
            if ious[best] >= iou_thresh and not matched[img_idx][best]:
                tp[d_idx] = 1
                matched[img_idx][best] = True
            else:
                fp[d_idx] = 1
    return tp, fp


def _pr_curve(dets, per_img_cls_gts, cls, n_gt, iou_thresh, coco_match):
    """Score-ordered precision/recall arrays for one class (the curves
    behind an AP number — what Cartucho/mAP plots per class)."""
    tp, fp = _class_tp_fp(dets, per_img_cls_gts, cls, iou_thresh,
                          coco_match)
    ctp, cfp = np.cumsum(tp), np.cumsum(fp)
    return {"recall": ctp / n_gt,
            "precision": ctp / np.maximum(ctp + cfp, 1e-12),
            "scores": np.array([d[0] for d in dets])}


def evaluate_map_range(
    detections: Sequence[np.ndarray],
    ground_truths: Sequence[np.ndarray],
    iou_thresholds: Sequence[float] = (),
    with_curves: bool = False,
) -> Dict:
    """COCO-style mAP over an IOU-threshold range (default .50:.05:.95).

    Same input format as :func:`evaluate_map`.  Returns
    ``{"mAP": mean over thresholds and classes, "mAP@0.5": ...,
    "mAP@0.75": ..., "per_threshold": {t: mAP_t},
    "per_class": {cls: AP averaged over thresholds},
    "num_gt": ..., "false_positive_classes": ...}``.

    Per COCO convention each AP uses 101-point interpolation and
    unmatched-GT greedy matching; like Cartucho (and pycocotools' -1
    sentinel), classes without ground truth are excluded from every
    mean rather than scored 0.
    """
    thresholds = [round(float(t), 2) for t in (
        iou_thresholds if len(iou_thresholds)
        else np.arange(10) * 0.05 + 0.5)]
    per_class_dets, per_img_cls_gts, gt_count = _gather(
        detections, ground_truths)
    classes = sorted(set(gt_count) | set(per_class_dets))
    ap = {}  # (threshold, cls) -> AP
    for cls in classes:
        n_gt = gt_count.get(cls, 0)
        dets = per_class_dets.get(cls, [])
        for t in thresholds:
            if n_gt == 0:
                ap[(t, cls)] = float("nan")
                continue
            tp, fp = _class_tp_fp(dets, per_img_cls_gts, cls, t, True)
            ctp, cfp = np.cumsum(tp), np.cumsum(fp)
            ap[(t, cls)] = average_precision_101(
                ctp / n_gt, ctp / np.maximum(ctp + cfp, 1e-12))

    def _mean(vals):
        real = [v for v in vals if not np.isnan(v)]
        return float(np.mean(real)) if real else 0.0

    per_threshold = {t: _mean([ap[(t, c)] for c in classes])
                     for t in thresholds}
    per_class = {c: _mean([ap[(t, c)] for t in thresholds])
                 for c in classes if gt_count.get(c, 0) > 0}
    per_class.update({c: float("nan") for c in classes
                      if gt_count.get(c, 0) == 0})
    fp_classes = {cls: len(per_class_dets[cls])
                  for cls in per_class_dets if gt_count.get(cls, 0) == 0}
    report = {"mAP": _mean(per_threshold.values()),
              "per_threshold": per_threshold,
              "per_class": per_class, "num_gt": dict(gt_count),
              "false_positive_classes": fp_classes}
    for t in (0.5, 0.75):
        if t in per_threshold:
            report[f"mAP@{t}"] = per_threshold[t]
    if with_curves:
        # curves at the range's base threshold (0.5 by default) — the
        # one Cartucho-style per-class plots are drawn at
        t0 = thresholds[0]
        report["pr_curves"] = {
            cls: _pr_curve(per_class_dets[cls], per_img_cls_gts, cls,
                           gt_count[cls], t0, coco_match=True)
            for cls in classes
            if gt_count.get(cls, 0) > 0 and per_class_dets.get(cls)}
        report["pr_curves_iou"] = t0
    return report


def evaluate_map(
    detections: Sequence[np.ndarray],
    ground_truths: Sequence[np.ndarray],
    iou_thresh: float = 0.5,
    with_curves: bool = False,
) -> Dict:
    """Compute mAP@iou_thresh.

    detections: per image, (k, 6) rows [x0 y0 x1 y1 score class]
    ground_truths: per image, (m, 5) rows [x0 y0 x1 y1 class]
    All boxes in the same coordinate space.
    Returns {"mAP": float, "per_class": {cls: ap}, "num_gt": {cls: n},
    "false_positive_classes": {cls: n_dets}}.

    Cartucho/mAP (the tool the reference delegates to, run.py:78-79)
    averages only over classes present in the ground truth; classes that
    have detections but zero GT are therefore EXCLUDED from the mean (their
    AP is NaN) and reported in ``false_positive_classes`` instead.
    """
    per_class_dets, per_img_cls_gts, gt_count = _gather(
        detections, ground_truths)
    aps = {}
    for cls in sorted(set(gt_count) | set(per_class_dets)):
        n_gt = gt_count.get(cls, 0)
        dets = per_class_dets.get(cls, [])
        if n_gt == 0:
            # zero-GT class: excluded from the mAP mean (Cartucho convention)
            aps[cls] = float("nan")
            continue
        tp, fp = _class_tp_fp(dets, per_img_cls_gts, cls, iou_thresh,
                              coco_match=False)
        ctp, cfp = np.cumsum(tp), np.cumsum(fp)
        recall = ctp / n_gt
        precision = ctp / np.maximum(ctp + cfp, 1e-12)
        aps[cls] = average_precision(recall, precision)

    real = [v for v in aps.values() if not np.isnan(v)]
    fp_classes = {cls: len(per_class_dets[cls])
                  for cls in per_class_dets if gt_count.get(cls, 0) == 0}
    report = {"mAP": float(np.mean(real)) if real else 0.0,
              "per_class": aps, "num_gt": dict(gt_count),
              "false_positive_classes": fp_classes}
    if with_curves:
        report["pr_curves"] = {
            cls: _pr_curve(per_class_dets[cls], per_img_cls_gts, cls,
                           gt_count[cls], iou_thresh, coco_match=False)
            for cls in aps
            if gt_count.get(cls, 0) > 0 and per_class_dets.get(cls)}
        report["pr_curves_iou"] = iou_thresh
    return report


def detections_to_eval_format(per_head_boxes: List[np.ndarray]) -> np.ndarray:
    """Per-head (k, 8) arrays [x0 y0 x1 y1 conf prob cls score] ->
    flat (k, 6) [x0 y0 x1 y1 score cls] for evaluate_map."""
    rows = [np.asarray(h).reshape(-1, 8) for h in per_head_boxes]
    allr = np.concatenate(rows, axis=0) if rows else np.zeros((0, 8))
    if len(allr) == 0:
        return np.zeros((0, 6))
    return np.stack([allr[:, 0], allr[:, 1], allr[:, 2], allr[:, 3],
                     allr[:, 7], allr[:, 6]], axis=1)


def labels_to_eval_format(labels: np.ndarray, image_wh) -> np.ndarray:
    """(M, 5) normalized cxcywh+cls (-1 padded) -> (m, 5) corner boxes in
    image_wh scale for evaluate_map."""
    labels = np.asarray(labels).reshape(-1, 5)
    valid = labels[:, 0] >= 0
    lab = labels[valid]
    w, h = image_wh
    cx, cy = lab[:, 0] * w, lab[:, 1] * h
    bw, bh = lab[:, 2] * w, lab[:, 3] * h
    return np.stack([cx - bw / 2, cy - bh / 2, cx + bw / 2, cy + bh / 2,
                     lab[:, 4]], axis=1)


def score_dataset(cfg, forward, ds, save_path: str = "",
                  map_style: str = "voc", with_curves: bool = False):
    """The ``run.py --mode test`` scoring loop, shared with the parity
    harness (tools/map_parity.py): iterate a test Dataset, run a
    pluggable ``forward(batch) -> heads``, decode + NMS + accumulate,
    and return :func:`evaluate_map`'s report (reference run.py:41-80's
    evaluation flow; ``map_style="coco"`` returns
    :func:`evaluate_map_range`'s .50:.05:.95 report instead).
    ``save_path`` non-empty additionally writes the visualized
    detections per image.

    The loader wraps partial batches for static shapes; wrapped
    duplicate paths are scored once.  With ``cfg.class_num == 0``
    (single-class mode) ground-truth class ids collapse to 0 to match
    the detector's all-class-0 output (ops/nms.py:108).
    """
    import os

    from .postprocess import YOLOv3PostProcessor, resize_boxes, visualize

    if map_style not in ("voc", "coco"):
        # before the scoring loop: a typo'd style must not cost a full
        # dataset pass (library callers bypass the CLI's choices= gate)
        raise ValueError(f"map_style={map_style!r}: expected 'voc' "
                         "or 'coco'")

    post = YOLOv3PostProcessor(cfg)
    input_box_size = np.array([cfg.input_image_size[1],
                               cfg.input_image_size[0]] * 2, np.float64)
    all_dets, all_gts = [], []
    seen = set()
    if save_path:
        os.makedirs(save_path, exist_ok=True)
    for batch in ds.batches(repeat=False):
        heads = forward(batch)
        per_image = post.process(heads)
        images = batch.images_float() if save_path else batch.images
        for img, labels, path, head_boxes in zip(
                images, batch.labels, batch.paths, per_image):
            if path in seen:
                continue
            seen.add(path)
            in_boxes = resize_boxes(head_boxes, input_box_size)
            if save_path:
                out = os.path.join(save_path, os.path.basename(path))
                visualize(img, in_boxes, input_box_size, out)
            all_dets.append(detections_to_eval_format(in_boxes))
            gts = labels_to_eval_format(
                labels, (cfg.input_image_size[1], cfg.input_image_size[0]))
            if cfg.class_num == 0 and len(gts):
                gts[:, 4] = 0.0  # single-class mode: all objects class 0
            all_gts.append(gts)
    if map_style == "coco":
        return evaluate_map_range(all_dets, all_gts,
                                  with_curves=with_curves)
    return evaluate_map(all_dets, all_gts, with_curves=with_curves)
