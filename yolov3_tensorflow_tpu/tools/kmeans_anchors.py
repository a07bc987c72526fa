"""k-means++ anchor clustering (reference: utils/anchors/kmeans.py:10-84,
utils/anchors/bounding_box.py:23-34, utils/anchors/kmeans_anchors.py:12-96).

Clusters the (w, h) boxes of a label file with 1-IOU distance and k-means++
initialization, prints the centers for pasting into Config.anchor_boxes,
and can plot the IOU/sample-ratio Pareto curves.

Vectorized NumPy throughout (the reference loops per point); the distance
between a box (w1,h1) and a center (w2,h2) is 1 - IOU of the two boxes
anchored at a common corner (bounding_box.py:23-34).
"""
from __future__ import annotations

import argparse
from typing import Tuple

import numpy as np


def iou_wh(boxes: np.ndarray, centers: np.ndarray) -> np.ndarray:
    """IOU of (n,2) wh-boxes vs (k,2) wh-centers, corner-anchored."""
    inter = (np.minimum(boxes[:, None, 0], centers[None, :, 0])
             * np.minimum(boxes[:, None, 1], centers[None, :, 1]))
    area_b = boxes[:, 0] * boxes[:, 1]
    area_c = centers[:, 0] * centers[:, 1]
    union = np.maximum(area_b[:, None] + area_c[None, :] - inter, 1e-12)
    return inter / union


def kmeans_pp_init(boxes: np.ndarray, k: int,
                   rng: np.random.RandomState) -> np.ndarray:
    """k-means++ seeding with 1-IOU distance (kmeans.py:68-84)."""
    centers = [boxes[rng.randint(len(boxes))]]
    for _ in range(1, k):
        d = 1.0 - iou_wh(boxes, np.asarray(centers))
        dmin = d.min(axis=1)
        probs = dmin / max(dmin.sum(), 1e-12)
        centers.append(boxes[rng.choice(len(boxes), p=probs)])
    return np.asarray(centers)


def cluster_anchors(boxes: np.ndarray, k: int = 6, iters: int = 500,
                    seed: int = 6) -> Tuple[np.ndarray, np.ndarray]:
    """Cluster (n,2) normalized wh boxes -> (centers (k,2), assignment)."""
    rng = np.random.RandomState(seed)
    centers = kmeans_pp_init(boxes, k, rng)
    assign = np.full(len(boxes), -1)
    for _ in range(iters):
        d = 1.0 - iou_wh(boxes, centers)
        new_assign = d.argmin(axis=1)
        if np.array_equal(new_assign, assign):
            break
        assign = new_assign
        for j in range(k):
            members = boxes[assign == j]
            if len(members):
                centers[j] = members.mean(axis=0)  # kmeans mean (kmeans.py)
    order = np.argsort(centers[:, 0] * centers[:, 1])
    return centers[order], assign


def parse_boxes(label_file: str) -> Tuple[np.ndarray, np.ndarray]:
    """Label file -> ((n,2) wh boxes, (n,) classes)
    (kmeans_anchors.py:12-40)."""
    whs, classes = [], []
    with open(label_file) as f:
        for line in f:
            vals = line.split()[1:]
            arr = np.asarray([float(v) for v in vals]).reshape(-1, 5)
            whs.extend(arr[:, 2:4])
            classes.extend(arr[:, 4])
    return np.asarray(whs, np.float64), np.asarray(classes)


def mean_iou(boxes: np.ndarray, centers: np.ndarray) -> float:
    return float(iou_wh(boxes, centers).max(axis=1).mean())


def pareto_curve(boxes: np.ndarray, centers: np.ndarray,
                 thresholds=None):
    """IOU-threshold vs covered-sample-ratio points
    (bounding_box.py:112-133)."""
    thresholds = thresholds if thresholds is not None else np.linspace(
        0.1, 0.9, 17)
    best = iou_wh(boxes, centers).max(axis=1)
    return [(float(t), float((best >= t).mean())) for t in thresholds]


def main(argv=None):
    p = argparse.ArgumentParser(description="k-means++ anchor clustering")
    p.add_argument("label_file")
    p.add_argument("--k", type=int, default=6)
    p.add_argument("--iters", type=int, default=500)
    p.add_argument("--plot", default=None,
                   help="optional path for scatter/Pareto plot png")
    args = p.parse_args(argv)
    boxes, classes = parse_boxes(args.label_file)
    centers, assign = cluster_anchors(boxes, args.k, args.iters)
    print("anchor centers [W, H] (paste into Config.anchor_boxes):")
    for c in centers:
        print(f"  ({c[0]}, {c[1]}),")
    print(f"mean best IOU: {mean_iou(boxes, centers):.4f}")
    for t, r in pareto_curve(boxes, centers):
        print(f"  IOU>={t:.2f}: {100 * r:.1f}% of boxes covered")
    if args.plot:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        # per-class cluster scatters (reference kmeans_anchors.py:65-70
        # plots one figure per class) as subplot panels after the global
        # scatter + Pareto pair
        cls_ids = np.unique(classes).astype(int) if len(classes) else []
        ncols = 2 + len(cls_ids)
        fig, axes = plt.subplots(1, ncols, figsize=(5 * ncols, 4))
        a1, a2 = axes[0], axes[1]
        a1.scatter(boxes[:, 0], boxes[:, 1], c=assign, s=8)
        a1.scatter(centers[:, 0], centers[:, 1], c="red", marker="x")
        a1.set_title(f"wh clusters ({len(boxes)})")
        pts = pareto_curve(boxes, centers)
        a2.plot([t for t, _ in pts], [r for _, r in pts], marker="o")
        a2.set_title("coverage vs IOU threshold")
        for ax, cid in zip(axes[2:], cls_ids):
            pos = classes.astype(int) == cid
            ax.scatter(boxes[pos, 0], boxes[pos, 1], c=assign[pos], s=8,
                       vmin=0, vmax=len(centers) - 1)
            ax.scatter(centers[:, 0], centers[:, 1], c="red", marker="x")
            ax.set_title(f"class {cid} ({int(pos.sum())})")
        fig.tight_layout()
        fig.savefig(args.plot, dpi=120)
        print("plot saved to", args.plot)


if __name__ == "__main__":
    main()
