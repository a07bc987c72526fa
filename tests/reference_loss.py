"""Independent NumPy oracle for the YOLOv3 loss.

Written directly from the reference's documented semantics
(yolov3/yolov3_loss.py, see SURVEY.md §2) as a slow, per-image,
loop-based implementation.  Deliberately structured differently from
ops/loss.py (python loops over objects/cells instead of broadcasts) so a
bug in the vectorized version cannot be mirrored here.
"""
from __future__ import annotations

import numpy as np

EPS = 1e-8


def _sigmoid(x):
    return 1.0 / (1.0 + np.exp(-x))


def _iou_corner(a, b):
    lt = np.maximum(a[0:2], b[0:2])
    rb = np.minimum(a[2:4], b[2:4])
    wh = np.maximum(rb - lt, 0.0)
    inter = wh[0] * wh[1]
    area_a = (a[2] - a[0]) * (a[3] - a[1])
    area_b = (b[2] - b[0]) * (b[3] - b[1])
    return inter / (area_a + area_b - inter), inter, area_b


def decode_head_np(raw, anchors_grid, class_num, gaussian=False):
    """raw (H,W,B,box_len) -> decoded (H,W,B,5+C) and corner boxes.

    With ``gaussian`` (Gaussian YOLO layout [t_xywh, sigma_xywh, obj,
    cls]) the decoded array keeps the standard 5+C layout (score = plain
    objectness sigmoid, as the LOSS consumes it) and the per-anchor
    sigmoid sigmas are returned as a third (H,W,B,4) array.
    """
    h, w, b, _ = raw.shape
    si = 8 if gaussian else 4
    dec = np.zeros(raw.shape[:3] + (5 + class_num,))
    sig = np.zeros((h, w, b, 4))
    boxes = np.zeros((h, w, b, 4))
    for i in range(h):
        for j in range(w):
            for k in range(b):
                t = raw[i, j, k]
                xy = np.clip(_sigmoid(t[0:2]), EPS, 1 - EPS) + [j, i]
                wh = np.exp(t[2:4]) * anchors_grid[k]
                sc = np.clip(_sigmoid(t[si]), EPS, 1 - EPS)
                dec[i, j, k, 0:2] = xy
                dec[i, j, k, 2:4] = wh
                dec[i, j, k, 4] = sc
                if gaussian:
                    sig[i, j, k] = np.clip(_sigmoid(t[4:8]), EPS, 1 - EPS)
                if class_num >= 1:
                    logits = t[si + 1:] - t[si + 1:].max()
                    p = np.exp(logits) / np.exp(logits).sum()
                    dec[i, j, k, 5:] = np.clip(p, EPS, 1 - EPS)
                boxes[i, j, k] = [xy[0] - wh[0] / 2, xy[1] - wh[1] / 2,
                                  xy[0] + wh[0] / 2, xy[1] + wh[1] / 2]
    if gaussian:
        return dec, boxes, sig
    return dec, boxes


def reference_loss(raw_heads, targets, cfg, image_count=10 ** 9,
                   box_weights=None):
    """Full-batch loss; returns (total, breakdown (6,3), new_count).

    box_weights: optional (N, M) per-box loss weights (the mixup hook) —
    weights the obj/xy/wh/cls terms of each box; background geometry is
    unweighted, mirroring ops/loss.py.
    """
    n = targets.shape[0]
    grids = cfg.head_grid_sizes
    anchors = [np.asarray(a) * np.array([g[1], g[0]])
               for a, g in zip(cfg.anchor_boxes, grids)]
    weights = np.asarray(cfg.loss_weights)  # (3,5) [xy, wh, noobj, obj, cls]
    per_image = np.zeros((n, 5, 3))
    rect_img = np.zeros((n, 3))
    ghm = bool(getattr(cfg, "is_gradient_harmonized", False))
    gauss = bool(getattr(cfg, "is_gaussian_yolo", False))
    # GHM-C collection (batch-global per-head density): lists of
    # (score, target, pos_weight) per participating anchor
    ghm_cands = [[], [], []]

    for img in range(n):
        keep = targets[img][:, 0] >= 0
        tgt = targets[img][keep]
        bw_img = (np.ones(len(tgt)) if box_weights is None
                  else np.asarray(box_weights[img])[keep])
        decs, boxess, sigs, resp = [], [], [], []
        for hi in range(3):
            gh, gw = grids[hi]
            bnum = len(cfg.anchor_boxes[hi])
            raw = np.asarray(raw_heads[hi][img], np.float64).reshape(
                gh, gw, bnum, cfg.box_len)
            rect_img[img, hi] = cfg.rectified_loss_weight[hi] * np.sum(
                raw[..., 0:4] ** 2)
            if gauss:
                dec, boxes, sg = decode_head_np(
                    raw, anchors[hi], cfg.class_num, gaussian=True)
                sigs.append(sg)
            else:
                dec, boxes = decode_head_np(raw, anchors[hi],
                                            cfg.class_num)
                sigs.append(None)
            decs.append(dec)
            boxess.append(boxes)
            # responsible stats per object
            obj_stats = []
            for o in tgt:
                txy = o[0:2] * [gw, gh]
                twh = o[2:4] * [gw, gh]
                tbox = [txy[0] - twh[0] / 2, txy[1] - twh[1] / 2,
                        txy[0] + twh[0] / 2, txy[1] + twh[1] / 2]
                col = int(np.clip(np.floor(txy[0]), 0, gw - 1))
                row = int(np.clip(np.floor(txy[1]), 0, gh - 1))
                best_iou, best_b = -1.0, 0
                for k in range(bnum):
                    iou, inter, tarea = _iou_corner(boxes[row, col, k],
                                                    np.asarray(tbox))
                    if cfg.is_tiou_recall:
                        iou = iou * inter / max(tarea, 1e-12)
                    if iou > best_iou:
                        best_iou, best_b = iou, k
                obj_stats.append((row, col, best_b, best_iou, txy, twh, o))
            resp.append(obj_stats)

        for hi in range(3):
            gh, gw = grids[hi]
            bnum = len(cfg.anchor_boxes[hi])
            dec, boxes = decs[hi], boxess[hi]
            # cross-head winners (>= ties assign to multiple heads)
            winners = []
            for oi in range(len(tgt)):
                mine = resp[hi][oi][3]
                if all(mine >= resp[hj][oi][3] for hj in range(3)):
                    winners.append(oi)
            obj_mask = np.zeros((gh, gw, bnum))
            for oi in winners:
                row, col, bb = resp[hi][oi][:3]
                obj_mask[row, col, bb] = 1.0
            # background: max IOU over GT below threshold and not object
            noobj = 0.0
            for i in range(gh):
                for j in range(gw):
                    for k in range(bnum):
                        max_iou = 0.0
                        for o in tgt:
                            txy = o[0:2] * [gw, gh]
                            twh = o[2:4] * [gw, gh]
                            tbox = np.asarray([
                                txy[0] - twh[0] / 2, txy[1] - twh[1] / 2,
                                txy[0] + twh[0] / 2, txy[1] + twh[1] / 2])
                            iou, inter, tarea = _iou_corner(boxes[i, j, k],
                                                            tbox)
                            if cfg.is_tiou_recall:
                                iou = iou * inter / max(tarea, 1e-12)
                            max_iou = max(max_iou, iou)
                        if max_iou < cfg.iou_thresh and \
                                obj_mask[i, j, k] == 0:
                            if ghm:
                                ghm_cands[hi].append(
                                    (dec[i, j, k, 4], 0.0, 0.0))
                            else:
                                term = -np.log(1 - dec[i, j, k, 4])
                                if cfg.is_focal_loss:
                                    term *= dec[i, j, k, 4] \
                                        ** cfg.focal_gamma
                                noobj += term
            if ghm:
                # positive candidates at ANCHOR granularity: per-box
                # weights accumulate per anchor and clip at 1
                pos_acc = {}
                for oi in winners:
                    row, col, bb = resp[hi][oi][:3]
                    pos_acc[(row, col, bb)] = \
                        pos_acc.get((row, col, bb), 0.0) + bw_img[oi]
                for (row, col, bb), w_acc in pos_acc.items():
                    ghm_cands[hi].append(
                        (dec[row, col, bb, 4], 1.0, min(w_acc, 1.0)))
            obj = xy = wh = cls = 0.0
            for oi in winners:
                row, col, bb, _, txy, twh, o = resp[hi][oi]
                w_o = bw_img[oi]
                pred = dec[row, col, bb]
                if not ghm:
                    term = -np.log(pred[4])
                    if cfg.is_focal_loss:
                        term *= (1 - pred[4]) ** cfg.focal_gamma \
                            * cfg.focal_alpha
                    obj += w_o * term
                scale = 2 - twh[0] * twh[1] / (gh * gw)
                if gauss:
                    # Gaussian YOLO NLL (roadmap README.md:135), same
                    # residual space as the BCE/MSE pair; sigma floored
                    # like the production loss (Config.gaussian_sigma_min
                    # — the round-4 objectness-starvation fix)
                    sg = np.maximum(
                        sigs[hi][row, col, bb],
                        getattr(cfg, "gaussian_sigma_min", 0.3))
                    ci = np.floor(txy)
                    tf_ = txy - ci
                    pf = np.clip(pred[0:2] - ci, EPS, 1 - EPS)
                    d = np.concatenate(
                        [tf_ - pf, np.log(twh) - np.log(pred[2:4])])
                    nll = (0.5 * np.log(2 * np.pi * sg ** 2)
                           + d ** 2 / (2 * sg ** 2))
                    xy += w_o * scale * np.sum(nll[0:2])
                    wh += w_o * scale * np.sum(nll[2:4])
                elif getattr(cfg, "is_giou_loss", False):
                    # roadmap GIOU (README.md:134): scale * (1 - GIOU)
                    pbox = boxes[row, col, bb]
                    tbox = np.asarray([
                        txy[0] - twh[0] / 2, txy[1] - twh[1] / 2,
                        txy[0] + twh[0] / 2, txy[1] + twh[1] / 2])
                    lt = np.maximum(pbox[0:2], tbox[0:2])
                    rb = np.minimum(pbox[2:4], tbox[2:4])
                    inter = np.prod(np.maximum(rb - lt, 0.0))
                    parea = (pbox[2] - pbox[0]) * (pbox[3] - pbox[1])
                    union = max(parea + twh[0] * twh[1] - inter, 1e-12)
                    elt = np.minimum(pbox[0:2], tbox[0:2])
                    erb = np.maximum(pbox[2:4], tbox[2:4])
                    enclose = max(np.prod(erb - elt), 1e-12)
                    giou = inter / union - (enclose - union) / enclose
                    xy += w_o * scale * (1 - giou)
                else:
                    ci = np.floor(txy)
                    tf_ = txy - ci
                    pf = np.clip(pred[0:2] - ci, EPS, 1 - EPS)
                    xy += w_o * scale * np.sum(-(tf_ * np.log(pf)
                                                 + (1 - tf_) * np.log(1 - pf)))
                    wh += w_o * scale * np.sum(
                        (np.log(twh) - np.log(pred[2:4])) ** 2)
                if cfg.class_num >= 1:
                    onehot = np.zeros(cfg.class_num)
                    onehot[int(o[4])] = 1.0
                    if cfg.is_label_smoothing:
                        e = cfg.label_smoothing_eps
                        onehot = onehot * (1 - e) + e / cfg.class_num
                    cls += w_o * float(np.sum(-onehot * np.log(pred[5:])))
            per_image[img, :, hi] = [
                weights[hi, 0] * xy, weights[hi, 1] * wh,
                weights[hi, 2] * noobj, weights[hi, 3] * obj,
                weights[hi, 4] * cls]

    loss_mat = per_image.mean(axis=0)  # (5,3)
    if ghm:
        # GHM-C: per-head unit-range histogram of g = |score - target|
        # over the batch's participating anchors; weight each CE by
        # 1/(bin_count * nonempty_bins); batch-global sums (the weights
        # sum to 1 across participants — no extra mean over the batch)
        bins = getattr(cfg, "ghm_bins", 30)
        for hi in range(3):
            cands = ghm_cands[hi]
            noobj_h = obj_h = 0.0
            if cands:
                gs = [abs(sc - t) for sc, t, _ in cands]
                counts = np.zeros(bins)
                for g in gs:
                    counts[min(int(g * bins), bins - 1)] += 1.0
                nonempty = max((counts > 0).sum(), 1.0)
                for (sc, t, pw), g in zip(cands, gs):
                    beta = 1.0 / (counts[min(int(g * bins), bins - 1)]
                                  * nonempty)
                    if t == 0.0:
                        noobj_h += -np.log(1 - sc) * beta
                    else:
                        obj_h += -np.log(sc) * beta * pw
            loss_mat[2, hi] = weights[hi, 2] * noobj_h
            loss_mat[3, hi] = weights[hi, 3] * obj_h
    active = float(image_count <= cfg.rectified_coord_num)
    rect = rect_img.mean(axis=0) * active
    total = loss_mat.sum() + rect.sum()
    breakdown = np.concatenate([rect[None, :], loss_mat], axis=0)
    new_count = image_count + n * int(active)
    return total, breakdown, new_count
