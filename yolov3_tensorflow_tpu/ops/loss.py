"""YOLOv3 composite loss — fully vectorized, static-shape, jit-friendly.

Reference: yolov3/yolov3_loss.py:13-369.  Semantics preserved exactly; the
implementation is redesigned for TPU/XLA:

  * The reference loops over the batch with ``tf.map_fn(...,
    parallel_iterations=1)`` (yolov3_loss.py:111), serializing the loss.
    Here every step is batched and laid out for the VPU/MXU:
    - all per-candidate math runs on FLAT (N, H*W*B) arrays so the minor
      (128-lane) axis is always large — the naive (N,H,W,B,M) layout puts
      M=32 on the lanes and wastes 3/4 of the vector unit;
    - responsible-cell lookups (tf.gather_nd, yolov3_loss.py:271,281) are
      one-hot matmuls on the MXU instead of gathers;
    - the object mask (tf.sparse_to_dense, yolov3_loss.py:328-329) is a
      one-hot einsum instead of a scatter.
  * Dynamic ``valid_num`` shapes (yolov3_loss.py:240-247) become a static
    ``max_boxes`` dimension with multiplicative masks; masked entries are
    sanitized BEFORE any log/div so no NaN can leak through ``where``
    gradients.
  * The mutable ``loss_detail`` variables and ``current_image_num`` counter
    (yolov3_loss.py:69-79) become functional outputs: the loss returns
    ``(total, breakdown_dict, new_image_count)``.

Loss terms per head (yolov3_loss.py:305-369), weights [coord_xy, coord_wh,
noobj, obj, cls] per head:
  * noobj: -log(1-score) over background = (max_iou < iou_thresh) and not
    object; optional focal factor score^gamma          (:335-338)
  * obj:   -log(score) at responsible anchors; optional focal
    alpha*(1-score)^gamma                              (:344-347)
  * xy:    BCE on the cell-relative offset, x scale    (:352-356)
  * wh:    MSE in log space, x scale                   (:358-359)
    where scale = 2 - w*h/(H*W)                        (:350)
  * class: CE, only when class_num >= 1                (:361-366)

Cross-head arbitration (yolov3_loss.py:202-208): an object is assigned to
every head whose responsible-anchor IOU ties the max across /8, /16, /32
(>= comparisons, so exact ties go to multiple heads).

Early-training rectified coord loss (yolov3_loss.py:140-164): sum of squared
raw t-values per head while image_count <= rectified_coord_num; the counter
advances by the batch size only while active (yolov3_loss.py:151-152).

Reference-roadmap extensions (unchecked TODOs in the reference README,
README.md:127-137 — opt-in, default semantics untouched):
  * ``cfg.is_giou_loss``: the xy-BCE + wh-MSE pair is replaced by
    ``scale * (1 - GIOU)`` at the responsible anchors (Rezatofighi et al.,
    CVPR 2019); reported in the xy breakdown slot, wh slot is 0.
  * ``box_weights`` (optional (N, M) argument): per-box loss weight
    multiplied into the assignment mask — the hook mixup uses to weight
    each box by its source image's blend factor (data/augment.py mixup).
  * ``cfg.is_gaussian_yolo``: Gaussian YOLO (Choi et al., ICCV 2019) —
    4 extra sigma channels per anchor; the xy/wh pair becomes
    per-coordinate Gaussian NLL (see the branch in ``__call__``).
  * ``cfg.is_gradient_harmonized``: GHM-C on the confidence terms
    (Li et al., AAAI 2019) — the reference declares this flag but never
    wires it (configs.py:71); here it is implemented (see the branch in
    ``__call__`` and the config comment for the exact normalization).
"""
from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Config
from .decoder import anchors_in_grid_units
from .labels import decode_labels_single_head, valid_mask

_EPS_DIV = 1e-12
# Top clip bound for probabilities.  The reference clips at 1 - 1e-8
# (keras epsilon, run.py:26) which in float32 rounds to exactly 1.0 — a
# no-op — so its -log(1-score) can still hit -inf on saturated logits and
# NaN the loss through the 0-background mask.  1 - 1e-7 IS representable
# below 1.0f (one ulp), making every log finite.  Intentional hardening
# divergence from the reference.
_SAFE_HI = float(np.float32(1.0) - np.float32(1e-7))


def _flat_decode(raw, grid_hw, anchors, class_num, eps, gaussian=False):
    """Decode one head into flat component arrays.

    raw: (N, H, W, B*L).  Returns dict of (N, HWB) arrays plus optional
    class probs (N, HWB, C), matching yolov3_decoder.py:142-192 math.
    With ``gaussian`` the layout is [t_xywh, sigma_xywh, obj, classes]
    (config.is_gaussian_yolo); the loss's objectness stays the PLAIN
    sigmoid — the certainty product is an inference-criterion only.
    """
    h, w = grid_hw
    b = anchors.shape[0]
    n = raw.shape[0]
    si = 8 if gaussian else 4  # objectness channel index
    box_len = si + 1 + class_num
    raw = raw.astype(jnp.float32).reshape(n, h * w * b, box_len)
    hwb = h * w * b

    # per-position grid left-top and anchor size, flat (HWB,)
    xs, ys = np.meshgrid(np.arange(w), np.arange(h))
    ltx = jnp.asarray(np.repeat(xs.reshape(-1), b).astype(np.float32))
    lty = jnp.asarray(np.repeat(ys.reshape(-1), b).astype(np.float32))
    aw = jnp.asarray(np.tile(np.asarray(anchors)[:, 0], h * w))
    ah = jnp.asarray(np.tile(np.asarray(anchors)[:, 1], h * w))

    # jax.nn.sigmoid, NOT 1/(1+exp(-v)): the naive expression's autodiff is
    # exp(-v)/(1+exp(-v))^2 = inf/inf = NaN once a logit goes below ~-88
    # (f32 exp overflow) — the noobj term drives score logits that far after
    # enough epochs and one poisoned gradient NaNs the weights permanently.
    sig = lambda v: jnp.clip(jax.nn.sigmoid(v), eps, _SAFE_HI)
    px = sig(raw[..., 0]) + ltx
    py = sig(raw[..., 1]) + lty
    # exp clamp: |t_wh| <= 15 never binds in the normal regime (|t| < 3)
    # but keeps areas finite when training spikes (the reference schedule
    # jumps the LR back up at epoch 81, configs.py:17 — an unguarded exp
    # overflows f32 there and NaN-poisons the weights permanently)
    pw = jnp.exp(jnp.clip(raw[..., 2], -15.0, 15.0)) * aw
    ph = jnp.exp(jnp.clip(raw[..., 3], -15.0, 15.0)) * ah
    score = sig(raw[..., si])
    out = dict(px=px, py=py, pw=pw, ph=ph, score=score, raw=raw,
               x0=px - pw / 2, y0=py - ph / 2,
               x1=px + pw / 2, y1=py + ph / 2)
    if gaussian:
        out["sigma"] = sig(raw[..., 4:8])  # (N,HWB,4) in [eps, 1)
    if class_num >= 1:
        out["probs"] = jnp.clip(jax.nn.softmax(raw[..., si + 1:], axis=-1),
                                eps, _SAFE_HI)
    return out


class YOLOv3Loss:
    """Functional loss.  ``__call__(raw_heads, targets, image_count)``
    -> (total, breakdown, new_image_count)."""

    def __init__(self, cfg: Config):
        if cfg.is_gaussian_yolo and cfg.is_giou_loss:
            raise ValueError(
                "is_gaussian_yolo and is_giou_loss both replace the "
                "coordinate loss pair — enable at most one")
        if cfg.is_focal_loss and cfg.is_gradient_harmonized:
            raise ValueError(
                "is_focal_loss and is_gradient_harmonized are alternative "
                "re-weightings of the same confidence CE — enable at most "
                "one (the GHM branch would silently ignore focal_gamma/"
                "focal_alpha)")
        self.cfg = cfg
        # index of the objectness channel in the resp gather / raw layout
        # (after the 4 sigma channels when Gaussian YOLO is on)
        self.si = 8 if cfg.is_gaussian_yolo else 4
        # loss_weights rows are per-head [xy, wh, noobj, obj, cls]
        # (configs.py:52, yolov3_loss.py:46-47)
        self.weights = jnp.asarray(cfg.loss_weights, jnp.float32)  # (3,5)
        self.rect_weights = jnp.asarray(cfg.rectified_loss_weight,
                                        jnp.float32)
        self.anchors = [anchors_in_grid_units(a, g)
                        for a, g in zip(cfg.anchor_boxes,
                                        cfg.head_grid_sizes)]

    # ------------------------------------------------------------------ #
    def _head_stats(self, raw, t_grid, t_boxes, valid, head_idx):
        """Per-head statistics, flat layout.

        Returns dict with max_iou (N,HWB), resp_iou (N,M), best_b (N,M),
        cell one-hot (N,M,HW), resp (N,M,L) decoded prediction at the best
        anchor, dec (flat decode dict).
        """
        cfg = self.cfg
        h, w = cfg.head_grid_sizes[head_idx]
        b = len(cfg.anchor_boxes[head_idx])
        n, m = valid.shape
        dec = _flat_decode(raw, (h, w), self.anchors[head_idx],
                           cfg.class_num, cfg.epsilon,
                           gaussian=cfg.is_gaussian_yolo)
        hwb = h * w * b

        # --- every-candidate IOU vs every GT (background statistic) ---
        pred_area = dec["pw"] * dec["ph"]  # (N,HWB)
        t_area = t_grid[..., 2] * t_grid[..., 3]  # (N,M)
        ix = jnp.minimum(dec["x1"][:, None, :], t_boxes[..., 2][..., None]) \
            - jnp.maximum(dec["x0"][:, None, :], t_boxes[..., 0][..., None])
        iy = jnp.minimum(dec["y1"][:, None, :], t_boxes[..., 3][..., None]) \
            - jnp.maximum(dec["y0"][:, None, :], t_boxes[..., 1][..., None])
        inter = jnp.maximum(ix, 0.0) * jnp.maximum(iy, 0.0)  # (N,M,HWB)
        denom = jnp.maximum(
            pred_area[:, None, :] + t_area[..., None] - inter, _EPS_DIV)
        iou = inter / denom
        if cfg.is_tiou_recall:
            iou = iou * inter / jnp.maximum(t_area[..., None], _EPS_DIV)
        iou = iou * valid[..., None]
        max_iou = jnp.max(iou, axis=1)  # (N,HWB)

        # --- responsible cell (yolov3_loss.py:269-271) ---
        col = jnp.clip(jnp.floor(t_grid[..., 0]).astype(jnp.int32), 0, w - 1)
        row = jnp.clip(jnp.floor(t_grid[..., 1]).astype(jnp.int32), 0, h - 1)
        cell = row * w + col  # (N,M)
        onehot = jax.nn.one_hot(cell, h * w, dtype=jnp.float32)  # (N,M,HW)

        # gather decoded at responsible cells via one matmul: components
        # packed (N, HW, B*K)
        comps = [dec["px"], dec["py"], dec["pw"], dec["ph"]]
        if cfg.is_gaussian_yolo:
            # the 4 sigma channels ride the same one-hot gather so the
            # NLL branch reads them at resp[..., 4:8]
            comps += [dec["sigma"][..., j] for j in range(4)]
        comps.append(dec["score"])
        if cfg.class_num >= 1:
            probs = dec["probs"]  # (N,HWB,C)
            comp_mat = jnp.concatenate(
                [jnp.stack(comps, axis=-1), probs], axis=-1)
        else:
            comp_mat = jnp.stack(comps, axis=-1)  # (N,HWB,K)
        k = comp_mat.shape[-1]
        comp_mat = comp_mat.reshape(n, h * w, b * k)
        resp_all = jax.lax.dot_general(
            onehot, comp_mat, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32).reshape(n, m, b, k)

        # best anchor by IOU of the responsible cell's predicted boxes
        # (yolov3_loss.py:281-303)
        rx, ry, rw, rh = (resp_all[..., 0], resp_all[..., 1],
                          resp_all[..., 2], resp_all[..., 3])
        rx0, ry0 = rx - rw / 2, ry - rh / 2
        rx1, ry1 = rx + rw / 2, ry + rh / 2
        rix = jnp.minimum(rx1, t_boxes[..., 2][..., None]) \
            - jnp.maximum(rx0, t_boxes[..., 0][..., None])
        riy = jnp.minimum(ry1, t_boxes[..., 3][..., None]) \
            - jnp.maximum(ry0, t_boxes[..., 1][..., None])
        rinter = jnp.maximum(rix, 0.0) * jnp.maximum(riy, 0.0)  # (N,M,B)
        rdenom = jnp.maximum(rw * rh + t_area[..., None] - rinter, _EPS_DIV)
        riou = rinter / rdenom
        if cfg.is_tiou_recall:
            riou = riou * rinter / jnp.maximum(t_area[..., None], _EPS_DIV)
        resp_iou = jnp.max(riou, axis=-1)  # (N,M)
        best_b = jnp.argmax(riou, axis=-1).astype(jnp.int32)  # (N,M)
        resp = jnp.take_along_axis(
            resp_all, best_b[..., None, None], axis=2)[:, :, 0, :]  # (N,M,K)
        return dict(max_iou=max_iou, resp_iou=resp_iou, best_b=best_b,
                    onehot=onehot, resp=resp, dec=dec, hw=(h, w), b=b)

    # ------------------------------------------------------------------ #
    @staticmethod
    def _giou_term(resp, t_grid, scale, wgt):
        """GIOU coordinate loss (cfg.is_giou_loss — the reference's
        unchecked roadmap item, README.md:134).

        GIOU = IOU - (enclose - union)/enclose (Rezatofighi et al. 2019);
        the term is scale * (1 - GIOU) at the responsible anchor, in grid
        units like the BCE/MSE pair it replaces.  Masked (wgt=0) rows are
        safe: both areas are >= 0 and the divisions are floor-guarded, so
        no NaN can leak through the mask's zero gradient.
        """
        rw, rh = resp[..., 2], resp[..., 3]
        rx0, rx1 = resp[..., 0] - rw / 2, resp[..., 0] + rw / 2
        ry0, ry1 = resp[..., 1] - rh / 2, resp[..., 1] + rh / 2
        tw, th = t_grid[..., 2], t_grid[..., 3]
        tx0, tx1 = t_grid[..., 0] - tw / 2, t_grid[..., 0] + tw / 2
        ty0, ty1 = t_grid[..., 1] - th / 2, t_grid[..., 1] + th / 2
        ix = jnp.minimum(rx1, tx1) - jnp.maximum(rx0, tx0)
        iy = jnp.minimum(ry1, ty1) - jnp.maximum(ry0, ty0)
        inter = jnp.maximum(ix, 0.0) * jnp.maximum(iy, 0.0)
        union = jnp.maximum(rw * rh + tw * th - inter, _EPS_DIV)
        ex = jnp.maximum(rx1, tx1) - jnp.minimum(rx0, tx0)
        ey = jnp.maximum(ry1, ty1) - jnp.minimum(ry0, ty0)
        enclose = jnp.maximum(ex * ey, _EPS_DIV)
        giou = inter / union - (enclose - union) / enclose
        return jnp.mean(jnp.sum(scale * (1.0 - giou) * wgt, axis=1))

    # ------------------------------------------------------------------ #
    def __call__(self, raw_heads: Sequence, targets, image_count,
                 box_weights=None):
        cfg = self.cfg
        eps = cfg.epsilon
        if targets.ndim == 2:
            targets = targets.reshape(targets.shape[0], -1, 5)
        targets = targets.astype(jnp.float32)
        valid = valid_mask(targets)  # (N,M)
        # box_weights scales each box's LOSS contribution only; ``valid``
        # stays binary so geometry (background suppression via max_iou,
        # target sanitization) treats a low-weight mixup box as a full
        # object — a lam=0.1 box must still veto the noobj term around it.
        bw = (valid if box_weights is None
              else box_weights.astype(jnp.float32) * valid)
        n = targets.shape[0]

        stats = []
        t_grids = []
        for i in range(3):
            # canonical grid-unit scaling (label_decoder.py parity);
            # padding rows are then zeroed so -1 sentinels cannot leak
            # into IOU geometry, and corner boxes rebuilt from the
            # sanitized grid targets
            scaled, _ = decode_labels_single_head(targets,
                                                  cfg.head_grid_sizes[i])
            t_grid = jnp.where(valid[..., None] > 0, scaled, 0.0)
            half = t_grid[..., 2:4] / 2.0
            t_boxes = jnp.concatenate(
                [t_grid[..., 0:2] - half, t_grid[..., 0:2] + half], axis=-1)
            t_grids.append(t_grid)
            raw = raw_heads[i]
            if raw.ndim == 5:
                raw = raw.reshape(raw.shape[0], raw.shape[1], raw.shape[2],
                                  -1)
            stats.append(self._head_stats(raw, t_grid, t_boxes, valid, i))

        # cross-head arbitration (yolov3_loss.py:202-208)
        r = [s["resp_iou"] for s in stats]
        assign = [
            (r[0] >= r[1]) & (r[0] >= r[2]),
            (r[1] >= r[0]) & (r[1] >= r[2]),
            (r[2] >= r[0]) & (r[2] >= r[1]),
        ]

        per_head = []
        for i in range(3):
            s = stats[i]
            t_grid = t_grids[i]
            h, w = s["hw"]
            b = s["b"]
            wgt = assign[i].astype(jnp.float32) * bw  # (N,M) loss weights
            # binary assignment mask — the OBJECT-vs-background decision
            # ignores box_weights (a low-weight mixup box's responsible
            # anchor is fully an object, never partially background)
            wgt_bin = assign[i].astype(jnp.float32) * valid  # (N,M)

            # object mask via one-hot einsum (replaces sparse_to_dense)
            bhot = jax.nn.one_hot(s["best_b"], b, dtype=jnp.float32)
            contrib = jax.lax.dot_general(
                s["onehot"] * wgt_bin[..., None], bhot,
                (((1,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)  # (N,HW,B)
            obj_mask = jnp.minimum(contrib, 1.0).reshape(n, h * w * b)
            background = (s["max_iou"] < cfg.iou_thresh).astype(
                jnp.float32) * (1.0 - obj_mask)

            score = s["dec"]["score"]  # (N,HWB)
            resp = s["resp"]  # (N,M,K)
            if cfg.is_gradient_harmonized:
                # GHM-C (Li et al., AAAI 2019) — the reference's
                # declared-but-dead flag (configs.py:71) / roadmap item
                # (README.md:133), wired per the official implementation:
                # participating anchors = background + object (binary,
                # disjoint); g = |score - target|; density = batch-global
                # per-head histogram; each candidate's CE is weighted
                # 1/(bin_count * nonempty_bins) with the density detached.
                # The weights sum to exactly 1 over participants, so the
                # terms are batch-global sums (no extra mean-over-batch).
                # Positive anchors carry the accumulated per-box mixup
                # weight (clipped at 1) so box_weights compose.
                posw = jax.lax.dot_general(
                    s["onehot"] * wgt[..., None], bhot,
                    (((1,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32)
                posw = jnp.minimum(posw, 1.0).reshape(n, h * w * b)
                part = background + obj_mask  # binary, disjoint
                g = jnp.abs(score - obj_mask)
                bins = cfg.ghm_bins
                idx = jnp.clip((g * bins).astype(jnp.int32), 0, bins - 1)
                counts = jnp.zeros((bins,), jnp.float32).at[
                    idx.reshape(-1)].add(part.reshape(-1))
                nonempty = jnp.maximum(
                    jnp.sum((counts > 0.0).astype(jnp.float32)), 1.0)
                beta = 1.0 / (jnp.maximum(counts, 1.0) * nonempty)
                w_cand = jax.lax.stop_gradient(beta[idx])  # (N,HWB)
                noobj_loss = jnp.sum(
                    -jnp.log(1.0 - score) * w_cand * background)
                obj_loss = jnp.sum(-jnp.log(score) * w_cand * posw)
            else:
                noobj = -jnp.log(1.0 - score)
                if cfg.is_focal_loss:
                    noobj = noobj * jnp.power(score, cfg.focal_gamma)
                noobj_loss = jnp.mean(jnp.sum(noobj * background, axis=1))

                resp_score = resp[..., self.si]
                obj = -jnp.log(resp_score)
                if cfg.is_focal_loss:
                    obj = obj * (jnp.power(1.0 - resp_score,
                                           cfg.focal_gamma)
                                 * cfg.focal_alpha)
                obj_loss = jnp.mean(jnp.sum(obj * wgt, axis=1))

            # coordinate losses (yolov3_loss.py:348-359)
            scale1 = (2.0 - t_grid[..., 2] * t_grid[..., 3] / float(h * w))
            scale = scale1[..., None]
            if cfg.is_giou_loss:
                # roadmap item README.md:134 — GIOU replaces the BCE/MSE
                # coordinate pair; the xy weight applies, wh slot is 0
                xy_loss = self._giou_term(resp, t_grid, scale1, wgt)
                wh_loss = jnp.zeros((), jnp.float32)
            elif cfg.is_gaussian_yolo:
                # roadmap item README.md:135 — per-coordinate Gaussian
                # NLL (Choi et al. 2019): delta in the SAME residual
                # space as the BCE/MSE pair (cell-relative frac for xy,
                # log-ratio for wh), sigma = sigmoid in [eps, 1) from
                # the resp gather; masked rows sanitized like the
                # default branch so no NaN leaks through the mask.
                # Floor sigma at cfg.gaussian_sigma_min: the NLL is
                # unbounded below in sigma and its 1/s..delta^2/s^3
                # gradients otherwise starve the objectness head of
                # trunk capacity (real-sample overfit gate: eps-floor
                # mAP 0.0000, 0.1 -> 0.5861, 0.3 -> 0.9911 — see
                # Config.gaussian_sigma_min for the full series).
                sig_r = jnp.maximum(resp[..., 4:8],
                                    cfg.gaussian_sigma_min)  # (N,M,4)
                coord_int = jnp.floor(t_grid[..., 0:2])
                t_frac = t_grid[..., 0:2] - coord_int
                p_frac = jnp.clip(resp[..., 0:2] - coord_int,
                                  eps, _SAFE_HI)
                t_wh = jnp.where(valid[..., None] > 0,
                                 t_grid[..., 2:4], 1.0)
                d_wh = jnp.log(t_wh) - jnp.log(
                    jnp.maximum(resp[..., 2:4], _EPS_DIV))
                delta = jnp.concatenate([t_frac - p_frac, d_wh], axis=-1)
                nll = (0.5 * jnp.log(2.0 * jnp.pi * jnp.square(sig_r))
                       + jnp.square(delta) / (2.0 * jnp.square(sig_r)))
                xy_loss = jnp.mean(jnp.sum(
                    scale * nll[..., 0:2] * wgt[..., None], axis=(1, 2)))
                wh_loss = jnp.mean(jnp.sum(
                    scale * nll[..., 2:4] * wgt[..., None], axis=(1, 2)))
            else:
                coord_int = jnp.floor(t_grid[..., 0:2])
                t_frac = t_grid[..., 0:2] - coord_int
                p_frac = jnp.clip(resp[..., 0:2] - coord_int, eps, _SAFE_HI)
                bce = -(t_frac * jnp.log(p_frac)
                        + (1.0 - t_frac) * jnp.log(1.0 - p_frac))
                xy_loss = jnp.mean(
                    jnp.sum(scale * bce * wgt[..., None], axis=(1, 2)))

                t_wh = jnp.where(valid[..., None] > 0, t_grid[..., 2:4], 1.0)
                wh_sq = jnp.square(jnp.log(t_wh) - jnp.log(
                    jnp.maximum(resp[..., 2:4], _EPS_DIV)))
                wh_loss = jnp.mean(
                    jnp.sum(scale * wh_sq * wgt[..., None], axis=(1, 2)))

            if cfg.class_num >= 1:
                onehot_c = jax.nn.one_hot(t_grid[..., 4].astype(jnp.int32),
                                          cfg.class_num)
                if cfg.is_label_smoothing:
                    # wired here though dead in the reference (configs.py:67)
                    e = cfg.label_smoothing_eps
                    onehot_c = onehot_c * (1.0 - e) + e / cfg.class_num
                ce = -onehot_c * jnp.log(
                    jnp.clip(resp[..., self.si + 1:], eps, 1.0))
                cls_loss = jnp.mean(
                    jnp.sum(ce * wgt[..., None], axis=(1, 2)))
            else:
                cls_loss = jnp.zeros((), jnp.float32)

            wxy, wwh, wnoobj, wobj, wcls = [self.weights[i, j]
                                            for j in range(5)]
            per_head.append(jnp.stack([
                wxy * xy_loss, wwh * wh_loss, wnoobj * noobj_loss,
                wobj * obj_loss, wcls * cls_loss]))

        # (5,3): rows [xy, wh, noobj, obj, cls], cols [/8, /16, /32]
        loss_mat = jnp.stack(per_head, axis=-1)

        # rectified coord loss (yolov3_loss.py:140-164)
        rect = jnp.stack([
            self.rect_weights[i] * jnp.mean(jnp.sum(
                jnp.square(stats[i]["dec"]["raw"][..., 0:4]), axis=(1, 2)))
            for i in range(3)])  # (3,)
        active = (image_count <= cfg.rectified_coord_num).astype(jnp.float32)
        rect = rect * active
        new_count = image_count + jnp.asarray(n, image_count.dtype) * (
            image_count <= cfg.rectified_coord_num).astype(image_count.dtype)

        total = jnp.sum(loss_mat) + jnp.sum(rect)
        breakdown = {
            "rectified_coord_loss": rect,
            "coord_loss_xy": loss_mat[0],
            "coord_loss_wh": loss_mat[1],
            "noobj_iou_loss": loss_mat[2],
            "obj_iou_loss": loss_mat[3],
            "class_loss": loss_mat[4],
        }
        return total, breakdown, new_count
