"""mAP evaluator golden cases (in-repo replacement for Cartucho/mAP,
run.py:78-79) — VOC single-threshold and COCO .50:.05:.95 styles."""
import numpy as np

from yolov3_tensorflow_tpu.infer.evaluator import (average_precision,
                                                   average_precision_101,
                                                   box_iou, evaluate_map,
                                                   evaluate_map_range)


def test_box_iou():
    a = np.asarray([[0, 0, 2, 2]])
    b = np.asarray([[1, 1, 3, 3], [0, 0, 2, 2], [5, 5, 6, 6]])
    iou = box_iou(a, b)[0]
    np.testing.assert_allclose(iou, [1 / 7, 1.0, 0.0], atol=1e-9)


def test_perfect_detections():
    gts = [np.asarray([[0, 0, 10, 10, 0], [20, 20, 30, 30, 1]])]
    dets = [np.asarray([[0, 0, 10, 10, 0.9, 0],
                        [20, 20, 30, 30, 0.8, 1]])]
    r = evaluate_map(dets, gts)
    assert r["mAP"] == 1.0


def test_false_positive_lowers_ap():
    gts = [np.asarray([[0, 0, 10, 10, 0]])]
    dets = [np.asarray([[50, 50, 60, 60, 0.95, 0],   # FP ranked first
                        [0, 0, 10, 10, 0.9, 0]])]
    r = evaluate_map(dets, gts)
    # all-point interpolation: precision at recall 1 is 1/2
    np.testing.assert_allclose(r["mAP"], 0.5)


def test_duplicate_detection_counts_fp():
    gts = [np.asarray([[0, 0, 10, 10, 0]])]
    dets = [np.asarray([[0, 0, 10, 10, 0.9, 0],
                        [0.5, 0.5, 10, 10, 0.8, 0]])]  # duplicate -> FP
    r = evaluate_map(dets, gts)
    assert r["mAP"] == 1.0  # AP unaffected: TP first, recall already 1


def test_missed_gt():
    gts = [np.asarray([[0, 0, 10, 10, 0], [20, 20, 30, 30, 0]])]
    dets = [np.asarray([[0, 0, 10, 10, 0.9, 0]])]
    r = evaluate_map(dets, gts)
    np.testing.assert_allclose(r["mAP"], 0.5)


def test_average_precision_all_point():
    # recall .5 with precision 1, then recall 1 with precision 2/3
    ap = average_precision(np.asarray([0.5, 0.5, 1.0]),
                           np.asarray([1.0, 0.5, 2 / 3]))
    np.testing.assert_allclose(ap, 0.5 * 1.0 + 0.5 * (2 / 3))


def test_ap101_vs_all_point():
    """101-point (COCO) vs all-point (VOC) interpolation on the same
    curve: recall [.5, 1] with precisions [1, 2/3].  All-point area =
    .5*1 + .5*(2/3); the 101-grid averages 51 points at precision 1
    (recall <= .5) and 50 at 2/3."""
    rec = np.asarray([0.5, 1.0])
    pre = np.asarray([1.0, 2 / 3])
    np.testing.assert_allclose(average_precision(rec, pre),
                               0.5 + 0.5 * (2 / 3))
    np.testing.assert_allclose(average_precision_101(rec, pre),
                               (51 * 1.0 + 50 * (2 / 3)) / 101)


def test_ap101_fp_first():
    # FP ranked first, then the TP: recall [0, 1], precision [0, .5];
    # monotone envelope lifts every grid point to .5
    np.testing.assert_allclose(
        average_precision_101(np.asarray([0.0, 1.0]),
                              np.asarray([0.0, 0.5])), 0.5)
    assert average_precision_101(np.asarray([]), np.asarray([])) == 0.0


def test_map_range_perfect():
    gts = [np.asarray([[0, 0, 10, 10, 0], [20, 20, 30, 30, 1]])]
    dets = [np.asarray([[0, 0, 10, 10, 0.9, 0],
                        [20, 20, 30, 30, 0.8, 1]])]
    r = evaluate_map_range(dets, gts)
    assert r["mAP"] == 1.0  # IOU 1.0 passes every threshold
    assert r["mAP@0.5"] == 1.0 and r["mAP@0.75"] == 1.0
    assert len(r["per_threshold"]) == 10
    assert r["per_class"] == {0: 1.0, 1: 1.0}


def test_map_range_threshold_cutoff():
    """A detection at IOU exactly 0.7 is a TP for thresholds .50-.70
    (5 of 10) and an FP above -> mAP@[.5:.95] = 0.5."""
    gts = [np.asarray([[0, 0, 10, 10, 0]])]
    dets = [np.asarray([[0, 0, 10, 7, 0.9, 0]])]  # inter 70 / union 100
    r = evaluate_map_range(dets, gts)
    np.testing.assert_allclose(r["mAP"], 0.5)
    assert r["mAP@0.5"] == 1.0
    assert r["mAP@0.75"] == 0.0
    np.testing.assert_allclose(r["per_threshold"][0.7], 1.0)
    np.testing.assert_allclose(r["per_threshold"][0.75], 0.0)


def test_coco_matching_claims_free_gt():
    """COCO matching: when a detection's best-IOU GT is already claimed,
    it may claim another unmatched GT above the threshold — VOC/Cartucho
    matching calls it a false positive (the two styles must differ on
    exactly this case)."""
    gts = [np.asarray([[0, 0, 10, 10, 0],      # A
                       [0, 0, 12, 12, 0]])]    # B
    dets = [np.asarray([[0, 0, 12, 12, 0.9, 0],    # exactly B
                        [0, 0, 11, 11, 0.8, 0]])]  # best-IOU = B (taken)
    voc = evaluate_map(dets, gts, iou_thresh=0.5)
    np.testing.assert_allclose(voc["mAP"], 0.5)  # second det -> FP
    coco = evaluate_map_range(dets, gts, iou_thresholds=[0.5])
    np.testing.assert_allclose(coco["mAP"], 1.0)  # claims free A


def test_map_range_zero_gt_class_excluded():
    gts = [np.asarray([[0, 0, 10, 10, 0]])]
    dets = [np.asarray([[0, 0, 10, 10, 0.9, 0],
                        [50, 50, 60, 60, 0.95, 7]])]
    r = evaluate_map_range(dets, gts)
    assert r["mAP"] == 1.0
    assert np.isnan(r["per_class"][7])
    assert r["false_positive_classes"] == {7: 1}


def test_zero_gt_class_excluded_from_map():
    """Cartucho convention: a class with detections but no ground truth is
    excluded from the mAP mean and reported as a false-positive class."""
    gts = [np.asarray([[0, 0, 10, 10, 0]])]
    dets = [np.asarray([[0, 0, 10, 10, 0.9, 0],      # perfect for class 0
                        [50, 50, 60, 60, 0.95, 7]])]  # spurious class 7
    r = evaluate_map(dets, gts)
    assert r["mAP"] == 1.0  # class 7 must not deflate the mean
    assert np.isnan(r["per_class"][7])
    assert r["false_positive_classes"] == {7: 1}


def _oracle_coco_map(dets_per_img, gts_per_img, thresholds):
    """Independent brute-force COCO mAP: per (threshold, class),
    re-match from scratch and integrate precision over the explicit
    101-point recall grid (max precision at recall >= r). Written
    deliberately differently from the production code."""
    classes = sorted({int(r[4]) for g in gts_per_img
                      for r in np.asarray(g).reshape(-1, 5)})
    t_means = []
    for t in thresholds:
        aps = []
        for cls in classes:
            n_gt = sum(int((np.asarray(g).reshape(-1, 5)[:, 4] == cls).sum())
                       for g in gts_per_img)
            # flat score-ordered detection list for this class
            rows = []
            for i, d in enumerate(dets_per_img):
                for r in np.asarray(d).reshape(-1, 6):
                    if int(r[5]) == cls:
                        rows.append((float(r[4]), i, r[:4]))
            rows.sort(key=lambda x: -x[0])
            used = [set() for _ in gts_per_img]
            flags = []
            for score, i, box in rows:
                g = np.asarray(gts_per_img[i]).reshape(-1, 5)
                cand = [(box_iou(box[None], g[j:j + 1, :4])[0, 0], j)
                        for j in range(len(g))
                        if int(g[j, 4]) == cls and j not in used[i]]
                cand = [(v, j) for v, j in cand if v >= t]
                if cand:
                    used[i].add(max(cand)[1])
                    flags.append(1)
                else:
                    flags.append(0)
            tp = np.cumsum(flags) if flags else np.zeros(0)
            n_det = np.arange(1, len(flags) + 1)
            rec = tp / n_gt
            pre = tp / n_det
            ap = np.mean([max([p for r_, p in zip(rec, pre) if r_ >= r0],
                              default=0.0)
                          for r0 in np.linspace(0, 1, 101)])
            aps.append(ap)
        t_means.append(np.mean(aps))
    return float(np.mean(t_means))


def test_map_range_fuzz_vs_oracle():
    """evaluate_map_range vs the brute-force oracle on random scenes."""
    rng = np.random.RandomState(7)
    for trial in range(5):
        n_img = rng.randint(1, 4)
        gts, dets = [], []
        for _ in range(n_img):
            m = rng.randint(1, 5)
            xy = rng.uniform(0, 50, (m, 2))
            wh = rng.uniform(5, 30, (m, 2))
            cls = rng.randint(0, 3, (m, 1))
            gts.append(np.concatenate([xy, xy + wh, cls], 1))
            k = rng.randint(0, 6)
            if k and m:
                # detections = jittered copies of random GTs
                src = gts[-1][rng.randint(0, m, k)]
                jit = rng.uniform(-4, 4, (k, 4))
                d = np.concatenate(
                    [src[:, :4] + jit, rng.uniform(0.1, 1, (k, 1)),
                     rng.randint(0, 3, (k, 1))], 1)
                d[:, 2:4] = np.maximum(d[:, 2:4], d[:, 0:2] + 1)
                dets.append(d)
            else:
                dets.append(np.zeros((0, 6)))
        thresholds = [0.5, 0.75, 0.95]
        got = evaluate_map_range(dets, gts, iou_thresholds=thresholds)
        want = _oracle_coco_map(dets, gts, thresholds)
        np.testing.assert_allclose(got["mAP"], want, atol=1e-9,
                                   err_msg=f"trial {trial}")
