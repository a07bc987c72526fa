"""mAP evaluator golden cases (in-repo replacement for Cartucho/mAP,
run.py:78-79)."""
import numpy as np

from yolov3_tensorflow_tpu.infer.evaluator import (average_precision,
                                                   box_iou, evaluate_map)


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
