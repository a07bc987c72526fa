"""Cartucho-style mAP report artifacts (infer/map_report.py).

The reference delegates mAP + its per-class PR plots to the external
Cartucho/mAP tool (run.py:78-79, README.md:137); these tests pin the
in-repo equivalent: PR-curve emission from the evaluator and the
results.txt / PNG artifact writer."""
import math
import os

import numpy as np
import pytest

from yolov3_tensorflow_tpu.infer.evaluator import (evaluate_map,
                                                   evaluate_map_range)
from yolov3_tensorflow_tpu.infer.map_report import (class_label,
                                                    format_results_txt,
                                                    load_class_names,
                                                    write_map_report)

CAT, DOG = 0, 1


def _fixture():
    """2 images, hand-computed TP/FP pattern.

    cat: score-sorted dets TP/FP/TP over 2 GT -> recall [.5,.5,1],
    precision [1,.5,2/3], all-point AP = .5*1 + .5*(2/3) = 5/6.
    dog: single exact TP over 1 GT -> AP 1.  class 5: FP-only."""
    dets = [
        np.array([[0, 0, 10, 10, 0.9, CAT],
                  [50, 50, 60, 60, 0.8, CAT],
                  [20, 20, 30, 30, 0.7, DOG]]),
        np.array([[0, 0, 10, 10, 0.6, CAT],
                  [40, 40, 45, 45, 0.5, 5]]),
    ]
    gts = [
        np.array([[0, 0, 10, 10, CAT], [20, 20, 30, 30, DOG]]),
        np.array([[0, 0, 10, 10, CAT]]),
    ]
    return dets, gts


def test_evaluate_map_with_curves_hand_case():
    dets, gts = _fixture()
    report = evaluate_map(dets, gts, with_curves=True)
    assert report["mAP"] == pytest.approx((5 / 6 + 1.0) / 2)
    assert report["per_class"][CAT] == pytest.approx(5 / 6)
    curves = report["pr_curves"]
    np.testing.assert_allclose(curves[CAT]["recall"], [0.5, 0.5, 1.0])
    np.testing.assert_allclose(curves[CAT]["precision"],
                               [1.0, 0.5, 2 / 3])
    np.testing.assert_allclose(curves[CAT]["scores"], [0.9, 0.8, 0.6])
    np.testing.assert_allclose(curves[DOG]["recall"], [1.0])
    assert report["pr_curves_iou"] == 0.5
    # FP-only class: reported, but no curve (no ground truth to recall)
    assert 5 in report["false_positive_classes"]
    assert 5 not in curves


def test_evaluate_map_without_curves_unchanged():
    dets, gts = _fixture()
    report = evaluate_map(dets, gts)
    assert "pr_curves" not in report


def test_evaluate_map_range_with_curves():
    dets, gts = _fixture()
    report = evaluate_map_range(dets, gts, with_curves=True)
    assert report["pr_curves_iou"] == 0.5
    # COCO matching at the 0.5 base threshold agrees with VOC here
    # (one GT per class per image; no claimed-GT collisions)
    np.testing.assert_allclose(report["pr_curves"][CAT]["recall"],
                               [0.5, 0.5, 1.0])


def test_load_class_names(tmp_path):
    p = tmp_path / "class.txt"
    p.write_text("cat\ndog\n\n")
    assert load_class_names(str(p)) == ["cat", "dog"]


def test_class_label_fallback():
    assert class_label(0, ["cat"]) == "cat"
    assert class_label(3, ["cat"]) == "class_3"
    assert class_label(7, None) == "class_7"


def test_format_results_txt():
    dets, gts = _fixture()
    report = evaluate_map(dets, gts)
    txt = format_results_txt(report, ["cat", "dog"])
    assert " 83.33% = cat AP" in txt
    assert "100.00% = dog AP" in txt
    assert "mAP = 91.67%" in txt
    assert "cat: 2" in txt  # GT counts
    assert "class_5: 1 detections" in txt  # FP-only section
    assert "n/a  = class_5 AP" in txt  # NaN AP line


def test_write_map_report_artifacts(tmp_path):
    dets, gts = _fixture()
    report = evaluate_map(dets, gts, with_curves=True)
    out = str(tmp_path / "report")
    written = write_map_report(report, out, ["cat", "dog"])
    expected = [os.path.join(out, "results.txt"),
                os.path.join(out, "classes", "cat.png"),
                os.path.join(out, "classes", "dog.png"),
                os.path.join(out, "mAP.png"),
                os.path.join(out, "ground-truth-info.png")]
    for path in expected:
        assert path in written
        assert os.path.getsize(path) > 0
    # FP-only class 5 must not produce a curve panel
    assert not os.path.exists(
        os.path.join(out, "classes", "class_5.png"))


def test_write_map_report_no_curves(tmp_path):
    """A report scored without with_curves still writes text + bars."""
    dets, gts = _fixture()
    report = evaluate_map(dets, gts)
    out = str(tmp_path / "r2")
    written = write_map_report(report, out)
    assert os.path.join(out, "results.txt") in written
    assert os.path.join(out, "mAP.png") in written
    assert not os.path.isdir(os.path.join(out, "classes"))


def test_cli_carries_report_flags():
    import argparse

    from yolov3_tensorflow_tpu.cli import build_config
    ns = argparse.Namespace(map_report_dir="/tmp/rep",
                            class_name_path="cls.txt")
    cfg = build_config(ns)
    assert cfg.map_report_dir == "/tmp/rep"
    assert cfg.class_name_path == "cls.txt"


def test_nan_ap_class_skipped_in_charts(tmp_path):
    """per_class NaN (zero-GT class) must not reach the bar chart."""
    report = {"mAP": 0.5, "per_class": {0: 0.5, 5: float("nan")},
              "num_gt": {0: 3}, "false_positive_classes": {5: 2}}
    out = str(tmp_path / "r3")
    write_map_report(report, out)
    assert os.path.getsize(os.path.join(out, "mAP.png")) > 0
    txt = (tmp_path / "r3" / "results.txt").read_text()
    assert math.isnan(float("nan"))  # doc: NaN is the zero-GT marker
    assert "n/a  = class_5 AP" in txt
