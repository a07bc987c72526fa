"""Host-side post-process conversion (infer/postprocess.py) vs the
reference's apply_nms output structure (yolov3_post_process.py:94-105):
per-head split by provenance column, keep-flag filtering, and the
normalized -> target-size rescale (:161-172)."""
import numpy as np

import pytest

from yolov3_tensorflow_tpu.infer.postprocess import (resize_boxes,
                                                     split_detections)

# oracle-gate subset: `python -m pytest tests/ -m quick -q`
# (post-process conversion parity)
pytestmark = pytest.mark.quick


def _row(x0, y0, x1, y1, conf, clsp, cls, score, head, keep):
    return [x0, y0, x1, y1, conf, clsp, cls, score, head, keep]


def test_split_detections_by_head_and_keep():
    det = np.array([[
        _row(0.1, 0.1, 0.3, 0.3, 0.9, 0.8, 2, 0.72, 0, 1),
        _row(0.2, 0.2, 0.4, 0.4, 0.8, 0.9, 1, 0.72, 2, 1),
        _row(0.5, 0.5, 0.6, 0.6, 0.7, 0.7, 0, 0.49, 1, 0),  # suppressed
        _row(0.0, 0.0, 0.2, 0.9, 0.6, 0.6, 2, 0.36, 0, 1),
    ]], np.float32)
    per_image = split_detections(det)
    assert len(per_image) == 1
    h8, h16, h32 = per_image[0]
    assert h8.shape == (2, 8)       # two kept head-0 rows
    assert h16.shape == (0, 8)      # its only row was suppressed
    assert h32.shape == (1, 8)
    # row content survives minus the head/keep columns
    np.testing.assert_allclose(h32[0],
                               [0.2, 0.2, 0.4, 0.4, 0.8, 0.9, 1, 0.72],
                               atol=1e-6)


def test_resize_boxes_scales_only_coords():
    rows = [np.array([[0.25, 0.5, 0.75, 1.0, 0.9, 0.8, 2.0, 0.72]]),
            np.zeros((0, 8))]
    out = resize_boxes(rows, [200, 100, 200, 100])  # [W, H, W, H]
    np.testing.assert_allclose(out[0][0, 0:4], [50, 50, 150, 100])
    np.testing.assert_allclose(out[0][0, 4:], rows[0][0, 4:])
    assert out[1].shape == (0, 8)
