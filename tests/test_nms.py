"""Device NMS vs an independent Python greedy oracle (the reference's
algorithm, yolov3_post_process.py:107-129: score-descending greedy, same
class, IOU > thresh suppressed)."""
import jax
import jax.numpy as jnp
import numpy as np

from yolov3_tensorflow_tpu.config import Config
from yolov3_tensorflow_tpu.ops.nms import BatchedNMS, greedy_nms
import pytest  # noqa: E402

# oracle-gate subset: `python -m pytest tests/ -m quick -q`
# (device NMS vs greedy oracle)
pytestmark = pytest.mark.quick


def oracle_nms(boxes, scores, classes, thresh):
    """Plain-python greedy NMS; returns kept indices."""
    order = list(np.argsort(-scores))
    kept = []
    while order:
        i = order.pop(0)
        kept.append(i)
        rest = []
        for j in order:
            if classes[j] == classes[i]:
                lt = np.maximum(boxes[i, 0:2], boxes[j, 0:2])
                rb = np.minimum(boxes[i, 2:4], boxes[j, 2:4])
                wh = np.maximum(rb - lt, 0)
                inter = wh[0] * wh[1]
                ai = (boxes[i, 2] - boxes[i, 0]) * (boxes[i, 3] - boxes[i, 1])
                aj = (boxes[j, 2] - boxes[j, 0]) * (boxes[j, 3] - boxes[j, 1])
                iou = inter / max(ai + aj - inter, 1e-12)
                if iou > thresh:
                    continue
            rest.append(j)
        order = rest
    return sorted(kept)


def test_greedy_nms_matches_oracle():
    rng = np.random.RandomState(0)
    for trial in range(20):
        k = 32
        cxy = rng.rand(k, 2)
        wh = 0.05 + 0.3 * rng.rand(k, 2)
        boxes = np.concatenate([cxy - wh / 2, cxy + wh / 2], axis=1) \
            .astype(np.float32)
        scores = rng.rand(k).astype(np.float32)
        classes = rng.randint(0, 3, k).astype(np.float32)
        keep = greedy_nms(jnp.asarray(boxes), jnp.asarray(scores),
                          jnp.asarray(classes),
                          jnp.ones(k, bool), 0.4)
        got = sorted(np.where(np.asarray(keep))[0].tolist())
        want = oracle_nms(boxes, scores, classes, 0.4)
        assert got == want, f"trial {trial}: {got} != {want}"


def test_greedy_nms_respects_validity():
    boxes = jnp.asarray([[0, 0, 1, 1], [0, 0, 1, 1]], jnp.float32)
    scores = jnp.asarray([0.9, 0.8])
    classes = jnp.zeros(2)
    # second box invalid: must not be suppressed-into or kept
    keep = greedy_nms(boxes, scores, classes,
                      jnp.asarray([True, False]), 0.4)
    assert bool(keep[0]) and not bool(keep[1])


def test_batched_nms_end_to_end():
    cfg = Config(input_image_size=(64, 64, 3), class_num=0,
                 confidence_thresh=0.5, nms_thresh=0.4, max_detections=32)
    nms = BatchedNMS(cfg)
    # craft raw heads: everything strongly negative (score~0) except two
    # overlapping candidates on head /32 and one distinct on head /8
    heads = [np.full((1, h, w, c), -8.0, np.float32)
             for (h, w), c in zip(cfg.head_grid_sizes, cfg.head_channel_nums)]
    # head 32 cell (1,1), anchor 0: score high -> sigmoid(4)~0.982
    b32 = cfg.box_len
    heads[2][0, 1, 1, 0 * b32 + 4] = 4.0
    # same cell anchor 1: lower but > thresh; same class (0) and its decoded
    # box overlaps anchor-0's enough to be suppressed
    heads[2][0, 1, 1, 1 * b32 + 4] = 2.0
    # head 8 far-away cell: survives independently
    heads[0][0, 6, 2, 4] = 3.0
    out = jax.jit(nms)( [jnp.asarray(h) for h in heads])
    det = np.asarray(out[0])
    kept = det[det[:, 9] > 0.5]
    # anchor overlap on head-32 cell: anchors (0.6,0.7) and (0.9,0.8) IOU
    # = .42/.72 > 0.4 -> exactly one survives there, plus the head-8 one
    assert len(kept) == 2
    heads_idx = sorted(kept[:, 8].tolist())
    assert heads_idx == [0.0, 2.0]
    # boxes normalized
    assert (kept[:, 0:4] >= -0.5).all() and (kept[:, 0:4] <= 1.5).all()
