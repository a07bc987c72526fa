"""The loss's internal flat decoder and the public YOLOv3Decoder are
separate implementations of yolov3_decoder.py's math (different layouts for
different consumers); they must agree exactly."""
import jax.numpy as jnp
import numpy as np

from yolov3_tensorflow_tpu.config import Config
from yolov3_tensorflow_tpu.ops.decoder import YOLOv3Decoder
from yolov3_tensorflow_tpu.ops.loss import _flat_decode
import pytest  # noqa: E402

# oracle-gate subset: `python -m pytest tests/ -m quick -q`
# (decoder implementations agree)
pytestmark = pytest.mark.quick


def test_flat_decode_matches_public_decoder():
    cfg = Config(input_image_size=(64, 96, 3), class_num=3,
                 anchor_boxes=(((0.2, 0.3), (0.5, 0.4)),
                               ((0.3, 0.3),),
                               ((0.6, 0.7), (0.9, 0.8), (0.4, 0.2))))
    dec = YOLOv3Decoder(cfg)
    rng = np.random.RandomState(0)
    raws = [jnp.asarray(2 * rng.randn(2, h, w, c).astype(np.float32))
            for (h, w), c in zip(cfg.head_grid_sizes, cfg.head_channel_nums)]
    public = dec.decode(raws)
    for i, raw in enumerate(raws):
        h, w = cfg.head_grid_sizes[i]
        b = cfg.box_num[i]
        flat = _flat_decode(raw, (h, w), dec.anchors[i], cfg.class_num,
                            cfg.epsilon)
        _, decoded, boxes = public[i]
        dd = np.asarray(decoded).reshape(2, -1, cfg.box_len)
        np.testing.assert_allclose(np.asarray(flat["px"]), dd[..., 0],
                                   rtol=1e-6)
        np.testing.assert_allclose(np.asarray(flat["py"]), dd[..., 1],
                                   rtol=1e-6)
        np.testing.assert_allclose(np.asarray(flat["pw"]), dd[..., 2],
                                   rtol=1e-6)
        np.testing.assert_allclose(np.asarray(flat["ph"]), dd[..., 3],
                                   rtol=1e-6)
        np.testing.assert_allclose(np.asarray(flat["score"]), dd[..., 4],
                                   rtol=1e-6)
        np.testing.assert_allclose(np.asarray(flat["probs"]), dd[..., 5:],
                                   rtol=1e-5)
        bb = np.asarray(boxes).reshape(2, -1, 4)
        np.testing.assert_allclose(np.asarray(flat["x0"]), bb[..., 0],
                                   rtol=1e-6)
        np.testing.assert_allclose(np.asarray(flat["y1"]), bb[..., 3],
                                   rtol=1e-6)


def test_gaussian_decoder_certainty_scaled_score():
    """Gaussian YOLO (roadmap README.md:135): the PUBLIC decoder's score
    is objectness * (1 - mean sigma) — the paper's detection criterion —
    in the standard 5+C decoded layout, while the LOSS-side flat decode
    keeps the plain objectness sigmoid."""
    cfg = Config(input_image_size=(64, 96, 3), class_num=3,
                 is_gaussian_yolo=True,
                 anchor_boxes=(((0.2, 0.3), (0.5, 0.4)),
                               ((0.3, 0.3),),
                               ((0.6, 0.7), (0.9, 0.8))))
    assert cfg.box_len == 9 + 3
    dec = YOLOv3Decoder(cfg)
    rng = np.random.RandomState(7)
    raws = [jnp.asarray(2 * rng.randn(2, h, w, c).astype(np.float32))
            for (h, w), c in zip(cfg.head_grid_sizes,
                                 cfg.head_channel_nums)]
    public = dec.decode(raws)
    sig = lambda v: 1.0 / (1.0 + np.exp(-v))
    for i, raw in enumerate(raws):
        h, w = cfg.head_grid_sizes[i]
        b = cfg.box_num[i]
        r = np.asarray(raw, np.float64).reshape(2, h, w, b, cfg.box_len)
        _, decoded, _ = public[i]
        decoded = np.asarray(decoded)
        # decoded layout stays [xy, wh, score, C probs] = 5 + C wide
        assert decoded.shape[-1] == 5 + cfg.class_num
        sigma = np.clip(sig(r[..., 4:8]), cfg.epsilon, 1 - 1e-7)
        expect = np.clip(sig(r[..., 8]), cfg.epsilon, 1 - 1e-7) \
            * (1.0 - sigma.mean(-1))
        np.testing.assert_allclose(decoded[..., 4], expect, rtol=1e-5)
        # the loss-side flat decode keeps the PLAIN objectness
        flat = _flat_decode(raw, (h, w), dec.anchors[i], cfg.class_num,
                            cfg.epsilon, gaussian=True)
        np.testing.assert_allclose(
            np.asarray(flat["score"]).reshape(2, h, w, b),
            np.clip(sig(r[..., 8]), cfg.epsilon, 1 - 1e-7), rtol=1e-5)
        np.testing.assert_allclose(
            np.asarray(flat["sigma"]).reshape(2, h, w, b, 4),
            sigma, rtol=1e-5)
