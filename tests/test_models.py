"""Model structure: head shapes for all 5 backbones, L2 accounting
(head output convs excluded per yolov3_detector.py:98-100), pack/unpack
reference-layout round-trip, decoder golden values."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from yolov3_tensorflow_tpu.config import Config
from yolov3_tensorflow_tpu.models.detector import (BACKBONE_TYPE,
                                                   build_detector,
                                                   pack_heads, unpack_heads)
from yolov3_tensorflow_tpu.models.layers import l2_regularization
from yolov3_tensorflow_tpu.ops.decoder import YOLOv3Decoder


@pytest.mark.parametrize("backbone", sorted(BACKBONE_TYPE))
def test_backbone_head_shapes(backbone, tiny_cfg):
    cfg = tiny_cfg.replace(model_backbone=backbone)
    model = build_detector(cfg)
    x = jnp.zeros((1, 96, 128, 3))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    heads = model.apply(variables, x, train=False)
    for h, (gh, gw), ch in zip(heads, cfg.head_grid_sizes,
                               cfg.head_channel_nums):
        assert h.shape == (1, gh, gw, ch)
        assert h.dtype == jnp.float32


def test_l2_regularization_excludes_head_out(tiny_cfg):
    model = build_detector(tiny_cfg)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 96, 128, 3)), train=False)
    params = variables["params"]
    kreg, greg = l2_regularization(params)
    assert float(kreg) > 0 and float(greg) > 0
    # zeroing every non-head kernel must zero kreg even with huge head convs
    def scrub(path_keys, leaf):
        name = "/".join(path_keys)
        if path_keys[-1] == "kernel":
            if "head_out" in name:
                return jnp.full_like(leaf, 100.0)
            return jnp.zeros_like(leaf)
        return leaf

    flat = jax.tree_util.tree_flatten_with_path(params)
    scrubbed = jax.tree_util.tree_unflatten(
        flat[1], [scrub([str(getattr(p, "key", p)) for p in path], leaf)
                  for path, leaf in flat[0]])
    kreg2, _ = l2_regularization(scrubbed)
    assert float(kreg2) == 0.0


def test_pack_unpack_roundtrip(tiny_cfg):
    cfg = tiny_cfg
    heads = [jnp.arange(np.prod((2, gh, gw, ch)), dtype=jnp.float32)
             .reshape(2, gh, gw, ch)
             for (gh, gw), ch in zip(cfg.head_grid_sizes,
                                     cfg.head_channel_nums)]
    merged = pack_heads(*heads)
    # merged channel count: c8*16 + c16*4 + c32 (yolov3_detector.py:68)
    c8, c16, c32 = cfg.head_channel_nums
    assert merged.shape[-1] == c8 * 16 + c16 * 4 + c32
    back = unpack_heads(merged, cfg.head_grid_sizes, cfg.box_num,
                        cfg.box_len)
    for h, b in zip(heads, back):
        np.testing.assert_allclose(np.asarray(h).reshape(b.shape),
                                   np.asarray(b))


def test_decoder_golden():
    """Hand-computed decode for one cell (yolov3_decoder.py:142-169)."""
    cfg = Config(input_image_size=(32, 32, 3), class_num=0,
                 anchor_boxes=(((0.5, 0.25),), ((0.5, 0.5),),
                               ((0.5, 0.5),)))
    dec = YOLOv3Decoder(cfg)
    raw = [jnp.zeros((1, gh, gw, ch)) for (gh, gw), ch in zip(
        cfg.head_grid_sizes, cfg.head_channel_nums)]
    # head 8 grid is 4x4; anchors (0.5, 0.25)*[4,4] = (2.0, 1.0)
    out = dec.decode(raw)
    _, decoded, boxes = out[0]
    # raw zeros: sigmoid=0.5 -> xy = left_top + 0.5; wh = anchors;
    # score = 0.5
    cell = np.asarray(decoded[0, 1, 2, 0])  # row 1, col 2
    np.testing.assert_allclose(cell[0:2], [2.5, 1.5], atol=1e-6)
    np.testing.assert_allclose(cell[2:4], [2.0, 1.0], atol=1e-6)
    np.testing.assert_allclose(cell[4], 0.5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(boxes[0, 1, 2, 0]),
                               [1.5, 1.0, 3.5, 2.0], atol=1e-6)


def test_decoder_clipping():
    """Extreme logits must clip to [eps, 1-eps] (yolov3_decoder.py:154)."""
    cfg = Config(input_image_size=(32, 32, 3))
    dec = YOLOv3Decoder(cfg)
    raw = [jnp.full((1, gh, gw, ch), 50.0) for (gh, gw), ch in zip(
        cfg.head_grid_sizes, cfg.head_channel_nums)]
    out = dec.decode(raw)
    for _, decoded, _ in out:
        frac = np.asarray(decoded[..., 0:2]) % 1.0
        assert (frac <= 1 - 1e-8 + 1e-12).all()
        assert np.asarray(decoded[..., 4]).max() <= 1 - 1e-8 + 1e-12
