"""Winograd F(2,3) fused conv kernel: numerical parity with direct
convolution, gradient correctness of the custom VJP, and eligibility
gating (runs in Pallas interpret mode on the CPU test backend)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from yolov3_tensorflow_tpu.ops.winograd import (conv3x3, eligible,
                                                pick_wchunk)


def direct(x, w):
    return jax.lax.conv_general_dilated(
        x.astype(jnp.bfloat16), w.astype(jnp.bfloat16), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.bfloat16).astype(jnp.float32)


SHAPES = [
    (2, 8, 8, 8, 8),      # square even
    (2, 10, 6, 8, 16),    # C != Co
    (1, 7, 9, 8, 8),      # odd H and W (padded final col/row)
    (2, 6, 20, 8, 8),     # chunk-divisible W
]


@pytest.mark.parametrize("shape", SHAPES)
def test_forward_matches_direct(shape):
    N, H, W, C, Co = shape
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    x = jax.random.normal(k1, (N, H, W, C), jnp.float32)
    w = jax.random.normal(k2, (3, 3, C, Co), jnp.float32) * 0.2
    ref = direct(x, w)
    got = conv3x3(x.astype(jnp.bfloat16),
                  w.astype(jnp.bfloat16)).astype(jnp.float32)
    scale = float(jnp.max(jnp.abs(ref))) + 1e-6
    np.testing.assert_allclose(np.asarray(got) / scale,
                               np.asarray(ref) / scale, atol=0.03)


def test_forward_small_wchunks():
    # force chunking by picking a wide W so the eligibility path chunks
    N, H, W, C, Co = 1, 4, 32, 8, 8
    k1, k2 = jax.random.split(jax.random.PRNGKey(1))
    x = jax.random.normal(k1, (N, H, W, C), jnp.float32)
    w = jax.random.normal(k2, (3, 3, C, Co), jnp.float32) * 0.2
    ref = direct(x, w)
    got = conv3x3(x.astype(jnp.bfloat16),
                  w.astype(jnp.bfloat16)).astype(jnp.float32)
    scale = float(jnp.max(jnp.abs(ref))) + 1e-6
    np.testing.assert_allclose(np.asarray(got) / scale,
                               np.asarray(ref) / scale, atol=0.03)


def test_gradients_match_direct():
    N, H, W, C, Co = 2, 8, 8, 8, 8
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(2), 3)
    x = jax.random.normal(k1, (N, H, W, C), jnp.float32)
    w = jax.random.normal(k2, (3, 3, C, Co), jnp.float32) * 0.2
    g = jax.random.normal(k3, (N, H, W, Co), jnp.float32)

    def loss_ref(x, w):
        return jnp.sum(direct(x, w) * g)

    def loss_win(x, w):
        return jnp.sum(conv3x3(x.astype(jnp.bfloat16),
                               w.astype(jnp.bfloat16)).astype(jnp.float32)
                       * g)

    dxr, dwr = jax.grad(loss_ref, argnums=(0, 1))(x, w)
    dxw, dww = jax.grad(loss_win, argnums=(0, 1))(x, w)
    for a, b in ((dxr, dxw), (dwr, dww)):
        scale = float(jnp.max(jnp.abs(a))) + 1e-6
        np.testing.assert_allclose(np.asarray(b) / scale,
                                   np.asarray(a) / scale, atol=0.05)


def test_eligibility():
    assert eligible((8, 32, 32, 64), 64, (3, 3), (1, 1), "SAME", 1)
    assert not eligible((8, 32, 32, 64), 64, (1, 1), (1, 1), "SAME", 1)
    assert not eligible((8, 32, 32, 64), 64, (3, 3), (2, 2), "SAME", 1)
    assert not eligible((8, 32, 32, 64), 64, (3, 3), (1, 1), "VALID", 1)
    assert not eligible((8, 32, 32, 64), 64, (3, 3), (1, 1), "SAME", 64)
    assert not eligible((8, 32, 32, 60), 60, (3, 3), (1, 1), "SAME", 1)
    # enormous channel counts must fall back rather than blow VMEM
    assert pick_wchunk(52, 4096, 4096, 128) is None


def test_model_backend_parity(tiny_cfg):
    """Same init -> winograd and xla detectors agree within bf16-winograd
    tolerance, with identical parameter trees (checkpoint portability)."""
    from yolov3_tensorflow_tpu.models.detector import build_detector
    cfg_x = tiny_cfg.replace(conv_backend="xla")
    cfg_w = tiny_cfg.replace(conv_backend="winograd")
    mx, mw = build_detector(cfg_x), build_detector(cfg_w)
    h, w, c = tiny_cfg.input_image_size
    x = jax.random.normal(jax.random.PRNGKey(0), (2, h, w, c))
    vx = mx.init(jax.random.PRNGKey(1), x, train=False)
    vw = mw.init(jax.random.PRNGKey(1), x, train=False)
    assert (jax.tree_util.tree_structure(vx)
            == jax.tree_util.tree_structure(vw))
    ox = mx.apply(vx, x, train=False)
    ow = mw.apply(vw, x, train=False)
    for a, b in zip(ox, ow):
        scale = float(jnp.max(jnp.abs(a))) + 1e-6
        np.testing.assert_allclose(np.asarray(b) / scale,
                                   np.asarray(a) / scale, atol=0.05)
