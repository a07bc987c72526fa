"""Numerical parity gates vs TensorFlow/Keras ops (SURVEY §4 implication c).

The reference is TF1.13 graph-mode and cannot be executed directly, but its
building blocks (Conv2D same/he_normal, BatchNormalization momentum .9
eps 1e-5, MaxPool2D same, sigmoid/exp decode math) exist unchanged in TF2.
These tests pin our flax/jnp implementations against them with identical
weights."""
import numpy as np
import pytest

tf = pytest.importorskip("tensorflow")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def test_conv_same_parity():
    """nn.Conv(SAME, no bias) == keras Conv2D(padding=same) with the same
    kernel (basic_backbone.py:20-43 semantics)."""
    from flax import linen as nn
    rng = np.random.RandomState(0)
    x = rng.randn(2, 16, 20, 8).astype(np.float32)
    k = (0.2 * rng.randn(3, 3, 8, 16)).astype(np.float32)

    conv = nn.Conv(16, (3, 3), padding="SAME", use_bias=False)
    y = conv.apply({"params": {"kernel": jnp.asarray(k)}}, jnp.asarray(x))

    layer = tf.keras.layers.Conv2D(16, 3, padding="same", use_bias=False)
    layer.build((None, 16, 20, 8))
    layer.set_weights([k])
    yt = layer(tf.constant(x)).numpy()
    np.testing.assert_allclose(np.asarray(y), yt, atol=2e-5)


def test_strided_conv_same_parity():
    """Stride-2 SAME padding geometry matches TF (even input: pad end only)."""
    from flax import linen as nn
    rng = np.random.RandomState(1)
    x = rng.randn(1, 16, 16, 4).astype(np.float32)
    k = (0.2 * rng.randn(3, 3, 4, 8)).astype(np.float32)
    y = nn.Conv(8, (3, 3), strides=(2, 2), padding="SAME",
                use_bias=False).apply(
        {"params": {"kernel": jnp.asarray(k)}}, jnp.asarray(x))
    layer = tf.keras.layers.Conv2D(8, 3, strides=2, padding="same",
                                   use_bias=False)
    layer.build((None, 16, 16, 4))
    layer.set_weights([k])
    yt = layer(tf.constant(x)).numpy()
    assert y.shape == yt.shape == (1, 8, 8, 8)
    np.testing.assert_allclose(np.asarray(y), yt, atol=2e-5)


def test_batchnorm_train_parity():
    """FusedBatchNorm (train mode) == keras BatchNormalization(momentum .9,
    eps 1e-5): normalized output AND moving-average updates
    (basic_backbone.py:68-78)."""
    from yolov3_tensorflow_tpu.models.layers import FusedBatchNorm
    rng = np.random.RandomState(2)
    x = (2.0 + 3.0 * rng.randn(4, 6, 6, 8)).astype(np.float32)
    gamma = (1.0 + 0.1 * rng.randn(8)).astype(np.float32)
    beta = (0.1 * rng.randn(8)).astype(np.float32)

    bn = FusedBatchNorm(use_running_average=False, dtype=jnp.float32)
    variables = {
        "params": {"scale": jnp.asarray(gamma), "bias": jnp.asarray(beta)},
        "batch_stats": {"mean": jnp.zeros(8), "var": jnp.ones(8)},
    }
    y, mut = bn.apply(variables, jnp.asarray(x), mutable=["batch_stats"])

    layer = tf.keras.layers.BatchNormalization(momentum=0.9, epsilon=1e-5)
    layer.build((None, 6, 6, 8))
    layer.set_weights([gamma, beta, np.zeros(8, np.float32),
                       np.ones(8, np.float32)])
    yt = layer(tf.constant(x), training=True).numpy()
    np.testing.assert_allclose(np.asarray(y), yt, atol=2e-4)
    mm, mv = [w.numpy() for w in layer.weights[2:4]]
    np.testing.assert_allclose(np.asarray(mut["batch_stats"]["mean"]), mm,
                               rtol=1e-4)
    np.testing.assert_allclose(np.asarray(mut["batch_stats"]["var"]), mv,
                               rtol=2e-3)


def test_batchnorm_eval_parity():
    from yolov3_tensorflow_tpu.models.layers import FusedBatchNorm
    rng = np.random.RandomState(3)
    x = rng.randn(2, 4, 4, 8).astype(np.float32)
    gamma = np.ones(8, np.float32)
    beta = np.zeros(8, np.float32)
    mean = rng.randn(8).astype(np.float32)
    var = (1.0 + 0.5 * rng.rand(8)).astype(np.float32)
    bn = FusedBatchNorm(use_running_average=True, dtype=jnp.float32)
    y = bn.apply({"params": {"scale": jnp.asarray(gamma),
                             "bias": jnp.asarray(beta)},
                  "batch_stats": {"mean": jnp.asarray(mean),
                                  "var": jnp.asarray(var)}},
                 jnp.asarray(x))
    layer = tf.keras.layers.BatchNormalization(momentum=0.9, epsilon=1e-5)
    layer.build((None, 4, 4, 8))
    layer.set_weights([gamma, beta, mean, var])
    yt = layer(tf.constant(x), training=False).numpy()
    np.testing.assert_allclose(np.asarray(y), yt, atol=1e-5)


def test_maxpool_same_parity():
    from yolov3_tensorflow_tpu.models.layers import BasicBackbone
    rng = np.random.RandomState(4)
    x = rng.randn(1, 9, 9, 4).astype(np.float32)
    y = BasicBackbone.max_pool(jnp.asarray(x))
    yt = tf.keras.layers.MaxPooling2D(pool_size=3, strides=2,
                                      padding="same")(
        tf.constant(x)).numpy()
    assert y.shape == yt.shape
    np.testing.assert_allclose(np.asarray(y), yt)


def test_upsample_nearest_parity():
    from yolov3_tensorflow_tpu.models.layers import upsample2x_nearest
    rng = np.random.RandomState(5)
    x = rng.randn(1, 4, 5, 3).astype(np.float32)
    y = upsample2x_nearest(jnp.asarray(x))
    yt = tf.keras.layers.UpSampling2D(size=(2, 2),
                                      interpolation="nearest")(
        tf.constant(x)).numpy()
    np.testing.assert_allclose(np.asarray(y), yt)


def test_decode_math_parity():
    """Decoder sigmoid/exp/clip math vs tf ops (yolov3_decoder.py:142-180)."""
    from yolov3_tensorflow_tpu.ops.decoder import decode_single_head
    rng = np.random.RandomState(6)
    raw = rng.randn(1, 4, 4, 2, 5).astype(np.float32) * 3
    left_top = np.stack(np.meshgrid(np.arange(4), np.arange(4)),
                        -1).reshape(4, 4, 1, 2).astype(np.float32)
    anchors = np.asarray([[1.5, 2.0], [3.0, 1.0]], np.float32)
    eps = 1e-8
    _, decoded, boxes = decode_single_head(
        jnp.asarray(raw), jnp.asarray(left_top), jnp.asarray(anchors), 0,
        eps)
    xy_t = tf.clip_by_value(tf.sigmoid(raw[..., 0:2]), eps, 1 - eps) \
        + left_top
    wh_t = tf.exp(raw[..., 2:4]) * anchors
    sc_t = tf.clip_by_value(tf.sigmoid(raw[..., 4:5]), eps, 1 - eps)
    np.testing.assert_allclose(np.asarray(decoded[..., 0:2]), xy_t.numpy(),
                               rtol=1e-5)
    np.testing.assert_allclose(np.asarray(decoded[..., 2:4]), wh_t.numpy(),
                               rtol=1e-5)
    np.testing.assert_allclose(np.asarray(decoded[..., 4]),
                               sc_t.numpy()[..., 0], rtol=1e-5)


def test_saturation_out_of_gamut_parity():
    """_saturate's closed form == tf.image.adjust_saturation PER PIXEL,
    including the out-of-gamut tail the reference feeds it (brightness
    pushes pixels past [0,1] BEFORE saturation in order 0, and the chain
    clips only once at the end — dataset_util.py:57-104): s > 1 when
    min < 0, uniform-V collapse when V <= 0, s' capped at 1."""
    from yolov3_tensorflow_tpu.data.augment import _saturate
    rng = np.random.RandomState(0)
    x = rng.uniform(-0.2, 1.2, (4, 8, 8, 3)).astype(np.float32)
    x[0, 0, 0] = [-0.1, -0.05, -0.02]   # all negative: collapse to V
    x[0, 0, 1] = [0.0, -0.1, -0.2]      # V == 0 boundary
    x[0, 0, 2] = [0.5, 0.5, 0.5]        # uniform (chroma 0)
    x[0, 0, 3] = [1.1, 1.05, 1.08]      # all > 1
    for f in (0.9, 1.0, 1.1):
        want = tf.image.adjust_saturation(tf.constant(x), f).numpy()
        got = np.asarray(_saturate(
            jnp.asarray(x), jnp.full((4, 1, 1), f, jnp.float32)))
        np.testing.assert_allclose(got, want, atol=2e-6, err_msg=str(f))
