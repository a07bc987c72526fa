"""Fused normalize+noise Pallas kernel (ops/augment_noise.py) and its
augment integration (data/augment.py augment_batch_fused, trainer
augment_backend gating).

The kernel's counter-based randomness is platform-deterministic, so
these interpret-mode CPU tests pin the EXACT production bit-stream
(unlike the threefry XLA path, pltpu hardware PRNG is not used).
Reference semantics mirrored: dataset/dataset_util.py:30-55 (gaussian
stddev 0.01; per-PIXEL salt-pepper, p=0.01 select / p=0.5 salt)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from yolov3_tensorflow_tpu.data.augment import (RANDOM_NORMAL, _scalars,
                                                augment_batch,
                                                augment_batch_fused)
from yolov3_tensorflow_tpu.ops import augment_noise
from yolov3_tensorflow_tpu.ops.augment_noise import (_mix, _ndtri, _u01,
                                                     noisy_normalize)


def _imgs(n, h, w, seed=0):
    return jnp.asarray(np.random.RandomState(seed).randint(
        0, 256, (n, h, w, 3), np.uint8))


def _seeds2(*vals):
    """(N, 2) int32 seed pairs from scalars (second word derived)."""
    v = np.asarray(vals, np.int64)
    return jnp.asarray(np.stack([v, v * 7919 + 13], axis=1)
                       .astype(np.int32))


def test_ndtri_matches_jax_scipy():
    from jax.scipy.special import ndtri as ref
    u = jnp.asarray(np.linspace(2e-25, 1 - 1e-7, 4001), jnp.float32)
    err = np.asarray(jnp.abs(_ndtri(u) - ref(u)))
    assert err.max() < 5e-4, err.max()  # z units; noise std is 0.01*z


def test_noise_off_is_exact_normalize():
    img = _imgs(2, 32, 32)
    out = noisy_normalize(img, _seeds2(3, 7),
                          jnp.zeros(2), -jnp.ones(2),
                          out_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(out),
                               np.asarray(img, np.float32) / 255.0,
                               rtol=0, atol=1e-7)


def test_gaussian_noise_distribution():
    img = _imgs(2, 64, 64)
    out = noisy_normalize(img, _seeds2(3, 7),
                          0.01 * jnp.ones(2), -jnp.ones(2),
                          out_dtype=jnp.float32)
    d = np.asarray(out) - np.asarray(img, np.float32) / 255.0
    assert abs(d.mean()) < 3e-4
    assert abs(d.std() - 0.01) < 5e-4
    assert np.abs(d).max() < 0.01 * 6.5  # ~5.6 sigma max at 24-bit u


def test_salt_pepper_is_per_pixel():
    """Select/salt masks are channel-shared (reference per-pixel masks,
    dataset_util.py:36-43) and hit the requested density."""
    img = _imgs(3, 64, 64, seed=1)
    seeds = _seeds2(11, 22, 33)
    out = noisy_normalize(img, seeds, jnp.zeros(3), 0.5 * jnp.ones(3),
                          out_dtype=jnp.float32)
    ref = np.asarray(img, np.float32) / 255.0
    vals = np.asarray(out)
    # every output channel is either untouched or exactly salt (0/1)
    changed = np.abs(vals - ref) > 1e-7
    assert np.isin(vals[changed], [0.0, 1.0]).all()
    # channel-shared: a changed pixel's channels agree unless the
    # original channel already equalled the salt value
    pix_sel = changed.any(-1)
    salt_val = np.where(vals[pix_sel][:, 0][:, None] > 0.5, 1.0, 0.0)
    agree = (vals[pix_sel] == salt_val) | ~changed[pix_sel]
    assert agree.all()
    frac = pix_sel.mean()
    assert abs(frac - 0.5) < 0.02, frac
    salt_frac = (vals[changed] > 0.5).mean()
    assert abs(salt_frac - 0.5) < 0.03, salt_frac


def test_chunk_grid_invariance(monkeypatch):
    """The global-index counter hash makes the output independent of the
    grid chunking (pixels straddle chunk boundaries: RB*128 % 3 != 0)."""
    img = _imgs(1, 48, 64, seed=2)  # R = 48*64*3/128 = 72 rows
    seeds = _seeds2(5)
    args = (seeds, 0.01 * jnp.ones(1), jnp.asarray([0.01]))
    whole = noisy_normalize(img, *args, out_dtype=jnp.float32)
    monkeypatch.setattr(augment_noise, "_MAX_ROWS", 9)  # 72 -> 8 chunks
    chunked = noisy_normalize(img, *args, out_dtype=jnp.float32)
    np.testing.assert_array_equal(np.asarray(whole), np.asarray(chunked))


def test_fused_matches_xla_for_noiseless_images():
    """Per-image scalar stream is SHARED between backends: images that
    draw noise_type=2 (no noise) must come out identical (f32)."""
    rng = jax.random.key(9, impl="rbg")
    img = _imgs(16, 32, 32, seed=3)
    fused = augment_batch_fused(rng, img, jnp.float32)
    xla = augment_batch(rng, jnp.asarray(img, jnp.float32) / 255.0)
    noise_type, _, _ = _scalars(rng, 16, jnp.float32)
    quiet = np.asarray(noise_type) == 2
    assert quiet.any()  # ~1/3 of 16
    np.testing.assert_allclose(np.asarray(fused)[quiet],
                               np.asarray(xla)[quiet], rtol=0, atol=2e-6)
    # and the noisy images match in distribution: same clip range
    assert float(jnp.min(fused)) >= 0.0 and float(jnp.max(fused)) <= 1.0


def test_mesh_partitioning_matches_single_device():
    from yolov3_tensorflow_tpu.ops.partition import set_op_mesh
    from yolov3_tensorflow_tpu.parallel.mesh import make_mesh
    img = _imgs(8, 32, 32, seed=4)
    seeds = _seeds2(*range(8))
    args = (seeds, 0.01 * jnp.ones(8), jnp.asarray([0.01] * 8))
    single = noisy_normalize(img, *args, out_dtype=jnp.float32)
    mesh = make_mesh(8)
    set_op_mesh(mesh, "data")
    try:
        sharded = noisy_normalize(img, *args, out_dtype=jnp.float32)
    finally:
        set_op_mesh(None)
    np.testing.assert_array_equal(np.asarray(single), np.asarray(sharded))


def test_trainer_fused_augment_step():
    """train_step with augment_backend='fused' (interpret on CPU): the
    full sharded step runs and is finite; a uint8 batch on 'xla'
    config gives a loss in the same ballpark (different noise bits)."""
    import tempfile

    from yolov3_tensorflow_tpu.config import Config
    from yolov3_tensorflow_tpu.train.trainer import YOLOv3Trainer

    rng = np.random.RandomState(5)
    images = jnp.asarray(rng.randint(0, 256, (8, 64, 64, 3), np.uint8))
    labels = -np.ones((8, 4, 5), np.float32)
    labels[:, 0] = [0.5, 0.5, 0.3, 0.3, 0]
    labels = jnp.asarray(labels)
    losses = {}
    for backend in ("fused", "xla"):
        cfg = Config(input_image_size=(64, 64, 3), batch_size=8,
                     max_boxes=4, num_devices=1, is_augment=True,
                     augment_backend=backend)
        trainer = YOLOv3Trainer(cfg, restore=False,
                                checkpoint_dir=tempfile.mkdtemp())
        _, metrics = trainer.train_step(trainer.state, images, labels)
        losses[backend] = float(metrics["total_loss"])
        assert np.isfinite(losses[backend]), losses
    assert abs(losses["fused"] - losses["xla"]) / losses["xla"] < 0.05, \
        losses


def test_spatial_partition_rejects_fused_augment():
    from yolov3_tensorflow_tpu.config import Config
    from yolov3_tensorflow_tpu.train.trainer import YOLOv3Trainer
    import tempfile
    cfg = Config(input_image_size=(64, 64, 3), batch_size=8, max_boxes=4,
                 num_devices=8, spatial_partition=2,
                 augment_backend="fused")
    with pytest.raises(AssertionError):
        YOLOv3Trainer(cfg, restore=False,
                      checkpoint_dir=tempfile.mkdtemp())

def test_pick_rb_is_mosaic_legal_for_all_multiscale_sizes():
    """Mosaic requires the sublane block dim to be divisible by 8 or
    equal to the full dim — the RB=2028 divisor at 416x416 passed
    interpret mode and failed real-TPU lowering (round 3).  Pin the
    rule for every multi-scale input size (320..608 step 32)."""
    for k in range(10, 20):
        size = 32 * k
        total = size * size * 3
        assert total % 128 == 0
        R = total // 128
        rb = augment_noise._pick_rb(R)
        assert R % rb == 0, (size, rb)
        assert rb == R or rb % 8 == 0, (size, rb)
        assert rb <= augment_noise._MAX_ROWS or rb == R, (size, rb)
