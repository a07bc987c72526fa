"""Spatial partitioning (Config.spatial_partition): image HEIGHT
sharded over the mesh model axis, XLA GSPMD partitioning the conv
stack with halo exchanges.

Beyond reference parity (the reference's only parallelism is DP,
yolov3/trainer.py:40-43) — this is the TPU-native scaling axis for
activation-bound regimes (high resolution / tiny per-device batch),
per SURVEY.md §2's parallelism inventory."""
import tempfile

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from yolov3_tensorflow_tpu.config import Config
from yolov3_tensorflow_tpu.parallel.mesh import (image_sharding, make_mesh,
                                                 mesh_from_config)
from yolov3_tensorflow_tpu.train.trainer import YOLOv3Trainer


def _batch(n=8, hw=64, seed=0):
    rng = np.random.RandomState(seed)
    images = jnp.asarray(rng.rand(n, hw, hw, 3).astype(np.float32))
    labels = -np.ones((n, 4, 5), np.float32)
    labels[:, 0] = [0.5, 0.5, 0.3, 0.3, 0]
    labels[:, 1] = [0.25, 0.7, 0.2, 0.15, 0]
    return images, jnp.asarray(labels)


def test_mesh_factorization_and_sharding():
    assert len(jax.devices()) >= 8
    mesh = make_mesh(8, model_size=4)
    assert mesh.shape == {"data": 2, "model": 4}
    sh = image_sharding(mesh)
    assert sh.spec == jax.sharding.PartitionSpec("data", "model")
    cfg = Config(num_devices=8, spatial_partition=4)
    assert mesh_from_config(cfg).shape == {"data": 2, "model": 4}


def test_spatial_forward_matches_dp_and_single_f32():
    """2 data x 4 spatial mesh, f32 compute: the three raw head tensors
    must match the pure-DP and single-device runs to reduction-order
    noise (measured 6e-7 relative) — pins that GSPMD's halo-exchange
    partitioning of the conv stack is semantics-preserving.  (bf16
    comparisons at random init are chaotic — last-bit conv differences
    amplify through the barely-warmed running-stat BNs.)"""
    images, _ = _batch()
    heads = {}
    for name, (nd, spatial) in (("spatial", (8, 4)), ("dp", (8, 1)),
                                ("single", (1, 1))):
        cfg = Config(input_image_size=(64, 64, 3), batch_size=8,
                     max_boxes=4, model_backbone="resnet-18",
                     num_devices=nd, spatial_partition=spatial,
                     is_augment=False, stem_backend="xla",
                     conv_backend="xla", compute_dtype="float32")
        trainer = YOLOv3Trainer(cfg, restore=False,
                                checkpoint_dir=tempfile.mkdtemp())
        heads[name] = trainer.predict(images)
    for other in ("dp", "single"):
        for a, b in zip(heads["spatial"], heads[other]):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-5, atol=2e-5,
                                       err_msg=f"spatial vs {other}")


def test_spatial_train_loss_matches_dp():
    """Production bf16 config: one train step on the spatial mesh
    matches the pure-DP loss (reduction-order tolerance), and eval
    stays finite."""
    images, labels = _batch()
    losses = {}
    for name, spatial in (("spatial", 4), ("dp", 1)):
        cfg = Config(input_image_size=(64, 64, 3), batch_size=8,
                     max_boxes=4, model_backbone="resnet-18",
                     num_devices=8, spatial_partition=spatial,
                     is_augment=False, stem_backend="xla",
                     conv_backend="xla")
        trainer = YOLOv3Trainer(cfg, restore=False,
                                checkpoint_dir=tempfile.mkdtemp())
        state, tm = trainer.train_step(trainer.state, images, labels)
        em = trainer.eval_step(state, images, labels)
        losses[name] = float(tm["total_loss"])
        assert np.isfinite(losses[name]) and \
            np.isfinite(float(em["total_loss"])), name
    np.testing.assert_allclose(losses["spatial"], losses["dp"],
                               rtol=1e-3, err_msg=str(losses))


def test_spatial_rejects_custom_kernel_backends():
    cfg = Config(input_image_size=(64, 64, 3), batch_size=8, max_boxes=4,
                 num_devices=8, spatial_partition=4, stem_backend="fused")
    with pytest.raises(AssertionError):
        YOLOv3Trainer(cfg, restore=False,
                      checkpoint_dir=tempfile.mkdtemp())


def test_spatial_predict_odd_batch():
    """Mesh-padded predict under the spatial mesh (batch not divisible
    by the data axis)."""
    cfg = Config(input_image_size=(64, 64, 3), batch_size=8, max_boxes=4,
                 num_devices=8, spatial_partition=4, is_augment=False)
    trainer = YOLOv3Trainer(cfg, restore=False,
                            checkpoint_dir=tempfile.mkdtemp())
    odd = np.random.RandomState(1).rand(3, 64, 64, 3).astype(np.float32)
    heads = trainer.predict(odd)
    assert heads[0].shape[0] == 3
    assert all(np.isfinite(np.asarray(h)).all() for h in heads)
