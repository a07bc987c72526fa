"""Multi-scale input training (reference TODO, README.md:130): per-size
jitted steps over shared params, size cycling per epoch."""
import tempfile

import jax.numpy as jnp
import numpy as np

from yolov3_tensorflow_tpu.config import Config
from yolov3_tensorflow_tpu.train.trainer import YOLOv3Trainer


class _FakeBatch:
    def __init__(self, images, labels):
        self.images, self.labels = images, labels


def _iter(hw, batch, seed):
    rng = np.random.RandomState(seed)
    while True:
        images = rng.rand(batch, hw[0], hw[1], 3).astype(np.float32)
        labels = -np.ones((batch, 4, 5), np.float32)
        labels[:, 0] = [0.5, 0.5, 0.3, 0.3, 0]
        yield _FakeBatch(images, labels)


def test_multi_scale_training_cycles_sizes():
    cfg = Config(input_image_size=(64, 64, 3), batch_size=8, max_boxes=4,
                 rectified_coord_num=-1, is_augment=False,
                 compute_dtype="float32", ckpt_period=1000,
                 multi_scale_sizes=((64, 64), (96, 96)))
    tr = YOLOv3Trainer(cfg, restore=False,
                       checkpoint_dir=tempfile.mkdtemp())
    batches = {hw: _iter(hw, 8, i) for i, hw in
               enumerate(cfg.multi_scale_sizes)}
    tr.train_multi_scale(batches, epochs=4, steps_per_epoch=2)
    assert len(tr.history) == 4
    assert int(tr.state.step) == 8
    assert all(np.isfinite(h) for h in tr.history)
    # both sizes compiled and used
    assert set(tr._size_steps.keys()) == {(64, 64), (96, 96)}
    # loss magnitudes differ by size (noobj sums over the grid), so compare
    # only same-size epochs: epoch 2 (64x64) vs epoch 0 (64x64)
    assert tr.history[2] < tr.history[0]
