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


def test_multi_scale_validation_at_fixed_size():
    """Multi-scale epochs cycle the TRAIN size; a held-out validation
    stream keeps its own fixed size (eval_step retraces per shape), so
    val_loss stays epoch-comparable across the rotation.  Same factory
    semantics as trainer.train: one fresh stream per epoch, closed."""
    cfg = Config(input_image_size=(64, 64, 3), batch_size=8, max_boxes=4,
                 rectified_coord_num=-1, is_augment=False,
                 compute_dtype="float32", ckpt_period=1000,
                 val_set_size=12,  # ceil(12/8) = 2 validation steps
                 multi_scale_sizes=((64, 64), (96, 96)))
    tr = YOLOv3Trainer(cfg, restore=False,
                       checkpoint_dir=tempfile.mkdtemp())
    batches = {hw: _iter(hw, 8, i) for i, hw in
               enumerate(cfg.multi_scale_sizes)}

    made = []

    def factory():
        it = _iter((64, 64), 8, seed=99)
        closed = []

        class Stream:
            def __iter__(self):
                return self

            def __next__(self):
                self.served = getattr(self, "served", 0) + 1
                return next(it)

            def close(self):
                closed.append(True)
                self.closed = True

        s = Stream()
        made.append(s)
        return s

    tr.train_multi_scale(batches, val_batches=factory, epochs=2,
                         steps_per_epoch=1)
    assert len(made) == 2, "fresh validation stream per epoch"
    assert [s.served for s in made] == [2, 2]
    assert all(getattr(s, "closed", False) for s in made)
    assert int(tr.state.step) == 2


def test_multi_scale_preemption_stop_and_aligned_resume():
    """request_stop() during train_multi_scale: checkpoint mid-epoch,
    return; resume runs only the interrupted epoch's remaining steps,
    at the SAME size slot (epoch index unchanged)."""
    cfg = Config(input_image_size=(64, 64, 3), batch_size=8, max_boxes=4,
                 rectified_coord_num=-1, is_augment=False,
                 compute_dtype="float32", ckpt_period=1000,
                 multi_scale_sizes=((64, 64), (96, 96)))
    ckdir = tempfile.mkdtemp()
    tr = YOLOv3Trainer(cfg, restore=False, checkpoint_dir=ckdir)

    def stopping_iter(hw, stop_at):
        src = _iter(hw, 8, 0)
        n = 0
        while True:
            n += 1
            if n == stop_at:
                tr.request_stop()
            yield next(src)

    batches = {hw: stopping_iter(hw, 2 if hw == (64, 64) else 10**9)
               for hw in cfg.multi_scale_sizes}
    tr.train_multi_scale(batches, epochs=4, steps_per_epoch=3)
    assert int(tr.state.step) == 2, "stop after the in-flight step"
    assert tr.ckpt.latest_step() == 2

    tr2 = YOLOv3Trainer(cfg, restore=True, checkpoint_dir=ckdir)
    assert int(tr2.state.step) == 2
    batches2 = {hw: _iter(hw, 8, i)
                for i, hw in enumerate(cfg.multi_scale_sizes)}
    tr2.train_multi_scale(batches2, epochs=1, steps_per_epoch=3)
    assert int(tr2.state.step) == 3, "only the remaining 1 step runs"
