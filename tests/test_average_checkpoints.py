"""Checkpoint averaging tool: uniform weight mean over the last k saved
checkpoints, consumable by the trainer like any trained run (the
reference has no averaging; its ModelCheckpoint keeps weights-only
files, yolov3/trainer.py:90-91)."""
import tempfile

import jax
import numpy as np
import pytest

from yolov3_tensorflow_tpu.config import Config
from yolov3_tensorflow_tpu.tools.average_checkpoints import (
    average_checkpoints, main as avg_main)
from yolov3_tensorflow_tpu.train.trainer import YOLOv3Trainer


def _cfg(**kw):
    base = dict(input_image_size=(64, 64, 3), batch_size=8, max_boxes=4,
                rectified_coord_num=-1, is_augment=False,
                compute_dtype="float32")
    base.update(kw)
    return Config(**base)


def _batch(n, seed=0):
    rng = np.random.RandomState(seed)
    images = rng.rand(n, 64, 64, 3).astype(np.float32)
    labels = -np.ones((n, 4, 5), np.float32)
    labels[:, 0] = [0.5, 0.5, 0.3, 0.3, 0]
    return jax.numpy.asarray(images), jax.numpy.asarray(labels)


def _leaves(tree, prefix=()):
    if isinstance(tree, dict):
        for k, v in tree.items():
            yield from _leaves(v, prefix + (k,))
    else:
        yield prefix, tree


def test_average_is_uniform_mean_and_restorable():
    cfg = _cfg()
    ckdir = tempfile.mkdtemp()
    tr = YOLOv3Trainer(cfg, restore=False, checkpoint_dir=ckdir)
    images, labels = _batch(8)
    snapshots = []
    for _ in range(3):
        tr.state, _ = tr.train_step(tr.state, images, labels)
        tr.ckpt.save(int(tr.state.step), tr.state, force=True)
        snapshots.append(jax.tree.map(np.asarray, tr.state.params))

    out = tempfile.mkdtemp()
    used = average_checkpoints(ckdir, out, last=3)
    assert used == [1, 2, 3]

    # the averaged dir restores through the normal trainer path at the
    # newest step, with params == the uniform mean of the members
    avg = YOLOv3Trainer(cfg, restore=True, checkpoint_dir=out)
    assert int(avg.state.step) == 3
    expect = {p: (dict(_leaves(snapshots[0]))[p].astype(np.float64)
                  + dict(_leaves(snapshots[1]))[p]
                  + dict(_leaves(snapshots[2]))[p]) / 3.0
              for p, _ in _leaves(snapshots[0])}
    for path, leaf in _leaves(jax.tree.map(np.asarray, avg.state.params)):
        np.testing.assert_allclose(np.asarray(leaf), expect[path],
                                   rtol=1e-6, atol=1e-7)
    # optimizer slots/counters come from the newest member: one more
    # train step must run cleanly from the averaged state
    avg.state, m = avg.train_step(avg.state, images, labels)
    assert np.isfinite(float(m["total_loss"]))


def test_average_cli_and_errors(capsys):
    cfg = _cfg()
    ckdir = tempfile.mkdtemp()
    tr = YOLOv3Trainer(cfg, restore=False, checkpoint_dir=ckdir)
    images, labels = _batch(8, seed=1)
    for _ in range(2):
        tr.state, _ = tr.train_step(tr.state, images, labels)
        tr.ckpt.save(int(tr.state.step), tr.state, force=True)

    with pytest.raises(ValueError):  # single-member average is a no-op
        average_checkpoints(ckdir, tempfile.mkdtemp(), last=1)
    with pytest.raises(ValueError):  # step not kept on disk
        average_checkpoints(ckdir, tempfile.mkdtemp(), steps=[1, 99])
    with pytest.raises(FileNotFoundError):
        average_checkpoints(tempfile.mkdtemp(), tempfile.mkdtemp())
    with pytest.raises(ValueError, match="duplicates"):
        average_checkpoints(ckdir, tempfile.mkdtemp(), steps=[1, 1, 2])
    with pytest.raises(ValueError, match="inside the source"):
        average_checkpoints(ckdir, ckdir)  # would overwrite a member
    with pytest.raises(ValueError, match="inside the source"):
        average_checkpoints(ckdir, ckdir + "/sub")

    out = tempfile.mkdtemp()
    avg_main(["--checkpoint", ckdir, "--out", out, "--steps", "1,2"])
    assert "averaged 2 checkpoints" in capsys.readouterr().out
    restored = YOLOv3Trainer(cfg, restore=True, checkpoint_dir=out)
    assert int(restored.state.step) == 2


def test_average_mixed_ema_membership():
    """ema_decay enabled mid-project on the same checkpoint_dir: the
    member set straddles the transition.  The average must keep the
    newest member's EMA shadow (averaged over the members that have
    one) instead of raising or silently stripping it."""
    ckdir = tempfile.mkdtemp()
    images, labels = _batch(8, seed=2)

    tr = YOLOv3Trainer(_cfg(), restore=False, checkpoint_dir=ckdir)
    tr.state, _ = tr.train_step(tr.state, images, labels)
    tr.ckpt.save(int(tr.state.step), tr.state, force=True)  # no EMA

    tr2 = YOLOv3Trainer(_cfg(ema_decay=0.9), restore=True,
                        checkpoint_dir=ckdir)
    shadows = []
    for _ in range(2):
        tr2.state, _ = tr2.train_step(tr2.state, images, labels)
        tr2.ckpt.save(int(tr2.state.step), tr2.state, force=True)
        shadows.append(jax.tree.map(np.asarray, tr2.state.ema_params))

    out = tempfile.mkdtemp()
    assert average_checkpoints(ckdir, out, last=3) == [1, 2, 3]
    avg = YOLOv3Trainer(_cfg(ema_decay=0.9), restore=True,
                        checkpoint_dir=out)
    assert avg.state.ema_params is not None
    expect = {p: (dict(_leaves(shadows[0]))[p].astype(np.float64)
                  + dict(_leaves(shadows[1]))[p]) / 2.0
              for p, _ in _leaves(shadows[0])}
    for path, leaf in _leaves(jax.tree.map(np.asarray,
                                           avg.state.ema_params)):
        np.testing.assert_allclose(np.asarray(leaf), expect[path],
                                   rtol=1e-6, atol=1e-7)
