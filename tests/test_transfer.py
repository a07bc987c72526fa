"""Transfer-learning init (Config.init_from) + backbone freezing
(Config.freeze_backbone) — the Keras fine-tune workflow over the
reference's trainer checkpoints (load_weights by_name/skip_mismatch vs
yolov3/trainer.py:47-67)."""
import tempfile

import jax
import numpy as np
import pytest

from yolov3_tensorflow_tpu.config import Config
from yolov3_tensorflow_tpu.train.trainer import YOLOv3Trainer
from yolov3_tensorflow_tpu.train.transfer import load_pretrained


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


def _leaf_paths(tree, prefix=()):
    if isinstance(tree, dict):
        for k, v in tree.items():
            yield from _leaf_paths(v, prefix + (k,))
    else:
        yield prefix, tree


def test_init_from_grafts_backbone_skips_heads():
    """class_num 2 -> 5: every backbone leaf copies, the three head
    output convs (class-dependent channel count) keep their fresh init,
    and training starts at step 0 with fresh optimizer slots."""
    donor_dir = tempfile.mkdtemp()
    donor = YOLOv3Trainer(_cfg(class_num=2), restore=False,
                          checkpoint_dir=donor_dir)
    images, labels = _batch(8)
    for _ in range(2):
        donor.state, _ = donor.train_step(donor.state, images, labels)
    donor.ckpt.save(int(donor.state.step), donor.state, force=True)

    ft = YOLOv3Trainer(_cfg(class_num=5, init_from=donor_dir),
                       restore=False, checkpoint_dir=tempfile.mkdtemp())
    assert int(ft.state.step) == 0
    donor_params = dict(_leaf_paths(donor.state.params))
    copied = skipped = 0
    for path, leaf in _leaf_paths(ft.state.params):
        d = donor_params[path]
        if tuple(d.shape) == tuple(leaf.shape):
            np.testing.assert_array_equal(np.asarray(d), np.asarray(leaf))
            copied += 1
        else:
            skipped += 1
    assert copied > 20
    assert skipped == 6  # 3 head out convs x (kernel, bias)
    # BN moving statistics graft too (the donor trained 2 steps, so its
    # stats differ from a fresh init)
    donor_stats = dict(_leaf_paths(donor.state.batch_stats))
    for path, leaf in _leaf_paths(ft.state.batch_stats):
        np.testing.assert_array_equal(np.asarray(donor_stats[path]),
                                      np.asarray(leaf))


def test_init_from_prefers_donor_ema_shadow():
    """An EMA-trained donor serves its shadow, so fine-tuning grafts the
    shadow — not the live weights (prefer_ema=False opts out)."""
    donor_dir = tempfile.mkdtemp()
    donor = YOLOv3Trainer(_cfg(ema_decay=0.5), restore=False,
                          checkpoint_dir=donor_dir)
    images, labels = _batch(8, seed=4)
    for _ in range(3):
        donor.state, _ = donor.train_step(donor.state, images, labels)
    donor.ckpt.save(int(donor.state.step), donor.state, force=True)
    shadow = dict(_leaf_paths(jax.tree.map(np.asarray,
                                           donor.state.ema_params)))
    live = dict(_leaf_paths(jax.tree.map(np.asarray, donor.state.params)))

    ft = YOLOv3Trainer(_cfg(init_from=donor_dir), restore=False,
                       checkpoint_dir=tempfile.mkdtemp())
    for path, leaf in _leaf_paths(ft.state.params):
        np.testing.assert_array_equal(shadow[path], np.asarray(leaf))
    # the shadow genuinely differs from the live weights after 3 steps
    assert any(not np.array_equal(shadow[p], live[p]) for p in shadow)

    ft_live, rep = load_pretrained(
        YOLOv3Trainer(_cfg(), restore=False,
                      checkpoint_dir=tempfile.mkdtemp()).state,
        donor_dir, prefer_ema=False)
    assert not rep["used_ema"]
    for path, leaf in _leaf_paths(ft_live.params):
        np.testing.assert_array_equal(live[path], np.asarray(leaf))


def test_init_from_ignored_on_resume():
    """A run that resumes its own checkpoint must NOT re-graft the donor
    (that would silently roll trained weights back)."""
    donor_dir = tempfile.mkdtemp()
    donor = YOLOv3Trainer(_cfg(), restore=False, checkpoint_dir=donor_dir)
    donor.ckpt.save(0, donor.state, force=True)

    run_dir = tempfile.mkdtemp()
    tr = YOLOv3Trainer(_cfg(), restore=False, checkpoint_dir=run_dir)
    images, labels = _batch(8, seed=1)
    for _ in range(3):
        tr.state, _ = tr.train_step(tr.state, images, labels)
    tr.ckpt.save(int(tr.state.step), tr.state, force=True)

    resumed = YOLOv3Trainer(_cfg(init_from=donor_dir), restore=True,
                            checkpoint_dir=run_dir)
    assert int(resumed.state.step) == 3
    trained = dict(_leaf_paths(tr.state.params))
    for path, leaf in _leaf_paths(resumed.state.params):
        np.testing.assert_array_equal(np.asarray(trained[path]),
                                      np.asarray(leaf))


def test_init_from_errors():
    tr = YOLOv3Trainer(_cfg(), restore=False,
                       checkpoint_dir=tempfile.mkdtemp())
    with pytest.raises(FileNotFoundError):
        load_pretrained(tr.state, tempfile.mkdtemp())


def test_freeze_backbone_trains_heads_only():
    """With freeze_backbone the backbone params are bit-frozen across
    steps while head params move and backbone BN statistics still
    update (Keras-1 trainable=False semantics, config.py)."""
    cfg = _cfg(freeze_backbone=True)
    tr = YOLOv3Trainer(cfg, restore=False, checkpoint_dir=tempfile.mkdtemp())
    images, labels = _batch(8, seed=2)
    p0 = jax.tree.map(np.asarray, tr.state.params)
    bs0 = jax.tree.map(np.asarray, tr.state.batch_stats)
    losses = []
    for _ in range(4):
        tr.state, m = tr.train_step(tr.state, images, labels)
        losses.append(float(m["total_loss"]))
    head_moved = 0
    for path, leaf in _leaf_paths(tr.state.params):
        before = dict(_leaf_paths(p0))[path]
        if path[0] == "backbone":
            np.testing.assert_array_equal(before, np.asarray(leaf))
        elif not np.array_equal(before, np.asarray(leaf)):
            # some head-side BN scales get sub-f32-ulp updates in 4
            # steps (radam warmup lr) — require the convs to move, not
            # every last leaf
            head_moved += 1
    assert head_moved >= 6, head_moved
    # heads alone still descend the loss
    assert losses[-1] < losses[0]
    # backbone BN moving stats adapted to the data
    moved = any(
        not np.array_equal(dict(_leaf_paths(bs0))[path], np.asarray(leaf))
        for path, leaf in _leaf_paths(tr.state.batch_stats)
        if path[0] == "backbone")
    assert moved
