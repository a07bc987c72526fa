"""Weight EMA (Config.ema_decay): shadow math vs a NumPy oracle of
tf.train.ExponentialMovingAverage(num_updates) semantics, inference-
surface selection, grad-accumulation gating (one shadow move per MACRO
update), checkpoint round-trip, and enable-on-existing-checkpoint
seeding."""
import tempfile

import jax
import jax.numpy as jnp
import numpy as np

from yolov3_tensorflow_tpu.config import Config
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
    return jnp.asarray(images), jnp.asarray(labels)


def _flat(tree):
    return [np.asarray(x) for x in jax.tree.leaves(tree)]


def test_ema_matches_numpy_oracle():
    """shadow_{t} = shadow_{t-1} - (1-d_t)(shadow_{t-1} - params_t) with
    d_t = min(decay, (1+t)/(10+t)) — tf.train.ExponentialMovingAverage
    with num_updates, applied after each optimizer update."""
    decay = 0.9
    tr = YOLOv3Trainer(_cfg(ema_decay=decay), restore=False,
                       checkpoint_dir=tempfile.mkdtemp())
    images, labels = _batch(8)
    shadow = _flat(tr.state.params)  # starts at init weights
    for t in range(1, 5):
        tr.state, _ = tr.train_step(tr.state, images, labels)
        d = min(decay, (1.0 + t) / (10.0 + t))
        live = _flat(tr.state.params)
        shadow = [s - (1.0 - d) * (s - p) for s, p in zip(shadow, live)]
        got = _flat(tr.state.ema_params)
        for s, g in zip(shadow, got):
            np.testing.assert_allclose(g, s, rtol=2e-5, atol=1e-6)
    # the shadow genuinely lags the live weights
    diffs = [np.abs(s - p).max()
             for s, p in zip(_flat(tr.state.ema_params),
                             _flat(tr.state.params))]
    assert max(diffs) > 0


def test_inference_surfaces_use_shadow():
    """forward/eval score the EMA weights: forward(state) must equal a
    direct apply with ema_params and differ from the live-params apply."""
    tr = YOLOv3Trainer(_cfg(ema_decay=0.5), restore=False,
                       checkpoint_dir=tempfile.mkdtemp())
    images, labels = _batch(8, seed=1)
    for _ in range(3):
        tr.state, _ = tr.train_step(tr.state, images, labels)
    heads = tr.forward(tr.state, images)
    norm = images.astype(jnp.float32)
    want = tr.model.apply(
        {"params": tr.state.ema_params,
         "batch_stats": tr.state.batch_stats}, norm, train=False)
    live = tr.model.apply(
        {"params": tr.state.params,
         "batch_stats": tr.state.batch_stats}, norm, train=False)
    # 1e-5 atol: jitted-sharded vs eager apply reassociation noise
    for h, w in zip(heads, want):
        np.testing.assert_allclose(np.asarray(h), np.asarray(w),
                                   rtol=1e-4, atol=1e-5)
    assert any(np.abs(np.asarray(h) - np.asarray(l)).max() > 1e-4
               for h, l in zip(heads, live))
    # host-side property agrees with the in-trace selection
    for a, b in zip(_flat(tr.infer_params), _flat(tr.state.ema_params)):
        np.testing.assert_array_equal(a, b)


def test_ema_moves_once_per_macro_update():
    """Under grad accumulation the shadow must move only on the micro
    step that applied an optimizer update, with t counting MACRO
    updates (decaying toward unchanged params on zero-update micro
    steps would compound the decay k-fold)."""
    decay = 0.9
    tr = YOLOv3Trainer(_cfg(ema_decay=decay, grad_accum_steps=2),
                       restore=False, checkpoint_dir=tempfile.mkdtemp())
    images, labels = _batch(8, seed=2)
    init = _flat(tr.state.params)

    # micro step 1: gradients accumulate, params and shadow unchanged
    tr.state, _ = tr.train_step(tr.state, images, labels)
    for a, b in zip(_flat(tr.state.ema_params), init):
        np.testing.assert_array_equal(a, b)
    for a, b in zip(_flat(tr.state.params), init):
        np.testing.assert_array_equal(a, b)

    # micro step 2: macro update t=1 applies; d = min(decay, 2/11)
    tr.state, _ = tr.train_step(tr.state, images, labels)
    d = min(decay, 2.0 / 11.0)
    live = _flat(tr.state.params)
    for g, s, p in zip(_flat(tr.state.ema_params), init, live):
        np.testing.assert_allclose(g, s - (1.0 - d) * (s - p),
                                   rtol=2e-5, atol=1e-6)


def test_ema_checkpoint_roundtrip_and_seeding():
    ckdir = tempfile.mkdtemp()
    cfg = _cfg(ema_decay=0.9)
    tr = YOLOv3Trainer(cfg, restore=False, checkpoint_dir=ckdir)
    images, labels = _batch(8)
    for _ in range(2):
        tr.state, _ = tr.train_step(tr.state, images, labels)
    tr.ckpt.save(int(tr.state.step), tr.state, force=True)

    # round-trip: the shadow is part of the checkpointed state
    tr2 = YOLOv3Trainer(cfg, restore=True, checkpoint_dir=ckdir)
    for a, b in zip(_flat(tr2.state.ema_params),
                    _flat(tr.state.ema_params)):
        np.testing.assert_array_equal(a, b)

    # EMA-less restore of an EMA checkpoint: live weights restore, the
    # shadow is carried but inference uses params (warned, not fatal)
    tr3 = YOLOv3Trainer(_cfg(), restore=True, checkpoint_dir=ckdir)
    assert int(tr3.state.step) == int(tr.state.step)
    for a, b in zip(_flat(tr3.infer_params), _flat(tr.state.params)):
        np.testing.assert_array_equal(a, b)


def test_enable_ema_on_existing_checkpoint():
    """Turning EMA on over a pre-EMA checkpoint seeds the shadow from
    the restored weights instead of failing the restore."""
    ckdir = tempfile.mkdtemp()
    tr = YOLOv3Trainer(_cfg(), restore=False, checkpoint_dir=ckdir)
    images, labels = _batch(8)
    tr.state, _ = tr.train_step(tr.state, images, labels)
    tr.ckpt.save(int(tr.state.step), tr.state, force=True)

    tr2 = YOLOv3Trainer(_cfg(ema_decay=0.9), restore=True,
                        checkpoint_dir=ckdir)
    assert int(tr2.state.step) == 1
    for a, b in zip(_flat(tr2.state.ema_params), _flat(tr.state.params)):
        np.testing.assert_array_equal(a, b)
