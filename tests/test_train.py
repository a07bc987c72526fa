"""Trainer integration: overfit descent, checkpoint resume equality,
1-device vs 8-device sharded-step equivalence, export round-trip."""
import tempfile

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from yolov3_tensorflow_tpu.config import Config
from yolov3_tensorflow_tpu.parallel.mesh import make_mesh
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


def test_overfit_descent_and_resume():
    cfg = _cfg()
    ckdir = tempfile.mkdtemp()
    tr = YOLOv3Trainer(cfg, restore=False, checkpoint_dir=ckdir)
    images, labels = _batch(8)
    losses = []
    for _ in range(6):
        tr.state, m = tr.train_step(tr.state, images, labels)
        losses.append(float(m["total_loss"]))
    assert losses[-1] < losses[0]
    tr.ckpt.save(int(tr.state.step), tr.state, force=True)

    tr2 = YOLOv3Trainer(cfg, restore=True, checkpoint_dir=ckdir)
    assert int(tr2.state.step) == int(tr.state.step)
    # resumed state must produce the identical next step
    s1, m1 = tr.train_step(tr.state, images, labels)
    s2, m2 = tr2.train_step(tr2.state, images, labels)
    np.testing.assert_allclose(float(m1["total_loss"]),
                               float(m2["total_loss"]), rtol=1e-6)


def test_device_count_loss_equivalence_sweep():
    """jit-SPMD semantics are device-count invariant: the same global batch
    must produce the same loss on 1/2/4/8-device meshes (the reference's
    multi_gpu_model averaged identically, trainer.py:40-43)."""
    cfg = _cfg()
    images, labels = _batch(8, seed=3)
    losses = {}
    for n in (1, 2, 4, 8):
        mesh = make_mesh(n)
        tr = YOLOv3Trainer(cfg, mesh=mesh, restore=False,
                           checkpoint_dir=tempfile.mkdtemp())
        _, m = tr.train_step(tr.state, images, labels)
        losses[n] = float(m["total_loss"])
    for n in (2, 4, 8):
        np.testing.assert_allclose(losses[1], losses[n], rtol=1e-5)


def test_training_is_deterministic():
    """Two trainers with identical seeds/config/data must produce
    bit-identical loss trajectories (reproducibility: the reference pins
    np/tf seeds, run.py:27-28; our RNG lives in the train state)."""
    cfg = _cfg(is_augment=True)
    images, labels = _batch(8)
    losses = []
    for _ in range(2):
        tr = YOLOv3Trainer(cfg, restore=False,
                           checkpoint_dir=tempfile.mkdtemp())
        st = tr.state
        run = []
        for _ in range(3):
            st, m = tr.train_step(st, images, labels)
            run.append(float(m["total_loss"]))
        losses.append(run)
        del tr, st
    assert losses[0] == losses[1]


def test_augmented_step_runs():
    cfg = _cfg(is_augment=True)
    tr = YOLOv3Trainer(cfg, restore=False,
                       checkpoint_dir=tempfile.mkdtemp())
    images, labels = _batch(8)
    rng_before = np.asarray(tr.state.rng)  # copy before donation
    st, m = tr.train_step(tr.state, images, labels)
    assert np.isfinite(float(m["total_loss"]))
    # augmentation rng must advance
    assert not np.array_equal(np.asarray(st.rng), rng_before)


def test_mixup_step_runs_and_descends():
    """Roadmap-item integration (README.md:131): a mixup train step must
    run with the widened (N, 2M, 5) label union and still descend."""
    cfg = _cfg(is_mixup=True, is_augment=True)
    tr = YOLOv3Trainer(cfg, restore=False,
                       checkpoint_dir=tempfile.mkdtemp())
    images, labels = _batch(8)
    losses = []
    for _ in range(4):
        tr.state, m = tr.train_step(tr.state, images, labels)
        losses.append(float(m["total_loss"]))
    assert all(np.isfinite(l) for l in losses)
    assert losses[-1] < losses[0]


def test_giou_step_runs_and_descends():
    """Roadmap-item integration (README.md:134): GIOU training descends
    and reports a zero wh slot."""
    cfg = _cfg(is_giou_loss=True)
    tr = YOLOv3Trainer(cfg, restore=False,
                       checkpoint_dir=tempfile.mkdtemp())
    images, labels = _batch(8)
    losses = []
    for _ in range(5):
        tr.state, m = tr.train_step(tr.state, images, labels)
        losses.append(float(m["total_loss"]))
    assert all(np.isfinite(l) for l in losses)
    assert losses[-1] < losses[0]
    assert float(np.asarray(m["coord_loss_wh"]).sum()) == 0.0


def test_gaussian_yolo_trains_and_predicts():
    """Roadmap-item integration (README.md:135): Gaussian YOLO widens
    the heads to 9+C channels per anchor; training must descend and the
    predict path (decoder certainty scaling + NMS) must run on the wider
    heads."""
    cfg = _cfg(is_gaussian_yolo=True, class_num=2)
    tr = YOLOv3Trainer(cfg, restore=False,
                       checkpoint_dir=tempfile.mkdtemp())
    images, labels = _batch(8)
    losses = []
    for _ in range(5):
        tr.state, m = tr.train_step(tr.state, images, labels)
        losses.append(float(m["total_loss"]))
    assert all(np.isfinite(l) for l in losses)
    assert losses[-1] < losses[0]
    heads = tr.predict(images[:2])
    assert heads[0].shape[-1] == cfg.head_channel_nums[0]
    from yolov3_tensorflow_tpu.ops.nms import BatchedNMS
    det = BatchedNMS(cfg)(heads)
    assert det.shape[0] == 2 and np.all(np.isfinite(np.asarray(det)))


def test_ghm_step_runs_and_descends():
    """Roadmap-item integration (README.md:133): a GHM-C train step must
    run and descend."""
    cfg = _cfg(is_gradient_harmonized=True)
    tr = YOLOv3Trainer(cfg, restore=False,
                       checkpoint_dir=tempfile.mkdtemp())
    images, labels = _batch(8)
    losses = []
    for _ in range(5):
        tr.state, m = tr.train_step(tr.state, images, labels)
        losses.append(float(m["total_loss"]))
    assert all(np.isfinite(l) for l in losses)
    assert losses[-1] < losses[0]


def test_lr_schedule_follows_actual_steps_per_epoch():
    """train(steps_per_epoch=N) must re-derive the LR schedule so the
    piecewise boundaries fire at the right real epochs (reference: the
    LearningRateScheduler fires per actual epoch, trainer.py:94;
    configs.py:23-27), not at the config-default step/epoch mapping."""
    from yolov3_tensorflow_tpu.data.loader import Batch
    cfg = _cfg(step_epoch=(1, 3), step_lr=(1e-3, 1e-5))
    assert cfg.steps_per_epoch == 3  # ceil(20/8): the default divisor
    tr = YOLOv3Trainer(cfg, restore=False,
                       checkpoint_dir=tempfile.mkdtemp())
    images, labels = _batch(8)

    def batches():
        while True:
            yield Batch(np.asarray(images), np.asarray(labels))

    custom_spe = 2
    tr.train(batches(), epochs=3, steps_per_epoch=custom_spe)
    assert tr._schedule_spe == custom_spe
    # epoch = step // 2; lr_func: epochs 0..1 -> 1e-3, epochs 2+ -> 1e-5
    for step, expect in ((0, 1e-3), (3, 1e-3), (4, 1e-5), (9, 1e-5)):
        np.testing.assert_allclose(float(tr.schedule(step)), expect,
                                   rtol=1e-6, err_msg=f"step {step}")
    # the rebuilt optimizer kept the live opt_state: training continued
    assert int(tr.state.step) == 3 * custom_spe
    assert np.isfinite(tr.history).all()


def test_export_roundtrip_fp32():
    from yolov3_tensorflow_tpu.infer.export import (load_serving,
                                                    save_serving)
    cfg = _cfg()
    tr = YOLOv3Trainer(cfg, restore=False,
                       checkpoint_dir=tempfile.mkdtemp())
    with tempfile.TemporaryDirectory() as d:
        save_serving(tr, d)
        fn, sig = load_serving(d)
        assert sig["outputs"] == list(cfg.head_names)
        x = np.random.RandomState(0).rand(1, 64, 64, 3).astype(np.float32)
        out = fn(x)
        ref = tr.predict(x)
        for a, b in zip(out, ref):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-4)


def test_serving_model_consumer():
    """ServingModel must duck-type trainer.predict from the artifact
    alone: uint8 input normalized host-side exactly like the trainer
    (1/255), any request size chunked/zero-padded to the export's fixed
    batch dim and sliced back (the serving-client analog of the
    reference's external TF-Serving deployment, trainer.py:165-185)."""
    from yolov3_tensorflow_tpu.infer.export import ServingModel, save_serving
    cfg = _cfg()
    tr = YOLOv3Trainer(cfg, restore=False,
                       checkpoint_dir=tempfile.mkdtemp())
    rng = np.random.RandomState(7)
    images = rng.randint(0, 256, (5, 64, 64, 3), dtype=np.uint8)
    with tempfile.TemporaryDirectory() as d:
        save_serving(tr, d, batch_size=2)
        sm = ServingModel(d)
        assert sm.batch_size == 2
        assert sm.input_hw == (64, 64)
        assert sm.head_names == tuple(cfg.head_names)
        out = sm.predict(images)  # 5 = 2 full chunks + ragged tail of 1
    ref = tr.predict(images)
    assert len(out) == len(ref)
    for a, b in zip(out, ref):
        assert a.shape == np.asarray(b).shape
        np.testing.assert_allclose(a, np.asarray(b), atol=1e-4)


def test_model_structure_after_other_trainer_mesh():
    """The AOT .lower surface must re-register ITS trainer's op mesh:
    building trainer B (8-device) after A (1-device) used to leave B's
    mesh registered, so A._model_structure() traced A's Pallas ops
    shard_mapped over B's mesh (mesh mismatch / wrong HLO artifact)."""
    a = YOLOv3Trainer(_cfg(num_devices=1), restore=False,
                      checkpoint_dir=tempfile.mkdtemp())
    b = YOLOv3Trainer(_cfg(num_devices=8), restore=False,
                      checkpoint_dir=tempfile.mkdtemp())
    assert b.mesh.shape["data"] == 8
    hlo, summary = a._model_structure()  # must not raise / mis-trace
    assert "TOTAL parameters" in summary
    assert len(hlo) > 1000


def test_compiler_options_plumbing(monkeypatch):
    """cfg.compiler_options must reach every jitted step as jax.jit's
    compiler_options dict; auto (None) applies nothing on CPU (TPU flag
    names are unknown to the CPU compiler); () is explicitly none."""
    captured = []
    orig = jax.jit

    def spy(fn, **kw):
        captured.append(kw.pop("compiler_options", None))
        return orig(fn, **kw)

    import yolov3_tensorflow_tpu.train.trainer as trainer_mod
    monkeypatch.setattr(trainer_mod.jax, "jit", spy)
    YOLOv3Trainer(_cfg(compiler_options=(("xla_foo_flag", 32768),
                                         ("xla_bar_flag", True))),
                  restore=False, checkpoint_dir=tempfile.mkdtemp())
    assert captured and all(
        c == {"xla_foo_flag": 32768, "xla_bar_flag": True}
        for c in captured)
    captured.clear()
    for copts in (None, ()):  # auto on CPU == explicitly none
        YOLOv3Trainer(_cfg(compiler_options=copts), restore=False,
                      checkpoint_dir=tempfile.mkdtemp())
        assert captured and all(c is None for c in captured)
        captured.clear()


def test_validation_factory_fresh_stream_each_epoch():
    """keras Model.fit re-evaluates the SAME validation set every epoch
    (validation_data is reset per epoch); the trainer therefore accepts
    val_batches as a zero-arg FACTORY and opens a fresh stream per epoch,
    so every epoch scores the identical window even when batch_size does
    not divide the set (a persistent repeat=True iterator would drift by
    batch*ceil(size/batch) - size images per epoch).  A plain iterator
    stays accepted for callers that manage alignment themselves."""
    from yolov3_tensorflow_tpu.data.loader import Batch
    cfg = _cfg(val_set_size=12)  # ceil(12/8) = 2 validation steps
    assert cfg.validation_steps == 2
    tr = YOLOv3Trainer(cfg, restore=False,
                       checkpoint_dir=tempfile.mkdtemp())
    images, labels = _batch(8)

    class Stream:
        def __init__(self):
            self.served = 0
            self.closed = False

        def __iter__(self):
            return self

        def __next__(self):
            self.served += 1
            return Batch(np.asarray(images), np.asarray(labels))

        def close(self):
            self.closed = True

    made = []

    def factory():
        made.append(Stream())
        return made[-1]

    def batches():
        while True:
            yield Batch(np.asarray(images), np.asarray(labels))

    tr.train(batches(), val_batches=factory, epochs=2, steps_per_epoch=1)
    assert len(made) == 2, "factory must be invoked once per epoch"
    assert [s.served for s in made] == [2, 2]
    assert all(s.closed for s in made), "per-epoch streams must be closed"

    # legacy plain-iterator: consumed in place, never closed by the loop
    legacy = Stream()
    tr.train(batches(), val_batches=legacy, epochs=3, steps_per_epoch=1)
    assert legacy.served == 2 and not legacy.closed


def test_stop_monitor_val_loss():
    """cfg.stop_monitor='val_loss' early-stops on the held-out metric
    (the keras EarlyStopping default; the reference pins 'loss'),
    fails fast when no validation set is wired, and rejects unknown
    monitor names."""
    from yolov3_tensorflow_tpu.data.loader import Batch
    images, labels = _batch(8)

    def batches():
        while True:
            yield Batch(np.asarray(images), np.asarray(labels))

    def val_factory():
        return iter([Batch(np.asarray(images), np.asarray(labels))] * 2)

    # no validation set -> fail fast, not a 500-patience silent no-op
    cfg = _cfg(val_set_size=12, stop_monitor="val_loss")
    tr = YOLOv3Trainer(cfg, restore=False,
                       checkpoint_dir=tempfile.mkdtemp())
    with pytest.raises(ValueError, match="val_loss"):
        tr.train(batches(), epochs=1, steps_per_epoch=1)
    with pytest.raises(ValueError, match="stop_monitor"):
        YOLOv3Trainer(_cfg(stop_monitor="bogus"), restore=False,
                      checkpoint_dir=tempfile.mkdtemp()).train(
            batches(), epochs=1, steps_per_epoch=1)

    # impossible min_delta: every epoch is "no improvement" on val_loss,
    # so patience=1 stops after the second epoch despite epochs=6
    cfg = _cfg(val_set_size=12, stop_monitor="val_loss",
               stop_patience=1, stop_min_delta=1e9)
    tr = YOLOv3Trainer(cfg, restore=False,
                       checkpoint_dir=tempfile.mkdtemp())
    tr.train(batches(), val_batches=val_factory, epochs=6,
             steps_per_epoch=1)
    assert int(tr.state.step) == 2, "early stop on val_loss at patience=1"


def test_grad_accum_updates_params_every_k_steps():
    """grad_accum_steps=2 (optax.MultiSteps): micro steps only accumulate
    — params move on every SECOND train_step — and the update equals a
    k=1 step when both micro-batches carry the same gradient.  The
    MultiSteps state must survive a checkpoint round-trip."""
    images, labels = _batch(8)
    ck2 = tempfile.mkdtemp()
    tr2 = YOLOv3Trainer(_cfg(grad_accum_steps=2), restore=False,
                        checkpoint_dir=ck2)
    tr1 = YOLOv3Trainer(_cfg(), restore=False,
                        checkpoint_dir=tempfile.mkdtemp())
    # same seed -> identical init params
    p0 = jax.tree.map(np.asarray, tr1.state.params)

    tr2.state, m = tr2.train_step(tr2.state, images, labels)
    mid = jax.tree.map(np.asarray, tr2.state.params)
    same = jax.tree.map(np.array_equal, p0, mid)
    assert all(jax.tree.leaves(same)), "first micro step must not update"

    tr2.state, _ = tr2.train_step(tr2.state, images, labels)
    tr1.state, _ = tr1.train_step(tr1.state, images, labels)
    pk = jax.tree.map(np.asarray, tr2.state.params)
    p1 = jax.tree.map(np.asarray, tr1.state.params)
    # both micro grads are identical (same data; BN stats drift does
    # perturb the second micro gradient slightly, hence the tolerance)
    close = jax.tree.map(
        lambda a, b: np.allclose(a, b, rtol=1e-3, atol=1e-5), pk, p1)
    assert all(jax.tree.leaves(close)), "macro update != k=1 update"

    # full-state resume: identical next step
    tr2.ckpt.save(int(tr2.state.step), tr2.state, force=True)
    tr2b = YOLOv3Trainer(_cfg(grad_accum_steps=2), restore=True,
                         checkpoint_dir=ck2)
    _, ma = tr2.train_step(tr2.state, images, labels)
    _, mb = tr2b.train_step(tr2b.state, images, labels)
    np.testing.assert_allclose(float(ma["total_loss"]),
                               float(mb["total_loss"]), rtol=1e-6)


def test_preemption_sigterm_checkpoints_and_resumes_aligned():
    """SIGTERM during train(): the loop finishes the in-flight step,
    checkpoints the FULL train state mid-epoch, and returns; a rerun
    resumes and the interrupted epoch runs only its REMAINING steps so
    step/epoch (and LR boundary) alignment is exact.  The previous
    SIGTERM handler is restored afterwards."""
    import os
    import signal as _signal

    from yolov3_tensorflow_tpu.data.loader import Batch
    cfg = _cfg()
    ckdir = tempfile.mkdtemp()
    tr = YOLOv3Trainer(cfg, restore=False, checkpoint_dir=ckdir)
    images, labels = _batch(8)
    prev_handler = _signal.getsignal(_signal.SIGTERM)

    def batches(kill_at):
        n = 0
        while True:
            n += 1
            if n == kill_at:
                os.kill(os.getpid(), _signal.SIGTERM)
            yield Batch(np.asarray(images), np.asarray(labels))

    tr.train(batches(kill_at=3), epochs=2, steps_per_epoch=5)
    assert int(tr.state.step) == 3, "finish the in-flight step, then stop"
    assert tr.ckpt.latest_step() == 3, "mid-epoch preemption checkpoint"
    assert _signal.getsignal(_signal.SIGTERM) is prev_handler

    tr2 = YOLOv3Trainer(cfg, restore=True, checkpoint_dir=ckdir)
    assert int(tr2.state.step) == 3
    tr2.train(batches(kill_at=10**9), epochs=1, steps_per_epoch=5)
    assert int(tr2.state.step) == 5, \
        "resumed epoch must run only its remaining 2 steps"


def test_exhausted_validation_iterator_fails_fast():
    """A plain (non-factory) validation iterator that exhausts mid-run
    must raise, not score val_loss=0.0 (which would silently become the
    stop_monitor's best)."""
    from yolov3_tensorflow_tpu.data.loader import Batch
    images, labels = _batch(8)

    def batches():
        while True:
            yield Batch(np.asarray(images), np.asarray(labels))

    cfg = _cfg(val_set_size=8)  # 1 validation step/epoch
    tr = YOLOv3Trainer(cfg, restore=False,
                       checkpoint_dir=tempfile.mkdtemp())
    one_epoch_only = iter([Batch(np.asarray(images), np.asarray(labels))])
    with pytest.raises(ValueError, match="yielded no batches"):
        tr.train(batches(), val_batches=one_epoch_only, epochs=2,
                 steps_per_epoch=1)


def test_epoch_callback_invoked_per_epoch():
    """trainer.train(epoch_callback=...) fires after each epoch's
    validation/TB write with the epoch index (the keras custom-callback
    analog the CLI's --val_map_every builds on)."""
    from yolov3_tensorflow_tpu.data.loader import Batch
    images, labels = _batch(8)

    def batches():
        while True:
            yield Batch(np.asarray(images), np.asarray(labels))

    tr = YOLOv3Trainer(_cfg(), restore=False,
                       checkpoint_dir=tempfile.mkdtemp())
    seen = []
    tr.train(batches(), epochs=3, steps_per_epoch=1,
             epoch_callback=seen.append)
    assert seen == [0, 1, 2]


def test_stop_monitor_val_map():
    """stop_monitor='val_map': the epoch_callback's return (held-out
    mAP) is MAXIMIZED; None returns (off-cadence --val_map_every
    epochs) count toward neither best nor patience; absent callback
    fails fast."""
    from yolov3_tensorflow_tpu.data.loader import Batch
    images, labels = _batch(8)

    def batches():
        while True:
            yield Batch(np.asarray(images), np.asarray(labels))

    cfg = _cfg(stop_monitor="val_map", stop_patience=2,
               stop_min_delta=1e-4)
    tr = YOLOv3Trainer(cfg, restore=False,
                       checkpoint_dir=tempfile.mkdtemp())
    with pytest.raises(ValueError, match="val_map"):
        tr.train(batches(), epochs=1, steps_per_epoch=1)

    # mAP rises once then plateaus; None every other epoch must not
    # consume patience.  Sequence (by epoch): 0.5, None, 0.8, None,
    # 0.8, None, 0.8 -> best set at epoch 2, the evaluated epochs 4 and
    # 6 are non-improvements -> patience 2 trips at epoch 6.  With
    # patience counted per-epoch (the bug this pins against) the None
    # epochs 3 and 5 would trip it at epoch 5 instead.
    maps = {0: 0.5, 2: 0.8, 4: 0.8, 6: 0.8, 8: 0.8}
    seen = []

    def cb(epoch):
        seen.append(epoch)
        return maps.get(epoch)

    tr2 = YOLOv3Trainer(cfg, restore=False,
                        checkpoint_dir=tempfile.mkdtemp())
    tr2.train(batches(), epochs=50, steps_per_epoch=1,
              epoch_callback=cb)
    assert seen[-1] == 6, seen  # 2nd evaluated non-improvement
