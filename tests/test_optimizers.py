"""RAdam vs a NumPy transcription of the reference math (utils/radam.py:56-96),
plus schedule semantics (configs.py:23-27)."""
import jax.numpy as jnp
import numpy as np

from yolov3_tensorflow_tpu.config import Config
from yolov3_tensorflow_tpu.train.optimizers import (make_optimizer,
                                                    scale_by_radam)
from yolov3_tensorflow_tpu.train.schedule import piecewise_epoch_schedule


def numpy_radam_steps(grads, lr, b1=0.9, b2=0.999, eps=1e-8, warmup=1.0):
    """Sequence of parameter deltas for a scalar param, reference math."""
    m = v = 0.0
    rho_inf = 2.0 / (1.0 - b2) - 1.0
    deltas = []
    for t, g in enumerate(grads, start=1):
        m = b1 * m + (1 - b1) * g
        v = b2 * v + (1 - b2) * g * g
        b1t, b2t = b1 ** t, b2 ** t
        rho_t = rho_inf - 2.0 * t * b2t / (1.0 - b2t)
        if rho_t >= 5.0:
            rect = np.sqrt((rho_t - 4) * (rho_t - 2) * rho_inf /
                           ((rho_inf - 4) * (rho_inf - 2) * rho_t))
            lr_t = rect * lr * np.sqrt(1 - b2t) / (1 - b1t)
            deltas.append(-lr_t * m / (np.sqrt(v) + eps))
        else:
            lr_t = warmup * lr / (1 - b1t)
            deltas.append(-lr_t * m)
    return deltas


def test_radam_matches_reference_math():
    tx = scale_by_radam(eps=1e-8)
    params = {"w": jnp.asarray(1.0)}
    state = tx.init(params)
    lr = 0.01
    rng = np.random.RandomState(0)
    grads_seq = rng.randn(12)
    got = []
    for g in grads_seq:
        upd, state = tx.update({"w": jnp.asarray(g, jnp.float32)}, state)
        got.append(-lr * float(upd["w"]))  # apply -lr scaling manually
    want = numpy_radam_steps(grads_seq, lr)
    # rho_t = rho_inf - 2t*b2^t/(1-b2^t) cancels two ~2e3 quantities; in
    # float32 (what BOTH our impl and the TF reference use) this costs ~0.5%
    # near the warmup->adaptive crossing vs this float64 oracle.
    np.testing.assert_allclose(got, want, rtol=2e-2)
    # first steps must hit the SGDM warmup branch (rho_t < 5 for small t)
    b2 = 0.999
    rho_inf = 2 / (1 - b2) - 1
    rho_1 = rho_inf - 2 * 1 * b2 / (1 - b2)
    assert rho_1 < 5.0


def numpy_keras_sgd_steps(grads, lrs, momentum=0.95, nesterov=True):
    """Parameter deltas for a scalar param under keras SGD.get_updates
    (the reference's sgdm, trainer.py:70-71): v = m*v - lr*g with lr
    folded into the velocity at each step."""
    m = 0.0
    deltas = []
    for g, lr in zip(grads, lrs):
        v = momentum * m - lr * g
        deltas.append(momentum * v - lr * g if nesterov else v)
        m = v
    return deltas


def test_sgdm_matches_keras_across_lr_boundary():
    """The velocity must carry each step's OWN lr: a schedule applied
    after the momentum trace would rescale the whole history at the
    10x lr jumps and diverge from keras exactly there."""
    import optax

    from yolov3_tensorflow_tpu.config import Config
    cfg = Config(optimizer="sgdm", grad_clip_norm=0.0)
    cfg = cfg.replace(step_epoch=(1, 3), step_lr=(1e-4, 1e-2, 1e-3))
    spe = 2
    tx, sched = make_optimizer(cfg, steps_per_epoch=spe)
    params = {"w": jnp.asarray(0.5)}
    st = tx.init(params)
    rng = np.random.RandomState(1)
    grads_seq = rng.randn(12)  # crosses both boundaries (epochs 0..5)
    got, lrs = [], []
    for step, g in enumerate(grads_seq):
        lrs.append(float(sched(step)))
        upd, st = tx.update({"w": jnp.asarray(g, jnp.float32)}, st, params)
        got.append(float(upd["w"]))
        params = optax.apply_updates(params, upd)
    assert len(set(lrs)) == 3, lrs  # the sweep really crossed boundaries
    want = numpy_keras_sgd_steps(grads_seq, lrs)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-8)


def test_schedule_matches_lr_func():
    cfg = Config()
    sched = piecewise_epoch_schedule(cfg.step_epoch, cfg.step_lr,
                                     steps_per_epoch=7)
    for epoch in [0, 1, 20, 21, 60, 61, 299, 300]:
        step = epoch * 7
        np.testing.assert_allclose(float(sched(step)),
                                   cfg.lr_func(epoch), rtol=1e-6,
                                   err_msg=f"epoch {epoch}")


def test_make_optimizer_variants():
    import optax
    cfg = Config()
    for name in ("sgdm", "adam", "radam"):
        tx, sched = make_optimizer(cfg.replace(optimizer=name),
                                   steps_per_epoch=7)
        params = {"w": jnp.ones((3,))}
        st = tx.init(params)
        upd, st = tx.update({"w": jnp.ones((3,))}, st, params)
        newp = optax.apply_updates(params, upd)
        assert np.all(np.isfinite(np.asarray(newp["w"])))
        # update must move against the gradient
        assert float(np.asarray(newp["w"]).sum()) < 3.0
