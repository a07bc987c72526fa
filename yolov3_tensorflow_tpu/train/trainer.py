"""Training engine (reference: yolov3/trainer.py:19-185).

TPU-native re-design: one jitted, mesh-sharded train step replaces
``keras.Model.fit`` + callbacks.  The step fuses on-device augmentation,
forward, loss (with functional breakdown), explicit L2 regularization,
gradient computation and the optimizer update into a single XLA program;
with a multi-device mesh the batch is sharded over the ``data`` axis and
XLA inserts the gradient all-reduce over ICI (the reference's
``multi_gpu_model`` equivalent, trainer.py:40-43).

Feature parity with the reference trainer:
  * checkpoint discovery + auto-resume on construction (trainer.py:47-67)
  * SGDM / Adam-amsgrad / RAdam selection (trainer.py:70-75)
  * epoch-piecewise LR schedule (LearningRateScheduler, trainer.py:94)
  * periodic checkpointing every ``ckpt_period`` epochs (trainer.py:90-91)
  * early stopping on train loss with min_delta/patience (trainer.py:92-93)
  * per-epoch detail-loss logging + TensorBoard (trainer.py:95-97)
  * ``predict`` (trainer.py:117-124) — returns the three raw head tensors
  * ``save_serving`` / ``save_mobile`` analogs live in infer/export.py
"""
from __future__ import annotations

import logging
import time
from functools import partial
from typing import Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..config import Config
from ..data.augment import augment_batch
from ..models.detector import build_detector
from ..models.layers import l2_regularization
from ..ops.loss import YOLOv3Loss
from ..parallel.mesh import batch_sharding, mesh_from_config, replicated
from .checkpoint import CheckpointManager
from .metrics import TensorBoardWriter, log_epoch
from .optimizers import make_optimizer
from .state import TrainState


class YOLOv3Trainer:

    def __init__(self, cfg: Config, mesh=None, restore: bool = True,
                 seed: int = 800, enable_tensorboard: bool = False,
                 checkpoint_dir: Optional[str] = None):
        self.cfg = cfg
        self.model = build_detector(cfg)
        self.loss_fn = YOLOv3Loss(cfg)
        self.tx, self.schedule = make_optimizer(cfg)
        self.mesh = mesh if mesh is not None else mesh_from_config(cfg)

        h, w, c = cfg.input_image_size
        rng = jax.random.PRNGKey(seed)
        init_rng, aug_rng = jax.random.split(rng)
        variables = self.model.init(
            init_rng, jnp.zeros((1, h, w, c), jnp.float32), train=False)
        params = variables["params"]
        batch_stats = variables.get("batch_stats", {})
        opt_state = self.tx.init(params)
        self.state = TrainState.create(params, batch_stats, opt_state,
                                       aug_rng)

        # checkpoint auto-resume (trainer.py:47-67)
        self.ckpt = CheckpointManager(
            checkpoint_dir or cfg.checkpoint_path,
            max_keep=cfg.ckpt_max_keep)
        if restore and self.ckpt.latest_step() is not None:
            restored = self.ckpt.restore(self.state)
            if restored is not None:
                self.state = restored
                logging.info("restored checkpoint at step %d",
                             int(self.state.step))

        self._build_steps()
        self.tb = TensorBoardWriter(cfg.tensorboard_dir) \
            if enable_tensorboard else None
        self.history = []

    # ------------------------------------------------------------------ #
    def _build_steps(self):
        cfg = self.cfg
        model, loss_fn, tx, schedule = (self.model, self.loss_fn, self.tx,
                                        self.schedule)

        def train_step(state: TrainState, images, labels):
            rng, new_rng = jax.random.split(state.rng)
            if cfg.is_augment:
                images = augment_batch(rng, images)

            def compute(params):
                heads, mut = model.apply(
                    {"params": params, "batch_stats": state.batch_stats},
                    images, train=True, mutable=["batch_stats"])
                total, breakdown, new_count = loss_fn(
                    heads, labels, state.image_count)
                kreg, greg = l2_regularization(params)
                full = total + kreg + greg
                return full, (mut["batch_stats"], breakdown, new_count,
                              kreg, greg)

            (loss_val, aux), grads = jax.value_and_grad(
                compute, has_aux=True)(state.params)
            new_bs, breakdown, new_count, kreg, greg = aux
            updates, new_opt = tx.update(grads, state.opt_state,
                                         state.params)
            new_params = optax.apply_updates(state.params, updates)
            new_state = state.replace(
                step=state.step + 1, params=new_params, batch_stats=new_bs,
                opt_state=new_opt, image_count=new_count, rng=new_rng)
            metrics = dict(breakdown)
            metrics["total_loss"] = loss_val
            metrics["kernel_reg"] = kreg
            metrics["gamma_reg"] = greg
            metrics["lr"] = schedule(state.step)
            return new_state, metrics

        def eval_step(state: TrainState, images, labels):
            heads = model.apply(
                {"params": state.params, "batch_stats": state.batch_stats},
                images, train=False)
            total, breakdown, _ = loss_fn(heads, labels, state.image_count)
            metrics = dict(breakdown)
            metrics["total_loss"] = total
            return metrics

        def forward(state: TrainState, images):
            return model.apply(
                {"params": state.params, "batch_stats": state.batch_stats},
                images, train=False)

        data_shard = batch_sharding(self.mesh, self.cfg.data_axis)
        repl = replicated(self.mesh)
        self.train_step = jax.jit(
            train_step,
            in_shardings=(repl, data_shard, data_shard),
            out_shardings=(repl, repl),
            donate_argnums=(0,))
        self.eval_step = jax.jit(
            eval_step, in_shardings=(repl, data_shard, data_shard),
            out_shardings=repl)
        self.forward = jax.jit(
            forward, in_shardings=(repl, data_shard), out_shardings=repl)

    # ------------------------------------------------------------------ #
    def train(self, train_batches: Iterator, val_batches=None,
              epochs: Optional[int] = None,
              steps_per_epoch: Optional[int] = None):
        """Epoch loop (reference trainer.py:99-115 / keras Model.fit)."""
        cfg = self.cfg
        epochs = epochs if epochs is not None else cfg.epoch
        spe = steps_per_epoch or cfg.steps_per_epoch
        best = float("inf")
        patience = 0
        start_epoch = int(self.state.step) // spe
        for epoch in range(start_epoch, epochs):
            t0 = time.time()
            acc = None
            n = 0
            for _ in range(spe):
                batch = next(train_batches)
                self.state, metrics = self.train_step(
                    self.state, jnp.asarray(batch.images),
                    jnp.asarray(batch.labels))
                acc = metrics if acc is None else jax.tree.map(
                    lambda a, b: a + b, acc, metrics)
                n += 1
            mean = jax.tree.map(lambda a: np.asarray(a) / n, acc)
            total = float(mean["total_loss"])
            lr = float(np.asarray(metrics["lr"]))
            log_epoch(epoch, lr, total, float(mean["kernel_reg"]),
                      float(mean["gamma_reg"]), mean, time.time() - t0)
            if self.tb is not None:
                self.tb.write_epoch(epoch, lr, total, mean,
                                    self.state.params)
            self.history.append(total)

            if val_batches is not None:
                vacc, vn = 0.0, 0
                for _ in range(cfg.validation_steps):
                    vb = next(val_batches)
                    vm = self.eval_step(self.state,
                                        jnp.asarray(vb.images),
                                        jnp.asarray(vb.labels))
                    vacc += float(vm["total_loss"])
                    vn += 1
                logging.info("  val_loss=%.5f", vacc / max(vn, 1))

            # periodic checkpoint (trainer.py:90-91)
            if (epoch + 1) % cfg.ckpt_period == 0:
                self.ckpt.save(int(self.state.step), self.state)

            # early stopping (trainer.py:92-93)
            if total < best - cfg.stop_min_delta:
                best = total
                patience = 0
            else:
                patience += 1
                if patience >= cfg.stop_patience:
                    logging.info("early stopping at epoch %d", epoch)
                    break
        self.ckpt.save(int(self.state.step), self.state, force=True)

    # ------------------------------------------------------------------ #
    def predict(self, images) -> tuple:
        """Raw 3-head outputs for a batch (trainer.py:117-124).  Batches not
        divisible by the mesh data axis are padded then sliced back."""
        images = jnp.asarray(images, jnp.float32)
        n = images.shape[0]
        d = self.mesh.shape[self.cfg.data_axis]
        pad = (-n) % d
        if pad:
            images = jnp.concatenate(
                [images, jnp.zeros((pad,) + images.shape[1:],
                                   images.dtype)], axis=0)
        heads = self.forward(self.state, images)
        if pad:
            heads = tuple(h[:n] for h in heads)
        return heads
