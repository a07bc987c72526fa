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
import signal
import time
from contextlib import contextmanager
from typing import Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..config import Config
from ..data.augment import augment_batch, augment_batch_fused, mixup_batch
from ..models.detector import build_detector
from ..models.layers import l2_regularization
from ..ops.loss import YOLOv3Loss
from ..parallel.mesh import (batch_sharding, image_sharding,
                             mesh_from_config, replicated)
from .checkpoint import CheckpointManager
from .metrics import TensorBoardWriter, log_epoch
from .optimizers import make_optimizer
from .state import TrainState


def _infer_params(cfg, state):
    """Weights every inference surface scores: the EMA shadow when
    ``cfg.ema_decay`` is on (standard EMA-eval practice — the averaged
    weights generalize better late in training), else the live weights.
    Works both host-side and under trace (the choice is static: config
    plus pytree structure)."""
    if cfg.ema_decay and state.ema_params is not None:
        return state.ema_params
    return state.params


def _normalize_images(images):
    """uint8 batches are normalized on-device (1/255, like the
    reference's convert_image_dtype, file_util.py:58).  Single source
    of truth — the train/eval/forward steps AND the quantized
    calibration/inference programs must normalize identically."""
    if jnp.issubdtype(images.dtype, jnp.integer):
        return images.astype(jnp.float32) * (1.0 / 255.0)
    return images.astype(jnp.float32)


class YOLOv3Trainer:

    def __init__(self, cfg: Config, mesh=None, restore: bool = True,
                 seed: int = 800, enable_tensorboard: bool = False,
                 checkpoint_dir: Optional[str] = None):
        if cfg.spatial_partition > 1:
            # spatial partitioning rides XLA GSPMD; the custom Pallas
            # calls partition over the data axis only, so "auto"
            # resolves to the XLA paths and explicit kernel backends
            # are rejected rather than silently replicated
            assert cfg.stem_backend != "fused" and \
                cfg.conv_backend != "winograd" and \
                cfg.augment_backend != "fused", (
                    "spatial_partition > 1 requires the XLA conv/stem/"
                    "augment paths (custom kernels partition over data "
                    "only)")
            assert cfg.input_image_size[0] % (8 * cfg.spatial_partition) \
                == 0, "H must divide 8 * spatial_partition"
            cfg = cfg.replace(stem_backend="xla", conv_backend="xla",
                              augment_backend="xla")
        self.cfg = cfg
        self.model = build_detector(cfg)
        self.loss_fn = YOLOv3Loss(cfg)
        self.tx, self.schedule = make_optimizer(cfg)
        self._schedule_spe = cfg.steps_per_epoch
        self.mesh = mesh if mesh is not None else mesh_from_config(cfg)
        # register the mesh with the custom Pallas ops so their
        # pallas_calls partition over the data axis (shard_map) instead
        # of replicating — the reference's DP covers its whole model
        # (yolov3/trainer.py:40-43); ours must cover the kernels too
        from ..ops.partition import set_op_mesh
        if self.mesh.shape[cfg.model_axis] > 1:
            set_op_mesh(None)  # spatial mode: XLA paths only (above)
        else:
            set_op_mesh(self.mesh, cfg.data_axis)

        h, w, c = cfg.input_image_size
        init_rng = jax.random.PRNGKey(seed)
        # augmentation uses the rbg PRNG (2x faster than threefry on TPU for
        # full-image noise fields); stored as raw key data so checkpoints
        # stay plain uint32 arrays
        aug_rng = jax.random.key_data(jax.random.key(seed + 1, impl="rbg"))
        variables = self.model.init(
            init_rng, jnp.zeros((1, h, w, c), jnp.float32), train=False)
        params = variables["params"]
        batch_stats = variables.get("batch_stats", {})
        opt_state = self.tx.init(params)
        # EMA shadow starts at the init weights (tf.train.
        # ExponentialMovingAverage.apply semantics); the num_updates-
        # dynamic decay makes the first steps track the live weights
        # closely regardless of the init value.  jnp.copy, NOT an alias:
        # train_step donates the state, and donating the same buffer
        # twice (params + shadow) is an XLA execution error
        ema = jax.tree.map(jnp.copy, params) if cfg.ema_decay else None
        self.state = TrainState.create(params, batch_stats, opt_state,
                                       aug_rng, ema_params=ema)

        # checkpoint auto-resume (trainer.py:47-67)
        self.ckpt = CheckpointManager(
            checkpoint_dir or cfg.checkpoint_path,
            max_keep=cfg.ckpt_max_keep)
        if restore and self.ckpt.latest_step() is not None:
            try:
                restored = self.ckpt.restore(self.state)
            except Exception as e:
                restored = None
                if cfg.ema_decay:
                    # enabling EMA mid-project: the checkpoint predates
                    # the shadow subtree — restore without it and seed
                    # the shadow from the restored weights
                    try:
                        restored = self.ckpt.restore(
                            self.state.replace(ema_params=None))
                        restored = restored.replace(
                            ema_params=jax.tree.map(jnp.copy,
                                                    restored.params))
                        logging.info(
                            "checkpoint has no EMA shadow; seeded it "
                            "from the restored weights")
                    except Exception:
                        restored = None
                else:
                    # the symmetric case: an EMA-trained checkpoint
                    # restored by an EMA-less config (offline tools,
                    # test/predict without --ema_decay).  Carry the
                    # shadow (frozen) but serve the LIVE weights —
                    # pass --ema_decay to score/export the shadow.
                    try:
                        restored = self.ckpt.restore(
                            self.state.replace(ema_params=params))
                        logging.warning(
                            "checkpoint carries an EMA shadow but "
                            "ema_decay=0: inference uses the live "
                            "weights; set ema_decay to use the shadow")
                    except Exception:
                        restored = None
                if restored is None:
                    raise RuntimeError(
                        f"checkpoint at {self.ckpt.directory} is "
                        f"incompatible with the current model/optimizer "
                        f"configuration ({type(e).__name__}); delete it "
                        f"or point checkpoint_dir elsewhere to start "
                        f"fresh") from e
            if restored is not None:
                self.state = restored
                logging.info("restored checkpoint at step %d",
                             int(self.state.step))
            if cfg.init_from:
                logging.info(
                    "init_from ignored: run already has a checkpoint at "
                    "%s (resumed step %d)", self.ckpt.directory,
                    int(self.state.step))
        elif cfg.init_from:
            # transfer-learning init (Keras load_weights by_name +
            # skip_mismatch over the reference's trainer checkpoints,
            # yolov3/trainer.py:47-67): graft matching donor leaves into
            # the fresh init; class-dependent heads keep their fresh init
            from .transfer import load_pretrained
            self.state, _ = load_pretrained(self.state, cfg.init_from)

        self._build_steps()
        self.tb = TensorBoardWriter(cfg.tensorboard_dir) \
            if enable_tensorboard else None
        self.history = []
        self._quant = None       # lazily-built PTQ programs (_quant_setup)
        self._quant_vars = None  # calibrated "quant" collection
        self._stop_requested = False

    # ------------------------------------------------------------------ #
    def steps_for_size(self, input_hw):
        """Jitted (train_step, eval_step, forward) for a given input size.

        Multi-scale input training (a reference TODO, README.md:130): the
        convolutional model is size-agnostic, but the loss closes over the
        per-size head grids, so each size gets its own compiled step (cached
        here; XLA compiles each once)."""
        key = (int(input_hw[0]), int(input_hw[1]))
        if key not in self._size_steps:
            size_cfg = self.cfg.replace(
                input_image_size=(key[0], key[1],
                                  self.cfg.input_image_size[2]))
            self._size_steps[key] = self._compile_steps(
                size_cfg, YOLOv3Loss(size_cfg))
        return self._size_steps[key]

    def _build_steps(self):
        self._size_steps = {}
        base_hw = self.cfg.input_image_size[:2]
        self._size_steps[(base_hw[0], base_hw[1])] = self._compile_steps(
            self.cfg, self.loss_fn)
        self.train_step, self.eval_step, self.forward = \
            self._size_steps[(base_hw[0], base_hw[1])]

    def _ensure_schedule(self, steps_per_epoch: int):
        """Re-derive the LR schedule when training uses a steps_per_epoch
        different from the config default the optimizer was built with.

        The epoch-piecewise schedule maps step -> epoch via
        ``step // steps_per_epoch`` (reference: LearningRateScheduler fires
        per real epoch, trainer.py:94); a mismatched divisor silently fires
        the LR boundaries at the wrong epochs.  The optimizer state
        structure is schedule-independent, so the live opt_state remains
        valid across the rebuild — only the jitted steps are recompiled."""
        if steps_per_epoch == self._schedule_spe:
            return
        logging.info(
            "LR schedule rebuilt for steps_per_epoch=%d (config default %d)",
            steps_per_epoch, self._schedule_spe)
        self.tx, self.schedule = make_optimizer(self.cfg, steps_per_epoch)
        self._schedule_spe = steps_per_epoch
        self._build_steps()

    def _compile_steps(self, cfg, loss_fn):
        model, tx, schedule = self.model, self.tx, self.schedule
        normalize = _normalize_images

        def _use_fused_augment(images) -> bool:
            """Static (trace-time) noise-backend choice; mirrors the
            conv/stem `auto` convention — fused only where it wins
            (TPU) and is applicable (uint8 batch, packed lanes)."""
            from ..ops import augment_noise
            if cfg.augment_backend == "xla" or not cfg.is_augment:
                return False
            ok = (images.dtype == jnp.uint8
                  and augment_noise.supported(images.shape))
            if cfg.augment_backend == "fused":
                assert ok, (images.dtype, images.shape)
                return True
            # auto: xla — MEASURED end-to-end on TPU (b128, round 3):
            # fused 1,769 vs xla 1,901 img/s.  The counter-hash PRNG +
            # inverse-CDF math costs ~6 ms of VPU time per step, far
            # more than the ~1.1 ms of threefry+noise XLA passes it
            # removes.  Per-shape-winner rule: the kernel stays correct,
            # tested, partitioned, and opt-in (PERF.md round-4 item 2).
            return False

        def train_step(state: TrainState, images, labels):
            key = jax.random.wrap_key_data(state.rng, impl="rbg")
            if cfg.is_mixup:
                # 3-way split only when mixup is on so the established
                # augmentation stream is byte-identical with it off
                rng, mix_rng, new_key = jax.random.split(key, 3)
            else:
                rng, new_key = jax.random.split(key)
            new_rng = jax.random.key_data(new_key)
            if cfg.is_augment and _use_fused_augment(images):
                # one Pallas pass: u8 read -> normalize + noise -> bf16
                # (ops/augment_noise.py); color stays in XLA below
                images = augment_batch_fused(
                    rng, images, jnp.dtype(cfg.compute_dtype))
            elif cfg.is_augment:
                # augment in the compute dtype: the chain is ~5 passes over
                # the full-res batch and purely photometric on 8-bit image
                # content — bf16 halves its HBM traffic (stats stay fp32)
                images = augment_batch(
                    rng,
                    normalize(images).astype(jnp.dtype(cfg.compute_dtype)))
            else:
                images = normalize(images)

            box_weights = None
            if cfg.is_mixup:
                # roadmap item README.md:131 — blend AFTER photometric
                # augmentation (pixel-level mixup of the augmented pair);
                # labels widen to the static (N, 2*max_boxes, 5) union
                images, labels, box_weights = mixup_batch(
                    mix_rng, images, labels.astype(jnp.float32),
                    cfg.mixup_alpha)

            def compute(params):
                heads, mut = model.apply(
                    {"params": params, "batch_stats": state.batch_stats},
                    images, train=True, mutable=["batch_stats"])
                total, breakdown, new_count = loss_fn(
                    heads, labels, state.image_count,
                    box_weights=box_weights)
                kreg, greg = l2_regularization(params)
                full = total + kreg + greg
                return full, (mut["batch_stats"], breakdown, new_count,
                              kreg, greg)

            (loss_val, aux), grads = jax.value_and_grad(
                compute, has_aux=True)(state.params)
            new_bs, breakdown, new_count, kreg, greg = aux
            if cfg.freeze_backbone:
                # fine-tune mode: only the heads train.  Zeroed gradients
                # keep every momentum/Adam slot at exactly zero, so the
                # frozen subtree never moves; BN moving statistics (in
                # new_bs, not params) still adapt to the new data —
                # Keras-1 trainable=False semantics (config.py docstring)
                grads = {**grads, "backbone": jax.tree.map(
                    jnp.zeros_like, grads["backbone"])}
            updates, new_opt = tx.update(grads, state.opt_state,
                                         state.params)
            new_params = optax.apply_updates(state.params, updates)
            new_ema = state.ema_params
            if cfg.ema_decay:
                # tf.train.ExponentialMovingAverage with num_updates:
                # d = min(decay, (1+t)/(10+t)), shadow -= (1-d)(shadow-p).
                # t counts OPTIMIZER updates; under grad accumulation the
                # shadow moves only on the micro step that applied one
                # (zero-update micro steps leave params unchanged, and
                # decaying toward an unchanged value would compound the
                # decay k-fold per macro step).
                if max(1, int(cfg.grad_accum_steps)) > 1:
                    t = new_opt.gradient_step.astype(jnp.float32)
                    d = jnp.minimum(cfg.ema_decay, (1.0 + t) / (10.0 + t))
                    d = jnp.where(new_opt.mini_step == 0, d, 1.0)
                else:
                    t = (state.step + 1).astype(jnp.float32)
                    d = jnp.minimum(cfg.ema_decay, (1.0 + t) / (10.0 + t))
                new_ema = jax.tree.map(
                    lambda e, p: e - (1.0 - d) * (e - p),
                    state.ema_params, new_params)
            new_state = state.replace(
                step=state.step + 1, params=new_params, batch_stats=new_bs,
                opt_state=new_opt, image_count=new_count, rng=new_rng,
                ema_params=new_ema)
            metrics = dict(breakdown)
            metrics["total_loss"] = loss_val
            metrics["kernel_reg"] = kreg
            metrics["gamma_reg"] = greg
            metrics["lr"] = schedule(state.step)
            return new_state, metrics

        def eval_step(state: TrainState, images, labels):
            # scores the EMA shadow when on (_infer_params) — val_loss/
            # val_mAP then measure the weights inference will actually use
            p = _infer_params(cfg, state)
            heads = model.apply(
                {"params": p, "batch_stats": state.batch_stats},
                normalize(images), train=False)
            total, breakdown, _ = loss_fn(heads, labels, state.image_count)
            # keras Model.fit's val_loss includes model.losses (the L2
            # regularizers) — omitting them here would offset val_loss
            # from train loss by kreg+greg and break reference parity
            kreg, greg = l2_regularization(p)
            metrics = dict(breakdown)
            metrics["total_loss"] = total + kreg + greg
            return metrics

        def forward(state: TrainState, images):
            return model.apply(
                {"params": _infer_params(cfg, state),
                 "batch_stats": state.batch_stats},
                normalize(images), train=False)

        data_shard = batch_sharding(self.mesh, self.cfg.data_axis)
        img_shard = image_sharding(self.mesh, self.cfg.data_axis,
                                   self.cfg.model_axis)
        repl = replicated(self.mesh)
        with_op_mesh = self._with_op_mesh

        return (
            with_op_mesh(self._jit(
                train_step,
                in_shardings=(repl, img_shard, data_shard),
                out_shardings=(repl, repl),
                donate_argnums=(0,))),
            with_op_mesh(self._jit(
                eval_step,
                in_shardings=(repl, img_shard, data_shard),
                out_shardings=repl)),
            with_op_mesh(self._jit(
                forward, in_shardings=(repl, img_shard),
                out_shardings=repl)),
        )

    def _model_structure(self):
        """(StableHLO text, param-tree summary) for the base train step —
        the TB model-structure artifact (analog of the reference's Keras
        graph write, board_callback.py:42-43)."""
        cfg = self.cfg
        h, w, c = cfg.input_image_size
        b = cfg.batch_size
        # uint8 — the Dataset ships uint8 batches (data/loader.py Batch)
        # and the train step normalizes on-device; tracing with float32
        # here would dump an HLO for a program that never runs (and the
        # fused augment backend asserts on non-uint8 input at trace time)
        img = jax.ShapeDtypeStruct((b, h, w, c), jnp.uint8)
        lab = jax.ShapeDtypeStruct((b, cfg.max_boxes, 5), jnp.float32)
        sds = jax.tree.map(
            lambda x: jax.ShapeDtypeStruct(jnp.shape(x), jnp.asarray(x).dtype),
            self.state)
        hlo = self.train_step.lower(sds, img, lab).as_text()
        lines, total = [], 0
        flat = jax.tree_util.tree_flatten_with_path(self.state.params)[0]
        for path, leaf in flat:
            name = "/".join(str(getattr(p, "key", p)) for p in path)
            lines.append(f"{name}  {tuple(leaf.shape)}  {leaf.dtype}")
            total += leaf.size
        lines.append(f"TOTAL parameters: {total}")
        return hlo, "\n".join(lines)

    # ------------------------------------------------------------------ #
    def request_stop(self):
        """Ask a running train loop to checkpoint the full train state
        and return after the current step.  Installed as the SIGTERM
        handler while training (graceful preemption — TPU VMs are
        routinely preempted; the reference has no recovery beyond
        restart-and-resume, SURVEY §5); also callable directly by
        embedders."""
        self._stop_requested = True

    @contextmanager
    def _graceful_preemption(self):
        self._stop_requested = False
        handler = lambda signum, frame: self.request_stop()  # noqa: E731
        try:
            prev = signal.signal(signal.SIGTERM, handler)
        except ValueError:
            prev = None  # not the main thread: rely on request_stop()
        try:
            yield
        finally:
            if prev is not None:
                signal.signal(signal.SIGTERM, prev)

    def _stop_and_save(self):
        logging.warning(
            "stop requested (preemption?): checkpointed full train "
            "state at step %d; rerun to resume", int(self.state.step))
        self._final_save()

    def _epoch_steps(self, epoch: int, start_epoch: int, spe: int) -> int:
        """Steps remaining in this epoch.  A preemption checkpoint can
        land mid-epoch; on resume the interrupted epoch runs only its
        REMAINING steps so step-count/epoch alignment (and with it the
        LR-schedule boundaries, schedule.py) is preserved exactly."""
        if epoch != start_epoch:
            return spe
        done = int(self.state.step) % spe
        if done:
            logging.info("resuming mid-epoch: %d of %d steps remain",
                         spe - done, spe)
        return spe - done

    # ------------------------------------------------------------------ #
    def train(self, train_batches: Iterator, val_batches=None,
              epochs: Optional[int] = None,
              steps_per_epoch: Optional[int] = None,
              epoch_callback=None):
        """Epoch loop (reference trainer.py:99-115 / keras Model.fit).

        ``epoch_callback(epoch)``: optional hook invoked after each
        epoch's logging/validation/TB write — the keras custom-callback
        analog (reference trainer.py:90-97).  The CLI uses it for
        periodic validation mAP (--val_map_every)."""
        cfg = self.cfg
        epochs = epochs if epochs is not None else cfg.epoch
        spe = steps_per_epoch or cfg.steps_per_epoch
        self._ensure_schedule(spe)
        if cfg.stop_monitor not in ("loss", "val_loss", "val_map"):
            raise ValueError(f"stop_monitor={cfg.stop_monitor!r}: "
                             "expected 'loss', 'val_loss' or 'val_map'")
        if cfg.stop_monitor == "val_loss" and val_batches is None:
            # fail fast: keras would warn per-epoch and never stop; a
            # 500-patience run silently missing its monitor is a trap
            raise ValueError("stop_monitor='val_loss' requires a "
                             "validation set (--val_label_path)")
        if cfg.stop_monitor == "val_map" and epoch_callback is None:
            raise ValueError(
                "stop_monitor='val_map' requires the mAP epoch callback "
                "(--val_label_path with --val_map_every N)")
        if self.tb is not None:
            try:
                self.tb.write_model_structure(*self._model_structure())
            except Exception:
                logging.warning("model-structure TB artifact failed",
                                exc_info=True)
        best = float("inf")
        patience = 0
        start_epoch = int(self.state.step) // spe
        with self._graceful_preemption():
          for epoch in range(start_epoch, epochs):
            t0 = time.time()
            acc = None
            n = 0
            for _ in range(self._epoch_steps(epoch, start_epoch, spe)):
                if self._stop_requested:
                    break
                batch = next(train_batches)
                self.state, metrics = self.train_step(
                    self.state, jnp.asarray(batch.images),
                    jnp.asarray(batch.labels))
                acc = metrics if acc is None else jax.tree.map(
                    lambda a, b: a + b, acc, metrics)
                n += 1
            if self._stop_requested:
                return self._stop_and_save()
            mean = jax.tree.map(lambda a: np.asarray(a) / n, acc)
            total = float(mean["total_loss"])
            lr = float(np.asarray(metrics["lr"]))
            log_epoch(epoch, lr, total, float(mean["kernel_reg"]),
                      float(mean["gamma_reg"]), mean, time.time() - t0)
            self.history.append(total)

            val_loss = self._run_validation(val_batches)
            if self.tb is not None:
                self.tb.write_epoch(epoch, lr, total, mean,
                                    self.state.params, val_loss=val_loss)
            cb_metric = (epoch_callback(epoch)
                         if epoch_callback is not None else None)

            # periodic checkpoint (trainer.py:90-91); async — the disk
            # write overlaps the next epoch (_final_save is synchronous)
            if (epoch + 1) % cfg.ckpt_period == 0:
                self.ckpt.save(int(self.state.step), self.state,
                               wait=False)

            # early stopping (trainer.py:92-93); monitor per
            # cfg.stop_monitor — "loss" is the reference's choice,
            # "val_loss" the keras default when validation is wired,
            # "val_map" the callback's held-out mAP (maximize; epochs
            # where the periodic callback returns None — off-cadence
            # under --val_map_every N — count toward neither best nor
            # patience, so patience is measured in EVALUATED epochs)
            if cfg.stop_monitor == "val_map":
                monitored = (None if cb_metric is None
                             else -float(cb_metric))
            elif cfg.stop_monitor == "val_loss":
                monitored = val_loss
            else:
                monitored = total
            if monitored is None:
                continue
            if monitored < best - cfg.stop_min_delta:
                best = monitored
                patience = 0
            else:
                patience += 1
                if patience >= cfg.stop_patience:
                    logging.info("early stopping at epoch %d", epoch)
                    break
        self._final_save()

    def _run_validation(self, val_batches):
        """One held-out validation pass; returns mean val_loss or None.

        keras re-evaluates the SAME validation set each epoch (Model.fit
        resets validation_data); a persistent repeat=True stream would
        drift by (batch*ceil - size) images per epoch whenever batch
        does not divide the set, making val_loss incomparable across
        epochs.  A zero-arg callable is therefore treated as a factory:
        one fresh iterator per epoch, every epoch scoring the identical
        window.  A plain iterator is still accepted (static batch shape,
        caller manages alignment)."""
        if val_batches is None:
            return None
        vit = val_batches() if callable(val_batches) else val_batches
        try:
            vacc, vn = 0.0, 0
            for _ in range(self.cfg.validation_steps):
                try:
                    vb = next(vit)
                except StopIteration:
                    break
                vm = self.eval_step(self.state, jnp.asarray(vb.images),
                                    jnp.asarray(vb.labels))
                vacc += float(vm["total_loss"])
                vn += 1
        finally:
            if vit is not val_batches and hasattr(vit, "close"):
                vit.close()
        if vn == 0:
            # a plain (non-factory) iterator exhausts after its first
            # epoch; scoring it as val_loss=0.0 would silently become
            # the stop_monitor's "best" and break early stopping
            raise ValueError(
                "validation stream yielded no batches this epoch — pass "
                "val_batches as a zero-arg factory (fresh stream per "
                "epoch) or a repeating iterator")
        val_loss = vacc / vn
        logging.info("  val_loss=%.5f", val_loss)
        return val_loss

    # ------------------------------------------------------------------ #
    def train_multi_scale(self, batches_by_size, val_batches=None,
                          epochs=None, steps_per_epoch=None,
                          epoch_callback=None):
        """Multi-scale training: cycle input sizes per epoch.

        batches_by_size: {(H, W): batch iterator}.  Each size uses its own
        cached jitted step; params/optimizer state are shared (the model is
        fully convolutional).

        ``val_batches``: same semantics as ``train`` — the held-out set
        is evaluated at ITS OWN fixed size (eval_step retraces per
        shape), so val_loss stays epoch-comparable while the train size
        cycles.  No early stopping here in either case: train losses at
        different grid sizes are not comparable epoch-to-epoch.
        """
        cfg = self.cfg
        epochs = epochs if epochs is not None else cfg.epoch
        spe = steps_per_epoch or cfg.steps_per_epoch
        self._ensure_schedule(spe)
        sizes = list(batches_by_size.keys())
        start_epoch = int(self.state.step) // spe
        with self._graceful_preemption():
          for epoch in range(start_epoch, epochs):
            hw = sizes[epoch % len(sizes)]
            step_fn = self.steps_for_size(hw)[0]
            it = batches_by_size[hw]
            t0 = time.time()
            acc, n = None, 0
            for _ in range(self._epoch_steps(epoch, start_epoch, spe)):
                if self._stop_requested:
                    break
                batch = next(it)
                self.state, metrics = step_fn(
                    self.state, jnp.asarray(batch.images),
                    jnp.asarray(batch.labels))
                acc = metrics if acc is None else jax.tree.map(
                    lambda a, b: a + b, acc, metrics)
                n += 1
            if self._stop_requested:
                return self._stop_and_save()
            mean = jax.tree.map(lambda a: np.asarray(a) / n, acc)
            total = float(mean["total_loss"])
            log_epoch(epoch, float(np.asarray(metrics["lr"])), total,
                      float(mean["kernel_reg"]), float(mean["gamma_reg"]),
                      mean, time.time() - t0)
            logging.info("  (multi-scale size %sx%s)", hw[0], hw[1])
            self.history.append(total)
            val_loss = self._run_validation(val_batches)
            if self.tb is not None:
                self.tb.write_epoch(epoch, float(np.asarray(metrics["lr"])),
                                    total, mean, self.state.params,
                                    val_loss=val_loss)
            if epoch_callback is not None:
                epoch_callback(epoch)
            if (epoch + 1) % cfg.ckpt_period == 0:
                self.ckpt.save(int(self.state.step), self.state,
                               wait=False)
        self._final_save()

    def _final_save(self):
        # the last epoch may already have checkpointed this exact step
        # (orbax raises StepAlreadyExistsError even with force=True)
        step = int(self.state.step)
        if self.ckpt.latest_step() != step:
            self.ckpt.save(step, self.state, force=True)

    # ------------------------------------------------------------------ #
    @property
    def infer_params(self):
        """The weights inference and export surfaces must use: the EMA
        shadow when ``cfg.ema_decay`` is on, else the live weights.
        infer/export.py and tools/export_keras.py read this instead of
        ``state.params`` so exported models match predict()."""
        return _infer_params(self.cfg, self.state)

    @property
    def input_shardings(self):
        """(image, label) shardings of the jitted steps' batch arguments.
        Hand these to ``Dataset.device_prefetch(shardings=...)`` so each
        host->device transfer lands every shard directly on its mesh
        device (skipping the implicit device-0 reshard copy) and so
        multi-host feeding can assemble the global batch."""
        return (image_sharding(self.mesh, self.cfg.data_axis,
                               self.cfg.model_axis),
                batch_sharding(self.mesh, self.cfg.data_axis))

    def _pad_to_mesh(self, images):
        images = jnp.asarray(images)  # uint8 or float; normalized in-step
        n = images.shape[0]
        pad = (-n) % self.mesh.shape[self.cfg.data_axis]
        if pad:
            images = jnp.concatenate(
                [images, jnp.zeros((pad,) + images.shape[1:],
                                   images.dtype)], axis=0)
        return images, n

    def _jit(self, fn, **kw):
        """jax.jit with the config's XLA compiler options attached (the
        TPU-native analog of the reference's GPU session config,
        run.py:124-131).  cfg.compiler_options None = auto: on TPU the
        measured best scoped-VMEM budget (32 MiB, +0.8% at b128 — the
        PERF.md round-3 sweep; 96 MiB REGRESSES 12%), nothing on CPU
        (TPU flag names are unknown to the CPU compiler)."""
        copts = self.cfg.compiler_options
        if copts is None:
            copts = (("xla_tpu_scoped_vmem_limit_kib", 32768),) \
                if jax.default_backend() != "cpu" else ()
        if copts:
            kw["compiler_options"] = dict(copts)
        return jax.jit(fn, **kw)

    def _with_op_mesh(self, fn):
        """Re-register this trainer's mesh with the Pallas ops right
        before each call: registration is read at TRACE time, and a
        process can hold trainers with different meshes (tests)."""
        from ..ops.partition import set_op_mesh
        spatial = self.mesh.shape[self.cfg.model_axis] > 1

        def wrapped(*a):
            set_op_mesh(None if spatial else self.mesh,
                        self.cfg.data_axis)
            return fn(*a)

        def lower(*a, **kw):
            # the AOT surface (_model_structure) traces too — it needs
            # the same re-registration or it would trace this trainer's
            # Pallas ops over whichever mesh another trainer registered
            # last (a process can hold trainers with different meshes)
            set_op_mesh(None if spatial else self.mesh,
                        self.cfg.data_axis)
            return fn.lower(*a, **kw)
        wrapped.lower = lower  # keep jit's AOT surface
        return wrapped

    def predict(self, images) -> tuple:
        """Raw 3-head outputs for a batch (trainer.py:117-124).  Batches not
        divisible by the mesh data axis are padded then sliced back.
        With ``cfg.quant == "int8"`` runs the PTQ inference path,
        auto-calibrating activation scales on the first batch seen."""
        images, n = self._pad_to_mesh(images)
        if self.cfg.quant == "int8":
            if self._quant_vars is None:
                logging.info("int8 inference: calibrating activation "
                             "scales on the first batch")
                self.calibrate(images)
            if self._quant_vars:
                heads = self._quant_setup()["forward"](
                    self.state, self._quant_vars, images)
            else:
                # no conv passed the eligibility gate at this input
                # size/backbone: int8 is a no-op, run the plain forward
                heads = self.forward(self.state, images)
        else:
            heads = self.forward(self.state, images)
        if images.shape[0] != n:
            heads = tuple(h[:n] for h in heads)
        return heads

    # ------------------------------- int8 PTQ inference (ops/quantize) --
    def _quant_setup(self):
        """Lazily build the calibration / int8 forward programs.  The
        train/eval model stays unquantized; these are separate module
        instances over the SAME params (QuantConv shares nn.Conv's
        param subtree and name counter)."""
        if self._quant is not None:
            return self._quant
        cfg = self.cfg
        calib_model = build_detector(cfg, quant="calibrate")
        int8_model = build_detector(cfg, quant="int8")
        normalize = _normalize_images

        def calib_first(state, images):
            # no "quant" collection yet: mutable apply creates it.  A
            # configuration where NO conv passes the eligibility gate
            # (e.g. small inputs, or a backbone without 3x3/s1 convs)
            # mutates nothing and flax returns {} — quantized inference
            # is then a documented no-op (predict falls back).  All three
            # programs quantize the INFERENCE weights (_infer_params: the
            # EMA shadow when on) — calibrating live weights but serving
            # the shadow would mis-scale every activation.
            _, mut = calib_model.apply(
                {"params": _infer_params(cfg, state),
                 "batch_stats": state.batch_stats},
                normalize(images), train=False, mutable=["quant"])
            return mut.get("quant", {})

        def calib_more(state, qvars, images):
            _, mut = calib_model.apply(
                {"params": _infer_params(cfg, state),
                 "batch_stats": state.batch_stats, "quant": qvars},
                normalize(images), train=False, mutable=["quant"])
            return mut["quant"]

        def qforward(state, qvars, images):
            return int8_model.apply(
                {"params": _infer_params(cfg, state),
                 "batch_stats": state.batch_stats, "quant": qvars},
                normalize(images), train=False)

        img_shard = image_sharding(self.mesh, cfg.data_axis, cfg.model_axis)
        repl = replicated(self.mesh)
        with_op_mesh = self._with_op_mesh

        self._quant = {
            "calib_first": with_op_mesh(self._jit(
                calib_first, in_shardings=(repl, img_shard),
                out_shardings=repl)),
            "calib_more": with_op_mesh(self._jit(
                calib_more, in_shardings=(repl, repl, img_shard),
                out_shardings=repl)),
            "forward": with_op_mesh(self._jit(
                qforward, in_shardings=(repl, repl, img_shard),
                out_shardings=repl)),
        }
        return self._quant

    def calibrate(self, images):
        """Accumulate int8 activation scales (per-conv input abs-max,
        running maximum) from a batch; call over a calibration set
        before quantized inference, or let ``predict`` auto-calibrate
        on its first batch."""
        q = self._quant_setup()
        images, _ = self._pad_to_mesh(images)
        if self._quant_vars is None:
            self._quant_vars = q["calib_first"](self.state, images)
            if not self._quant_vars:
                logging.warning(
                    "quant='int8': no conv passes the eligibility gate "
                    "at input %s / backbone %s — quantized inference "
                    "is a no-op (plain forward)", self.cfg.
                    input_image_size, self.cfg.model_backbone)
        elif self._quant_vars:
            self._quant_vars = q["calib_more"](
                self.state, self._quant_vars, images)
        return self._quant_vars
