"""Per-op device profiling of the train or inference step.

First-class version of the xprof workflow that drove the round-2/3
kernel decisions (PERF.md): traces N steps of the flagship model with
``jax.profiler``, parses the trace with xprof's ``hlo_stats`` tool,
and prints a per-category + per-op table with per-step times and
FLOP rates.  The reference's only tracing is wall-clock seconds per
epoch (utils/logger_callback.py:100-101); this is the TPU-native
replacement (SURVEY.md §5).

Usage:
  python -m yolov3_tensorflow_tpu.tools.profile_step --mode train
      [--batch 128] [--steps 5] [--trace_dir DIR] [--top 30]
      [--conv_backend xla|winograd] [--stem_backend auto|xla|fused]
      [--augment_backend auto|xla|fused]
  python -m yolov3_tensorflow_tpu.tools.profile_step --mode infer ...

The trace directory is kept (view it with TensorBoard/xprof); the
table is printed to stdout.  On host-only backends (CPU) hlo_stats
has no device rows — the tool reports that instead of a table.
"""
from __future__ import annotations

import argparse
import tempfile
import time


def _flagship(mode: str, batch: int, conv_backend: str,
              stem_backend: str, augment_backend: str = "auto",
              backbone: str = "resnet-18", grouped_backend: str = "auto"):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ..config import Config
    from ..ops.nms import BatchedNMS
    from ..train.trainer import YOLOv3Trainer

    cfg = Config(input_image_size=(416, 416, 3), batch_size=batch,
                 max_boxes=32, model_backbone=backbone,
                 optimizer="radam", is_augment=True,
                 rectified_coord_num=-1, num_devices=1,
                 conv_backend=conv_backend, stem_backend=stem_backend,
                 augment_backend=augment_backend,
                 grouped_backend=grouped_backend, confidence_thresh=0.5)
    trainer = YOLOv3Trainer(cfg, restore=False,
                            checkpoint_dir=tempfile.mkdtemp())
    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.randint(0, 255, (batch, 416, 416, 3),
                                     dtype=np.uint8))

    if mode == "train":
        labels = -np.ones((batch, 32, 5), np.float32)
        labels[:, 0] = [0.5, 0.5, 0.3, 0.3, 0]
        labels = jnp.asarray(labels)
        state = trainer.state

        def run_steps(n):
            nonlocal state
            for _ in range(n):
                state, metrics = trainer.train_step(state, images,
                                                    labels)
            return float(metrics["total_loss"])
        return run_steps

    nms = BatchedNMS(cfg)

    @jax.jit
    def infer(state, images):
        heads = trainer.model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            images.astype(jnp.float32) / 255.0, train=False)
        return nms(heads)

    def run_steps(n):
        for _ in range(n):
            det = infer(trainer.state, images)
        return float(jnp.sum(det))
    return run_steps


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", choices=("train", "infer"),
                    default="train")
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--steps", type=int, default=5)
    ap.add_argument("--trace_dir", default=None)
    ap.add_argument("--top", type=int, default=30)
    ap.add_argument("--conv_backend", default="xla")
    ap.add_argument("--stem_backend", default="auto")
    ap.add_argument("--augment_backend", default="auto")
    ap.add_argument("--grouped_backend", default="auto")
    ap.add_argument("--backbone", default="resnet-18")
    args = ap.parse_args(argv)
    trace_dir = args.trace_dir or tempfile.mkdtemp(prefix="yolov3_trace_")

    from ..utils.profiler import (format_op_table, hlo_op_table,
                                  trace_steps)

    run_steps = _flagship(args.mode, args.batch, args.conv_backend,
                          args.stem_backend, args.augment_backend,
                          backbone=args.backbone,
                          grouped_backend=args.grouped_backend)
    run_steps(3)  # compile + warmup
    t0 = time.perf_counter()
    run_steps(args.steps)
    dt = time.perf_counter() - t0
    print(f"untraced: {dt/args.steps*1e3:.1f} ms/step, "
          f"{args.batch*args.steps/dt:.0f} img/s at b{args.batch} "
          f"({args.mode})")
    with trace_steps(trace_dir):
        run_steps(args.steps)
    print(f"trace: {trace_dir}")
    try:
        by_cat, ops = hlo_op_table(trace_dir)
    except (RuntimeError, ImportError) as e:
        print(f"no per-op table: {e}")
        return
    print(format_op_table(by_cat, ops, top_n=args.top,
                          steps=args.steps))


if __name__ == "__main__":
    main()
