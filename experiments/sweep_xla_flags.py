"""Sweep single-chip XLA:TPU compiler options on the real train step.

Usage: python experiments/sweep_xla_flags.py [batch] [steps] [reps]

For each candidate option set (each applied ON TOP of the measured
32 MiB scoped-VMEM base, PERF.md round-3 sweep), builds a fresh trainer
with ``Config.compiler_options``, compiles the b128 train step on the
TPU, and times ``steps`` chained dispatches ``reps`` times (best-of —
relay jitter is one-sided slow).  Candidates were harvested from
``strings libtpu.so`` (flags the backend's option parser recognizes);
an option the REMOTE compiler rejects is reported as ERROR and skipped,
not fatal.  One process holds the TPU for the whole sweep (CLAUDE.md:
serialize TPU jobs).
"""
from __future__ import annotations

import sys
import tempfile
import time

import numpy as np

BASE = (("xla_tpu_scoped_vmem_limit_kib", 32768),)

CANDIDATES = [
    ("base(scoped_vmem=32M)", ()),
    ("latency_hiding_sched", (("xla_tpu_enable_latency_hiding_scheduler",
                               True),)),
    ("all_experimental_sched", (
        ("xla_tpu_enable_all_experimental_scheduler_features", True),)),
    ("pipelined_loop_unroll", (("xla_tpu_enable_pipelined_loop_unrolling",
                                True),)),
    ("vmem_to_vmem_dmas", (("xla_tpu_enable_vmem_to_vmem_dmas", True),)),
    ("aggressive_loop_fusion_layout", (
        ("xla_tpu_enable_aggressive_loop_fusion_layout_opt", True),)),
    ("dot_dot_fusion", (("xla_tpu_dot_dot_fusion", True),)),
    ("scavenge_vmem_for_fusions", (
        ("xla_tpu_scavenge_vmem_for_fusions", True),)),
    ("msa_minimalloc", (("xla_tpu_msa_use_minimalloc", True),)),
    ("licm_inflation_2x", (("xla_tpu_licm_size_inflation_ratio", 2),)),
    ("copy_fusion_split", (("xla_tpu_copy_fusion_allow_split", True),)),
    ("degenerate_dim_rewriter", (
        ("xla_tpu_enable_degenerate_dimension_rewriter", True),)),
    ("conv_input_fusion_downcast", (
        ("xla_tpu_allow_conv_input_fusion_with_downcast_convert", True),)),
]


def bench_one(name, copts, batch, steps, reps):
    import jax.numpy as jnp

    from yolov3_tensorflow_tpu.config import Config
    from yolov3_tensorflow_tpu.train.trainer import YOLOv3Trainer

    cfg = Config(input_image_size=(416, 416, 3), batch_size=batch,
                 max_boxes=32, model_backbone="resnet-18",
                 optimizer="radam", is_augment=True,
                 rectified_coord_num=-1, num_devices=1,
                 compiler_options=BASE + copts)
    trainer = YOLOv3Trainer(cfg, restore=False,
                            checkpoint_dir=tempfile.mkdtemp())
    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.randint(0, 255, (batch, 416, 416, 3),
                                     dtype=np.uint8))
    labels = -np.ones((batch, 32, 5), np.float32)
    labels[:, 0] = [0.5, 0.5, 0.3, 0.3, 0]
    labels = jnp.asarray(labels)

    state = trainer.state
    for _ in range(3):
        state, metrics = trainer.train_step(state, images, labels)
    float(metrics["total_loss"])  # sync (scalar fetch; CLAUDE.md)

    best = 0.0
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(steps):
            state, metrics = trainer.train_step(state, images, labels)
        float(metrics["total_loss"])
        best = max(best, batch * steps / (time.perf_counter() - t0))
    return best


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 15
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    results = []
    for name, copts in CANDIDATES:
        try:
            img_s = bench_one(name, copts, batch, steps, reps)
            results.append((img_s, name))
            print(f"{name:34s} {img_s:8.1f} img/s", flush=True)
        except Exception as e:  # remote compiler may reject a flag name
            print(f"{name:34s} ERROR {type(e).__name__}: "
                  f"{str(e)[:200]}", flush=True)
    results.sort(reverse=True)
    print("\n== ranked ==")
    for img_s, name in results:
        print(f"{img_s:8.1f}  {name}")


if __name__ == "__main__":
    main()
