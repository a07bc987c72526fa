"""Benchmark: training throughput (images/sec/chip) at 416x416.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline target: 5000 images/sec/chip on TPU v5e (BASELINE.md).

Measures the full jitted train step (on-device augmentation + forward +
loss + backward + RAdam update) on the flagship ResNet-18 YOLOv3 with
synthetic device-resident data, steady-state, excluding compilation.

``python bench.py --infer [batch steps]`` instead measures the full
inference path (forward + decode + batched on-device NMS), the
reference's host-Python post-process bottleneck made device-native.

``python bench.py --latency [batch requests]`` measures per-request
serving latency (default batch 1): each request is dispatched and
synced individually (scalar fetch — the serving client's view, relay
dispatch overhead included), reporting p50/p90/p99.

All modes accept ``--backbone NAME`` (resnet-18 default; resnet-18-v2,
resnext-18, mixnet-18, mobilenet-v2) — the metric name gains a
backbone suffix so the flagship series stays comparable.
"""
from __future__ import annotations

import json
import sys
import time

import numpy as np

BASELINE_IMG_S = 5000.0


def _pop_backbone(args: list) -> str:
    """Extract ``--backbone NAME`` from an argv slice (any position).
    Every PERF.md number before round 4 is flagship(resnet-18)-only;
    this flag is how the other four backbones get TPU numbers."""
    if "--backbone" not in args:
        return "resnet-18"
    i = args.index("--backbone")
    if i + 1 >= len(args):
        sys.exit("--backbone requires a name")
    name = args[i + 1]
    del args[i:i + 2]
    from yolov3_tensorflow_tpu.config import ALL_BACKBONES
    if name not in ALL_BACKBONES:
        sys.exit(f"unknown backbone {name!r} (choose from "
                 f"{', '.join(ALL_BACKBONES)})")
    return name


def main_latency(args):
    """Per-request serving latency: batch-N request -> forward + decode +
    device NMS -> sync (scalar fetch).  Unlike --infer (pipelined
    throughput), every request blocks before the next is issued — the
    number a latency-constrained serving deployment sees, including the
    per-dispatch relay overhead."""
    import tempfile

    import jax  # noqa: F401  (device init before timing)
    import jax.numpy as jnp

    from yolov3_tensorflow_tpu.config import Config
    from yolov3_tensorflow_tpu.models.detector import build_detector
    from yolov3_tensorflow_tpu.ops.nms import BatchedNMS
    from yolov3_tensorflow_tpu.train.trainer import (YOLOv3Trainer,
                                                     _normalize_images)

    quant = "--quant" in args
    args = [a for a in args if a != "--quant"]
    backbone = _pop_backbone(args)
    batch = int(args[0]) if args else 1
    requests = int(args[1]) if len(args) > 1 else 100
    cfg = Config(input_image_size=(416, 416, 3), batch_size=batch,
                 max_boxes=32, num_devices=1, confidence_thresh=0.5,
                 model_backbone=backbone,
                 quant="int8" if quant else "none")
    trainer = YOLOv3Trainer(cfg, restore=False,
                            checkpoint_dir=tempfile.mkdtemp())
    nms = BatchedNMS(cfg)
    model = build_detector(cfg, quant="int8") if quant else trainer.model

    import jax as _jax

    @_jax.jit
    def infer(state, qvars, images):
        variables = {"params": state.params,
                     "batch_stats": state.batch_stats}
        if quant:
            variables["quant"] = qvars
        heads = model.apply(variables, _normalize_images(images),
                            train=False)
        return nms(heads)

    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.randint(0, 255, (batch, 416, 416, 3),
                                     dtype=np.uint8))
    qvars = trainer.calibrate(images) if quant else 0
    for _ in range(5):  # compile + steady-state warmup
        _ = float(jnp.sum(infer(trainer.state, qvars, images)))
    lat = []
    for _ in range(requests):
        t0 = time.perf_counter()
        _ = float(jnp.sum(infer(trainer.state, qvars, images)))
        lat.append((time.perf_counter() - t0) * 1e3)
    lat.sort()

    def pct(p):
        return round(lat[min(len(lat) - 1, int(p / 100 * len(lat)))], 3)

    print(json.dumps({
        "metric": f"serving_latency_ms_b{batch}_416"
                  + ("_int8" if quant else "")
                  + ("" if backbone == "resnet-18" else "_" + backbone),
        "value": pct(50),
        "unit": "ms",
        "vs_baseline": None,  # the reference publishes no latency number
        "p90": pct(90), "p99": pct(99),
        "requests": requests,
    }))


def main_infer(args):
    import tempfile

    import jax
    import jax.numpy as jnp

    from yolov3_tensorflow_tpu.config import Config
    from yolov3_tensorflow_tpu.models.detector import build_detector
    from yolov3_tensorflow_tpu.ops.nms import BatchedNMS
    from yolov3_tensorflow_tpu.train.trainer import YOLOv3Trainer

    quant = "--quant" in args
    args = [a for a in args if a != "--quant"]
    backbone = _pop_backbone(args)
    batch = int(args[0]) if args else 64
    steps = int(args[1]) if len(args) > 1 else 20
    cfg = Config(input_image_size=(416, 416, 3), batch_size=batch,
                 max_boxes=32, num_devices=1, confidence_thresh=0.5,
                 model_backbone=backbone,
                 quant="int8" if quant else "none")
    trainer = YOLOv3Trainer(cfg, restore=False,
                            checkpoint_dir=tempfile.mkdtemp())
    nms = BatchedNMS(cfg)
    model = build_detector(cfg, quant="int8") if quant else trainer.model

    from yolov3_tensorflow_tpu.train.trainer import _normalize_images

    @jax.jit
    def infer(state, qvars, images):
        variables = {"params": state.params,
                     "batch_stats": state.batch_stats}
        if quant:
            variables["quant"] = qvars
        # the trainer's single normalization source: the int8 path's
        # calibration scales are only valid under the same normalize
        heads = model.apply(variables, _normalize_images(images),
                            train=False)
        return nms(heads)

    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.randint(0, 255, (batch, 416, 416, 3),
                                     dtype=np.uint8))
    qvars = trainer.calibrate(images) if quant else 0
    det = infer(trainer.state, qvars, images)
    _ = float(jnp.sum(det))
    t0 = time.perf_counter()
    for _ in range(steps):
        det = infer(trainer.state, qvars, images)
    _ = float(jnp.sum(det))
    dt = time.perf_counter() - t0
    img_s = batch * steps / dt
    print(json.dumps({
        "metric": "infer_images_per_sec_batched_nms_416"
                  + ("_int8" if quant else "")
                  + ("" if backbone == "resnet-18" else "_" + backbone),
        "value": round(img_s, 2),
        "unit": "img/s",
        "vs_baseline": None,  # the reference publishes no number
    }))


def main():
    import jax
    import jax.numpy as jnp

    import tempfile

    from yolov3_tensorflow_tpu.config import Config
    from yolov3_tensorflow_tpu.train.trainer import YOLOv3Trainer

    args = sys.argv[1:]
    backbone = _pop_backbone(args)
    batch = int(args[0]) if len(args) > 0 else 128
    steps = int(args[1]) if len(args) > 1 else 20
    # optional 3rd arg: augment backend A/B (auto | fused | xla)
    aug_backend = args[2] if len(args) > 2 else "auto"
    if aug_backend not in ("auto", "fused", "xla"):
        # an unknown string would silently fall through trainer's
        # backend match to the auto(=xla) branch, corrupting the A/B
        sys.exit(f"unknown augment backend {aug_backend!r} "
                 "(choose auto | fused | xla)")

    cfg = Config(input_image_size=(416, 416, 3), batch_size=batch,
                 max_boxes=32, model_backbone=backbone,
                 optimizer="radam", is_augment=True,
                 augment_backend=aug_backend,
                 rectified_coord_num=-1, num_devices=1)
    trainer = YOLOv3Trainer(cfg, restore=False,
                            checkpoint_dir=tempfile.mkdtemp())

    rng = np.random.RandomState(0)
    # uint8 batches: the production input format (run.py's
    # device_prefetch ships uint8; the step normalizes on device) —
    # 4x less HBM traffic on the normalize read than f32
    images = jnp.asarray(rng.randint(0, 255, (batch, 416, 416, 3),
                                     dtype=np.uint8))
    labels = -np.ones((batch, 32, 5), np.float32)
    labels[:, 0] = [0.5, 0.5, 0.3, 0.3, 0]
    labels[:, 1] = [0.25, 0.25, 0.1, 0.2, 0]
    labels = jnp.asarray(labels)

    # warmup / compile.  NOTE: sync via a scalar fetch — block_until_ready
    # does not reliably block through the axon relay backend.
    state = trainer.state
    for _ in range(3):
        state, metrics = trainer.train_step(state, images, labels)
    float(metrics["total_loss"])

    t0 = time.perf_counter()
    for _ in range(steps):
        state, metrics = trainer.train_step(state, images, labels)
    # the final loss depends on the whole chain; fetching it syncs all steps
    float(metrics["total_loss"])
    dt = time.perf_counter() - t0

    # per-chip: divide by the mesh data-axis size the step actually ran on
    # (num_devices=1 above), not the host's total device count
    n_chips = max(1, trainer.mesh.shape[cfg.data_axis])
    img_s = batch * steps / dt / n_chips
    print(json.dumps({
        "metric": "train_images_per_sec_per_chip_416"
                  + ("" if backbone == "resnet-18" else "_" + backbone),
        "value": round(img_s, 2),
        "unit": "img/s/chip",
        "vs_baseline": round(img_s / BASELINE_IMG_S, 4),
    }))


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--infer":
        main_infer(sys.argv[2:])
    elif len(sys.argv) > 1 and sys.argv[1] == "--latency":
        main_latency(sys.argv[2:])
    else:
        main()
