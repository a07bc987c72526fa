"""Re-measure every `auto` backend decision on the CURRENT hardware.

The framework ships ~2,100 LoC of opt-in kernels whose `auto` defaults
encode per-shape measurements frozen on one v5e chip (PERF.md rounds
2-4): direct-XLA convolutions over the winograd chain, the fused Pallas
stem for TRAIN only, XLA augmentation over the fused in-kernel-PRNG
variant, and int8 PTQ engaged only in the b64 latency regime.  On a new
hardware or compiler generation those boundaries can silently rot —
this tool re-runs each A/B end-to-end and reports whether the frozen
decision still holds (round-3 verdict item 6).

Each measurement is a short steady-state run (compile excluded) of the
production step via tools/profile_step._flagship — the same harness the
original decisions used.  A ~3%+ flip margin separates real regressions
from run-to-run noise.

Usage:
  python -m yolov3_tensorflow_tpu.tools.backend_audit
      [--batch 128] [--steps 10] [--skip_quant] [--json OUT.json]

Exit code 1 if any frozen decision flipped (so CI can gate on it).
"""
from __future__ import annotations

import argparse
import json
import time

# flip only counts beyond this relative margin (run-to-run noise on
# short steady-state runs measures ~1-2%)
NOISE_MARGIN = 0.03


def _measure(mode: str, batch: int, steps: int, **backends) -> float:
    """img/s for one backend configuration (fresh process-level state
    is unnecessary: each config is a distinct jit cache entry)."""
    from .profile_step import _flagship

    run = _flagship(mode, batch,
                    backends.get("conv_backend", "xla"),
                    backends.get("stem_backend", "xla"),
                    backends.get("augment_backend", "xla"),
                    backbone=backends.get("backbone", "resnet-18"),
                    grouped_backend=backends.get("grouped_backend",
                                                 "auto"))
    run(3)  # compile + warmup
    t0 = time.perf_counter()
    run(steps)
    dt = time.perf_counter() - t0
    return batch * steps / dt


def _measure_quant(batch: int, steps: int, quant: bool) -> float:
    """Inference img/s with/without int8 PTQ (bench.py --infer path)."""
    import tempfile

    import jax
    import jax.numpy as jnp
    import numpy as np

    from ..config import Config
    from ..models.detector import build_detector
    from ..ops.nms import BatchedNMS
    from ..train.trainer import YOLOv3Trainer, _normalize_images

    cfg = Config(input_image_size=(416, 416, 3), batch_size=batch,
                 max_boxes=32, num_devices=1, confidence_thresh=0.5,
                 quant="int8" if quant else "none")
    trainer = YOLOv3Trainer(cfg, restore=False,
                            checkpoint_dir=tempfile.mkdtemp())
    nms = BatchedNMS(cfg)
    model = build_detector(cfg, quant="int8") if quant else trainer.model

    @jax.jit
    def infer(state, qvars, images):
        variables = {"params": state.params,
                     "batch_stats": state.batch_stats}
        if quant:
            variables["quant"] = qvars
        return nms(model.apply(variables, _normalize_images(images),
                               train=False))

    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.randint(0, 255, (batch, 416, 416, 3),
                                     dtype=np.uint8))
    qvars = trainer.calibrate(images) if quant else 0
    for _ in range(3):
        _ = float(jnp.sum(infer(trainer.state, qvars, images)))
    t0 = time.perf_counter()
    for _ in range(steps):
        det = infer(trainer.state, qvars, images)
    _ = float(jnp.sum(det))
    return batch * steps / (time.perf_counter() - t0)


def run_audit(batch: int = 128, steps: int = 10,
              skip_quant: bool = False) -> list[dict]:
    """Returns one dict per frozen decision:
    {decision, auto_default, a, b, img_s_a, img_s_b, holds}."""
    checks = []

    def check(decision, auto_default, name_a, f_a, name_b, f_b):
        ia, ib = f_a(), f_b()
        winner = name_a if ia >= ib else name_b
        # the frozen default must not LOSE by more than the margin
        default_v = ia if auto_default == name_a else ib
        other_v = ib if auto_default == name_a else ia
        holds = default_v >= other_v * (1 - NOISE_MARGIN)
        checks.append({
            "decision": decision, "auto_default": auto_default,
            "a": name_a, "img_s_a": round(ia, 1),
            "b": name_b, "img_s_b": round(ib, 1),
            "measured_winner": winner, "holds": bool(holds),
        })
        print(f"{decision:32} auto={auto_default:12} "
              f"{name_a}={ia:7.1f}  {name_b}={ib:7.1f}  "
              f"-> {'HOLDS' if holds else 'FLIPPED'}")

    # 1. conv backend (PERF.md round 3: chain loses per-shape; the
    #    winograd run exercises Config.winograd_min_channels too)
    check("train conv_backend", "xla",
          "xla", lambda: _measure("train", batch, steps,
                                  conv_backend="xla",
                                  stem_backend="auto",
                                  augment_backend="auto"),
          "winograd", lambda: _measure("train", batch, steps,
                                       conv_backend="winograd",
                                       stem_backend="auto",
                                       augment_backend="auto"))
    # 2. stem kernel: auto = fused for TRAIN...
    check("train stem_backend", "fused",
          "fused", lambda: _measure("train", batch, steps,
                                    stem_backend="fused",
                                    augment_backend="auto"),
          "xla", lambda: _measure("train", batch, steps,
                                  stem_backend="xla",
                                  augment_backend="auto"))
    # ...and xla for EVAL (PERF.md round-3 eval-stem A/B)
    check("infer stem_backend", "xla",
          "fused", lambda: _measure("infer", batch, steps,
                                    stem_backend="fused"),
          "xla", lambda: _measure("infer", batch, steps,
                                  stem_backend="xla"))
    # 3. augment kernel (round-3: in-kernel PRNG costs ~6ms VPU)
    check("train augment_backend", "xla",
          "xla", lambda: _measure("train", batch, steps,
                                  stem_backend="auto",
                                  augment_backend="xla"),
          "fused", lambda: _measure("train", batch, steps,
                                    stem_backend="auto",
                                    augment_backend="fused"))
    # 5. resnext grouped-conv formulation (round-5: dense block-diagonal
    #    +6.5% train; NOTE the dense train program's first remote
    #    compile measured ~25 min — budget for it)
    check("resnext grouped_backend", "dense",
          "dense", lambda: _measure("train", batch, steps,
                                    stem_backend="auto",
                                    augment_backend="auto",
                                    backbone="resnext-18",
                                    grouped_backend="dense"),
          "grouped", lambda: _measure("train", batch, steps,
                                      stem_backend="auto",
                                      augment_backend="auto",
                                      backbone="resnext-18",
                                      grouped_backend="grouped"))
    # 6. resnet-18-v2 pool-only stem kernel (round-5 A/B, PERF.md)
    check("v2 train stem_backend", "fused",
          "fused", lambda: _measure("train", batch, steps,
                                    stem_backend="fused",
                                    augment_backend="auto",
                                    backbone="resnet-18-v2"),
          "xla", lambda: _measure("train", batch, steps,
                                  stem_backend="xla",
                                  augment_backend="auto",
                                  backbone="resnet-18-v2"))
    if not skip_quant:
        # 4. int8 PTQ regime boundaries (win at b64, wash at b128)
        check("infer quant @ b64", "int8",
              "int8", lambda: _measure_quant(64, steps * 2, True),
              "bf16", lambda: _measure_quant(64, steps * 2, False))
        check("infer quant @ b128", "bf16",
              "int8", lambda: _measure_quant(128, steps * 2, True),
              "bf16", lambda: _measure_quant(128, steps * 2, False))
    return checks


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--skip_quant", action="store_true",
                    help="skip the (slower) int8 A/Bs")
    ap.add_argument("--json", default=None)
    args = ap.parse_args(argv)

    checks = run_audit(args.batch, args.steps, args.skip_quant)
    flipped = [c for c in checks if not c["holds"]]
    print(f"\n{len(checks) - len(flipped)}/{len(checks)} frozen "
          f"decisions hold on this hardware")
    if flipped:
        print("FLIPPED (re-tune the auto tables / PERF.md):")
        for c in flipped:
            print(f"  {c['decision']}: auto={c['auto_default']} but "
                  f"measured winner is {c['measured_winner']}")
    if args.json:
        with open(args.json, "w") as f:
            json.dump(checks, f, indent=1)
    return 1 if flipped else 0


if __name__ == "__main__":
    raise SystemExit(main())
