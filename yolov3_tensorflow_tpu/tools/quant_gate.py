"""int8 PTQ accuracy gate: mAP, quantized vs bf16.

Config.quant="int8" runs the measured-eligible early convs on the int8
path (ops/quantize.py).  The acceptance rule for shipping that flag is
the same band BASELINE.md uses for framework parity: mAP@0.5 must stay
within +/-0.5 points of the unquantized number through the identical
decode + NMS + evaluator path.

Two modes:
  * default — the committed real-sample overfit checkpoint (13-class
    reference sample; the production measurement, delta 0.00 recorded
    in PERF.md).
  * ``--self_labeled`` — no checkpoint needed: ground truth is the
    fresh (deterministic) model's own detections
    (tools/map_parity.synth_label_file), so the gate runs in every
    suite on a clean tree.  The input size must keep the early convs
    int8-ELIGIBLE (both channel counts <= 128 AND area >= 52^2 —
    ops/quantize.quant_eligible), hence the 224x288 default: module-1
    runs at 56x72.  The self-labeled delta measures pure quantization
    error on confident detections.

Run (TPU or CPU):
  python -m yolov3_tensorflow_tpu.tools.quant_gate \
      --checkpoint models/resnet-18-radam-aug-13c
  python -m yolov3_tensorflow_tpu.tools.quant_gate --self_labeled
"""
from __future__ import annotations

import argparse

from .map_parity import SAMPLE, _score, self_labeled_setup


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--checkpoint", default="models/resnet-18-radam-aug-13c")
    p.add_argument("--self_labeled", action="store_true",
                   help="checkpoint-free: gate against the fresh "
                        "model's own detections (see docstring)")
    p.add_argument("--input_size", default="224x288",
                   help="HxW for self-labeled mode (must keep the "
                        "early convs int8-eligible: >= 208 per axis)")
    p.add_argument("--images", type=int, default=8,
                   help="sample-image budget for self-labeled mode")
    a = p.parse_args(argv)

    from ..config import Config
    from ..data.loader import Dataset
    from ..train.trainer import YOLOv3Trainer

    if a.self_labeled:
        import jax

        # same environment contract as map_parity: CPU, before any
        # device query
        jax.config.update("jax_platforms", "cpu")
        h, w = (int(v) for v in a.input_size.split("x"))
        cfg, trainer, ds = self_labeled_setup(
            images=a.images, input_image_size=(h, w, 3))
        results = {}
        # self_labeled_setup forces compute_dtype=float32 (bf16's logit
        # rounding would drown the parity signal) — label the baseline
        # honestly as f32, not bf16 (ADVICE r4)
        base = "f32"
        results[base] = _score(
            cfg, lambda b: trainer.predict(b.images), ds)["mAP"]
        print(f"{base}   mAP@0.5 = {results[base]:.4f}")

        import dataclasses
        import tempfile

        qcfg = dataclasses.replace(cfg, quant="int8")
        qtrainer = YOLOv3Trainer(qcfg, restore=False,
                                 checkpoint_dir=tempfile.mkdtemp())
        # identical weights: the generator's (head-amplified) state
        qtrainer.state = qtrainer.state.replace(
            params=trainer.state.params,
            batch_stats=trainer.state.batch_stats)
        report = _score(qcfg, lambda b: qtrainer.predict(b.images), ds)
        if not qtrainer._quant_vars:
            print("FAIL: quant='int8' quantized nothing (no eligible "
                  "conv at this input size/backbone) — the gate cannot "
                  "certify an int8 path that never executed")
            return 2
        results["int8"] = report["mAP"]
        print(f"int8  mAP@0.5 = {results['int8']:.4f}")
    else:
        results = {}
        base = "bf16"
        for label, quant in (("bf16", "none"), ("int8", "int8")):
            cfg = Config(class_num=13, batch_size=4, quant=quant,
                         test_label_path=f"{SAMPLE}/label.txt",
                         test_set_dir=f"{SAMPLE}/images")
            trainer = YOLOv3Trainer(cfg, restore=True,
                                    checkpoint_dir=a.checkpoint)
            assert int(trainer.state.step) > 0, \
                f"no checkpoint restored from {a.checkpoint}"
            ds = Dataset(cfg, cfg.test_label_path, cfg.test_set_dir,
                         is_test=True, shuffle=False)
            report = _score(cfg, lambda b: trainer.predict(b.images),
                            ds)
            if quant == "int8" and not trainer._quant_vars:
                # predict silently falls back to the plain bf16
                # forward when no conv passes the eligibility gate —
                # "PASS" would then certify a path that never ran
                print("FAIL: quant='int8' quantized nothing (no "
                      "eligible conv at this input size/backbone) — "
                      "the gate cannot certify an int8 path that "
                      "never executed")
                return 2
            results[label] = report["mAP"]
            print(f"{label}  mAP@0.5 = {report['mAP']:.4f}")

    delta = abs(results["int8"] - results[base])
    # Self-labeled mode is deliberately ADVERSARIAL for quantization:
    # untrained weights have none of the structure calibration relies
    # on and scores cluster near the threshold, so honest int8 error
    # flips more marginal candidates than it ever does on a trained
    # model (measured: 2.96 points here vs 0.00 on the trained
    # checkpoint).  The self-gate pins that measured 2.96 with ~0.5 of
    # headroom (3.5 points; was 4.0 — tightened per VERDICT r4 item 6
    # so a real half-point regression in the quantized path trips the
    # suite instead of being absorbed).  Deterministic setup,
    # reproducible number; a real quant-path regression (wrong scales,
    # broken requant) lands tens of points past it.  The 0.5-point
    # production claim stays checkpoint-mode's.
    gate = 0.035 if a.self_labeled else 0.005
    ok = delta <= gate
    if a.self_labeled:
        ok = ok and results[base] >= 0.99  # self-consistency floor
    print(f"|delta| = {delta * 100:.2f} mAP points -> "
          f"{'PASS' if ok else 'FAIL'} (gate: {gate * 100:.1f})")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
