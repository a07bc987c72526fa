"""int8 PTQ accuracy gate: real-sample mAP, quantized vs bf16.

Config.quant="int8" runs the measured-eligible early convs on the int8
path (ops/quantize.py).  The acceptance rule for shipping that flag is
the same band BASELINE.md uses for framework parity: mAP@0.5 on the
reference's real 13-class sample must stay within +/-0.5 points of the
unquantized number, scored on the committed 300-epoch overfit
checkpoint through the identical decode + NMS + evaluator path.

Run (TPU or CPU):
  python -m yolov3_tensorflow_tpu.tools.quant_gate \
      --checkpoint models/resnet-18-radam-aug-13c
"""
from __future__ import annotations

import argparse

from .map_parity import SAMPLE, _score


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--checkpoint", default="models/resnet-18-radam-aug-13c")
    a = p.parse_args(argv)

    from ..config import Config
    from ..data.loader import Dataset
    from ..train.trainer import YOLOv3Trainer

    results = {}
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
        report = _score(cfg, lambda b: trainer.predict(b.images), ds)
        if quant == "int8" and not trainer._quant_vars:
            # predict silently falls back to the plain bf16 forward when
            # no conv passes the eligibility gate — "PASS" would then
            # certify a path that never ran
            print("FAIL: quant='int8' quantized nothing (no eligible "
                  "conv at this input size/backbone) — the gate cannot "
                  "certify an int8 path that never executed")
            return 2
        results[label] = report["mAP"]
        print(f"{label}  mAP@0.5 = {report['mAP']:.4f}")

    delta = abs(results["int8"] - results["bf16"])
    ok = delta <= 0.005  # 0.5 mAP points
    print(f"|delta| = {delta * 100:.2f} mAP points -> "
          f"{'PASS' if ok else 'FAIL'} (gate: 0.5)")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
