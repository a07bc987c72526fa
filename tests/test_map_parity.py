"""The BASELINE.md north star as MEASURED gates that run in EVERY
suite, fresh tree or not (round-3 verdict item 5).

* Self-labeled parity: ground truth is the deterministic fresh model's
  own detections (tools/map_parity.synth_label_file), so the |delta|
  between our inference path and the Keras reference rebuild is
  asserted without any trained checkpoint — the generating model
  scores mAP = 1.0 by construction and the gate isolates
  cross-framework fidelity of decode + NMS + evaluator + transplant.
* Self-labeled quant gate: same fixture, int8 PTQ vs bf16 (the int8
  path must actually engage — the tool fails if nothing quantizes).
* Checkpoint parity: when the (gitignored) trained 13-class overfit
  checkpoint is present, additionally assert the production 0.5-point
  gate on real labels (PARITY_MAP.md's measurement).
"""
import os

import pytest

tf = pytest.importorskip("tensorflow")

# oracle-gate subset: `python -m pytest tests/ -m quick -q`
# (self-labeled mAP parity + quant gates)
pytestmark = pytest.mark.quick

CKPT = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "models", "resnet-18-radam-aug-13c")


def test_map_parity_self_labeled(tmp_path):
    """Runs in a fresh tree: no checkpoint, no TPU, ~3 min CPU."""
    from yolov3_tensorflow_tpu.tools.map_parity import main
    rc = main(["--self_labeled", "--input_size", "224x288",
               "--images", "8", "--report", ""])
    assert rc == 0, "self-labeled |delta mAP| exceeded the gate"


def test_map_parity_self_labeled_mobilenet(tmp_path):
    """The gate is backbone-generic (keras_rebuild_for covers all
    five; the round-4 CLI sweep measured delta 0.00 on every one) —
    the suite additionally pins the most structurally different
    backbone.  Also regression-pins the coordinate-channel damping:
    mobilenet's random trunk drives t_wh into the exp clamp, and
    without damping 24/118 self-boxes failed their own roundtrip."""
    from yolov3_tensorflow_tpu.tools.map_parity import main
    rc = main(["--self_labeled", "--backbone", "mobilenet-v2",
               "--input_size", "224x288", "--images", "6",
               "--report", ""])
    assert rc == 0, "mobilenet self-labeled parity gate failed"


def test_quant_gate_self_labeled():
    """int8 PTQ path engages and stays within the adversarial-regime
    gate (see tools/quant_gate.py docstring) — every suite run."""
    from yolov3_tensorflow_tpu.tools.quant_gate import main
    rc = main(["--self_labeled"])
    assert rc == 0, "self-labeled quant gate failed (rc=%d)" % rc


def test_map_parity_vs_keras_reference(tmp_path):
    """The production 0.5-point gate on the trained checkpoint —
    asserted when the checkpoint is present.  A missing (gitignored)
    checkpoint is an environment precondition, reported as SKIP so
    suite counts show the trained-checkpoint gate did not run
    (ADVICE r4: xfail obscured that); the self-labeled gates above
    still assert the parity path every run."""
    if not os.path.isdir(CKPT):
        pytest.skip("trained 13-class checkpoint not present; "
                    "parity asserted by the self-labeled gate")
    from yolov3_tensorflow_tpu.tools.map_parity import main
    rc = main(["--checkpoint", CKPT,
               "--report", str(tmp_path / "parity.md")])
    assert rc == 0, "|delta mAP| exceeded 0.5 points (see report)"
