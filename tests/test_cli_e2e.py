"""End-to-end CLI: the actual user surface (run.py main) driven
through train -> test -> predict on a synthetic dataset, mirroring the
reference's run.py mode dispatcher (reference run.py:123-181).

Everything runs in-process (conftest forces the CPU backend) inside a
tmp cwd so the derived log/checkpoint paths stay out of the repo."""
import glob
import os

import numpy as np
import pytest

import run as cli
from yolov3_tensorflow_tpu.tools.make_synthetic_dataset import generate


@pytest.fixture(scope="module")
def sample_set(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("cli_set"))
    generate(out, 8, (128, 96), seed=3)
    return out


def test_cli_train_test_predict(sample_set, tmp_path, monkeypatch, caplog):
    monkeypatch.chdir(tmp_path)
    ckpt = str(tmp_path / "ckpt")
    common = ["--input_size", "96x128", "--batch_size", "4",
              "--class_num", "3", "--max_boxes", "4",
              "--train_set_size", "8", "--checkpoint_dir", ckpt,
              "--num_devices", "1", "--no_augment"]

    import logging as _logging
    with caplog.at_level(_logging.INFO):
        cli.main(["--mode", "train", "--epoch", "2",
                  "--train_label_path",
                  os.path.join(sample_set, "label.txt"),
                  "--train_set_dir", os.path.join(sample_set, "images"),
                  # held-out val_loss per epoch (keras validation_data
                  # analog; the reference CLI never wires its val_set)
                  "--val_label_path", os.path.join(sample_set, "label.txt"),
                  # periodic held-out mAP: fires once, at epoch 2 of 2
                  "--val_map_every", "2",
                  *common])
    assert os.path.isdir(ckpt) and os.listdir(ckpt), "no checkpoint saved"
    map_logs = [r for r in caplog.records if "val mAP@0.5" in r.getMessage()]
    assert len(map_logs) == 1, "val_map_every=2 over 2 epochs -> one eval"

    out_dir = str(tmp_path / "out_test")
    report_dir = str(tmp_path / "map_report")
    cli.main(["--mode", "test", "--confidence_thresh", "0.1",
              "--test_label_path", os.path.join(sample_set, "label.txt"),
              "--test_set_dir", os.path.join(sample_set, "images"),
              "--save_path", out_dir,
              # Cartucho-style artifact directory (infer/map_report.py)
              "--map_report_dir", report_dir,
              "--class_name_path", os.path.join(sample_set, "class.txt"),
              *common])
    written = glob.glob(os.path.join(out_dir, "*.jpg"))
    assert len(written) == 8, written  # one visualization per image
    results = os.path.join(report_dir, "results.txt")
    assert os.path.getsize(results) > 0
    assert "mAP = " in open(results).read()
    assert os.path.getsize(os.path.join(report_dir, "mAP.png")) > 0
    # drawn output must be a valid image of the input size
    from PIL import Image
    img = np.asarray(Image.open(written[0]))
    assert img.shape[:2] == (96, 128)

    pred_dir = str(tmp_path / "out_pred")
    cli.main(["--mode", "predict", "--confidence_thresh", "0.1",
              "--image_root_path", os.path.join(sample_set, "images"),
              "--save_path", pred_dir, *common])
    assert len(glob.glob(os.path.join(pred_dir, "*.jpg"))) == 8


# BASELINE.json "configs" rows 2-4: the named backbone x loss-variant
# combinations, driven through the REAL CLI (train then test = in-repo
# mAP eval), not just the model layer.  Row 1 (ResNet-18 train+test) is
# test_cli_train_test_predict above; row 5 (multi-backbone COCO on a
# pod slice) is hardware-gated — its pieces (multi-scale, device NMS,
# mesh DP) are covered by test_train/test_spatial/test_partition.
@pytest.mark.parametrize("backbone,extra", [
    ("mobilenet-v2", ["--focal_loss", "--optimizer", "radam"]),
    ("resnext-18", ["--tiou_recall"]),
    ("mixnet-18", []),
])
def test_cli_baseline_configs(sample_set, tmp_path, monkeypatch,
                              backbone, extra):
    monkeypatch.chdir(tmp_path)
    ckpt = str(tmp_path / f"ckpt_{backbone}")
    common = ["--input_size", "96x128", "--batch_size", "4",
              "--class_num", "3", "--max_boxes", "4",
              "--train_set_size", "8", "--checkpoint_dir", ckpt,
              "--num_devices", "1", "--no_augment",
              "--model_backbone", backbone, *extra]
    cli.main(["--mode", "train", "--epoch", "1",
              "--train_label_path", os.path.join(sample_set, "label.txt"),
              "--train_set_dir", os.path.join(sample_set, "images"),
              *common])
    assert os.path.isdir(ckpt) and os.listdir(ckpt), backbone
    out_dir = str(tmp_path / f"out_{backbone}")
    cli.main(["--mode", "test", "--confidence_thresh", "0.1",
              "--test_label_path", os.path.join(sample_set, "label.txt"),
              "--test_set_dir", os.path.join(sample_set, "images"),
              "--save_path", out_dir, *common])
    assert len(glob.glob(os.path.join(out_dir, "*.jpg"))) == 8


def test_cli_serving_deploy_flow(sample_set, tmp_path, monkeypatch):
    """The deployment story end-to-end through the CLI: train ->
    save_serving -> test/predict FROM the export (--serving_dir), with
    no checkpoint available to the consumer — the serving-client path
    the reference delegates to external TF-Serving (trainer.py:165-185,
    run.py:176-181)."""
    monkeypatch.chdir(tmp_path)
    ckpt = str(tmp_path / "ckpt")
    common = ["--input_size", "96x128", "--batch_size", "4",
              "--class_num", "3", "--max_boxes", "4",
              "--train_set_size", "8", "--num_devices", "1",
              "--no_augment"]
    cli.main(["--mode", "train", "--epoch", "1", "--checkpoint_dir", ckpt,
              "--train_label_path", os.path.join(sample_set, "label.txt"),
              "--train_set_dir", os.path.join(sample_set, "images"),
              *common])

    served = str(tmp_path / "served")
    cli.main(["--mode", "save_serving", "--serving_dir", served,
              "--checkpoint_dir", ckpt, *common])
    assert os.path.isfile(os.path.join(served, "model.stablehlo"))
    assert os.path.isfile(os.path.join(served, "signature.json"))

    # consumer runs: checkpoint_dir deliberately nonexistent — the
    # serving path must not construct a trainer or touch checkpoints
    out_dir = str(tmp_path / "out_serving")
    cli.main(["--mode", "test", "--confidence_thresh", "0.1",
              "--serving_dir", served,
              "--checkpoint_dir", str(tmp_path / "no_such_ckpt"),
              "--test_label_path", os.path.join(sample_set, "label.txt"),
              "--test_set_dir", os.path.join(sample_set, "images"),
              "--save_path", out_dir, *common])
    assert len(glob.glob(os.path.join(out_dir, "*.jpg"))) == 8

    pred_dir = str(tmp_path / "pred_serving")
    cli.main(["--mode", "predict", "--confidence_thresh", "0.1",
              "--serving_dir", served,
              "--checkpoint_dir", str(tmp_path / "no_such_ckpt"),
              "--image_root_path", os.path.join(sample_set, "images"),
              "--save_path", pred_dir, *common])
    assert len(glob.glob(os.path.join(pred_dir, "*.jpg"))) == 8

    # the export's fixed avals drive the input size: omitting
    # --input_size must DERIVE 96x128 from the signature (not letterbox
    # to the CLI default and die on an aval mismatch) ...
    no_size = [f for f in common if f not in
               ("--input_size", "96x128")]
    out2 = str(tmp_path / "out_derived")
    cli.main(["--mode", "test", "--confidence_thresh", "0.1",
              "--serving_dir", served,
              "--test_label_path", os.path.join(sample_set, "label.txt"),
              "--test_set_dir", os.path.join(sample_set, "images"),
              "--save_path", out2, *no_size])
    assert len(glob.glob(os.path.join(out2, "*.jpg"))) == 8
    # ... and a contradicting --input_size must fail fast with a clear
    # message, before any batch is decoded
    with pytest.raises(SystemExit, match="contradicts"):
        cli.main(["--mode", "test", "--serving_dir", served,
                  "--test_label_path",
                  os.path.join(sample_set, "label.txt"),
                  "--test_set_dir", os.path.join(sample_set, "images"),
                  "--input_size", "128x160",
                  *no_size])


def test_cli_test_refuses_fresh_init(sample_set, tmp_path, monkeypatch):
    """test/predict/save_* on a nonexistent checkpoint dir must fail
    fast (reference run.py:41-80 loads a trained model first) — not
    evaluate randomly-initialized weights to mAP ~0."""
    monkeypatch.chdir(tmp_path)
    with pytest.raises(SystemExit, match="no checkpoint restored"):
        cli.main(["--mode", "test",
                  "--checkpoint_dir", str(tmp_path / "missing"),
                  "--test_label_path",
                  os.path.join(sample_set, "label.txt"),
                  "--test_set_dir", os.path.join(sample_set, "images"),
                  "--input_size", "96x128", "--batch_size", "4",
                  "--class_num", "3", "--max_boxes", "4",
                  "--num_devices", "1"])


def test_cli_compiler_options_parse():
    """--compiler_options 'flag=value,...' parses into the hashable
    (flag, value) tuple form with int/bool coercion; '' = explicit ()."""
    import argparse

    from run import build_config

    ns = argparse.Namespace(
        compiler_options="xla_tpu_scoped_vmem_limit_kib=32768,"
                         "xla_tpu_enable_latency_hiding_scheduler=true")
    cfg = build_config(ns)
    assert cfg.compiler_options == (
        ("xla_tpu_scoped_vmem_limit_kib", 32768),
        ("xla_tpu_enable_latency_hiding_scheduler", True))
    assert build_config(
        argparse.Namespace(compiler_options="")).compiler_options == ()
    assert build_config(argparse.Namespace()).compiler_options is None


def test_cli_ema_decay_plumbs():
    """--ema_decay reaches Config (and the parser knows the flag —
    a non-float value dies in argparse, proving the flag is declared)."""
    import argparse

    import pytest

    from yolov3_tensorflow_tpu import cli

    cfg = cli.build_config(argparse.Namespace(ema_decay=0.999))
    assert cfg.ema_decay == 0.999
    assert cli.build_config(argparse.Namespace()).ema_decay == 0.0
    with pytest.raises(SystemExit):
        cli.main(["--ema_decay", "not-a-float"])
