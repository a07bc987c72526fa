"""Offline tooling: k-means anchors, label-file validator, synthetic
dataset generator, model summaries, CLI config plumbing."""
import os
import sys
import tempfile

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))

from yolov3_tensorflow_tpu.tools.kmeans_anchors import (cluster_anchors,
                                                        iou_wh, mean_iou,
                                                        parse_boxes,
                                                        pareto_curve)


def test_kmeans_deterministic_and_sorted(sample_paths):
    boxes, classes = parse_boxes(sample_paths["label"])
    assert boxes.shape[1] == 2 and len(boxes) > 20
    c1, _ = cluster_anchors(boxes, k=6, seed=6)
    c2, _ = cluster_anchors(boxes, k=6, seed=6)
    np.testing.assert_allclose(c1, c2)
    areas = c1[:, 0] * c1[:, 1]
    assert (np.diff(areas) >= 0).all()  # sorted by area
    assert mean_iou(boxes, c1) > 0.5


def test_kmeans_iou_distance():
    boxes = np.asarray([[0.2, 0.2]])
    centers = np.asarray([[0.2, 0.2], [0.1, 0.2], [0.4, 0.4]])
    iou = iou_wh(boxes, centers)[0]
    np.testing.assert_allclose(iou, [1.0, 0.5, 0.25])


def test_pareto_curve_monotone(sample_paths):
    boxes, _ = parse_boxes(sample_paths["label"])
    centers, _ = cluster_anchors(boxes, k=6)
    pts = pareto_curve(boxes, centers)
    ratios = [r for _, r in pts]
    assert all(a >= b for a, b in zip(ratios, ratios[1:]))


def test_check_label_file(sample_paths, tmp_path):
    from yolov3_tensorflow_tpu.tools.check_label_file import check_label_file
    # append a line for a missing image: must be dropped
    src = tmp_path / "label.txt"
    with open(sample_paths["label"]) as f:
        content = f.read()
    src.write_text(content + "missing.jpg 0.5 0.5 0.1 0.1 0\n")
    out = check_label_file(str(src), sample_paths["images"],
                           str(tmp_path / "new.txt"))
    kept = open(out).read().strip().split("\n")
    assert len(kept) == len(content.strip().split("\n"))


def test_synthetic_dataset_roundtrips(tmp_path):
    from yolov3_tensorflow_tpu.config import Config
    from yolov3_tensorflow_tpu.data.loader import Dataset
    from yolov3_tensorflow_tpu.tools.make_synthetic_dataset import generate
    out = generate(str(tmp_path / "ds"), num_images=4, size=(128, 96))
    cfg = Config(input_image_size=(96, 128, 3), max_boxes=8, batch_size=2)
    ds = Dataset(cfg, os.path.join(out, "label.txt"),
                 os.path.join(out, "images"))
    b = next(ds.batches())
    assert b.images.shape == (2, 96, 128, 3)
    valid_rows = b.labels[b.labels[:, :, 0] >= 0]
    assert (valid_rows[:, 0:4] <= 1.0).all()  # normalized coords


def test_cli_build_config():
    import run as cli
    args = cli.main.__globals__  # noqa: F841 - ensure module importable
    import argparse
    ns = argparse.Namespace(
        mode="test", model_backbone="mobilenet-v2", optimizer="sgdm",
        train_label_path=None, train_set_dir=None, test_label_path="x.txt",
        test_set_dir="imgs", save_path=None, image_root_path=None,
        input_size="320x416", multi_scale="320x416,384x480",
        batch_size=16, epoch=5, class_num=7, max_boxes=None,
        rectified_coord_num=None, num_devices=2, confidence_thresh=0.25,
        nms_thresh=None, init_lr=None, no_augment=True, focal_loss=True,
        tiou_recall=False)
    cfg = cli.build_config(ns)
    assert cfg.mode == "test"
    assert cfg.model_backbone == "mobilenet-v2"
    assert cfg.input_image_size == (320, 416, 3)
    assert cfg.multi_scale_sizes == ((320, 416), (384, 480))
    assert cfg.class_num == 7 and cfg.batch_size == 16
    assert cfg.is_augment is False and cfg.is_focal_loss is True
    assert cfg.confidence_thresh == 0.25
    assert cfg.head_channel_nums == (36, 24, 36)  # B*(5+7)


def test_packaging_entry_point_resolves():
    """pyproject's console script must point at a real callable, and
    run.py must stay a faithful shim of the packaged CLI."""
    import importlib

    tomllib = pytest.importorskip("tomllib")  # stdlib from 3.11
    root = os.path.join(os.path.dirname(__file__), "..")
    with open(os.path.join(root, "pyproject.toml"), "rb") as fh:
        meta = tomllib.load(fh)
    mod_name, fn_name = meta["project"]["scripts"]["yolov3-tpu"].split(":")
    fn = getattr(importlib.import_module(mod_name), fn_name)
    assert callable(fn)
    import run as shim
    assert shim.main is fn  # the repo-root launcher is the same entry


def test_config_log_destinations_follow_log_dir():
    """One knob moves ALL run logs: tensorboard_dir must honor log_dir
    (previously hardcoded 'logs', splitting artifacts across two trees
    when log_dir was overridden) while keeping the reference's
    root_path prefix (configs.py:88-92)."""
    from yolov3_tensorflow_tpu.config import Config
    cfg = Config(log_dir="runlogs", root_path="base")
    assert cfg.log_path.startswith("runlogs" + os.sep)
    assert cfg.tensorboard_dir.startswith(os.path.join("base", "runlogs"))
    # absolute log_dir overrides root_path for both (os.path.join)
    cfg2 = Config(log_dir="/data/logs", root_path="base")
    assert cfg2.log_path.startswith("/data/logs")
    assert cfg2.tensorboard_dir.startswith("/data/logs")


def test_hlo_stats_aggregation_and_format():
    """profiler.aggregate_hlo_stats / format_op_table on a synthetic
    xprof gviz table (the hlo_stats schema the TPU workflow parses)."""
    from yolov3_tensorflow_tpu.utils.profiler import (aggregate_hlo_stats,
                                                      format_op_table)
    table = {
        "cols": [{"id": "hlo_op_name"}, {"id": "category"},
                 {"id": "total_time"}, {"id": "model_flop_rate"},
                 {"id": "occurrences"}, {"id": "hlo_op_expression"}],
        "rows": [
            {"c": [{"v": "fusion.1"}, {"v": "convolution fusion"},
                   {"v": "1000"}, {"v": "150000"}, {"v": "5"},
                   {"v": "%fusion.1 = ..."}]},
            {"c": [{"v": "fusion.2"}, {"v": "convolution fusion"},
                   {"v": "500"}, {"v": "90000"}, {"v": "5"}, None]},
            {"c": [{"v": "copy.1"}, {"v": "copy"}, {"v": "250"},
                   None, {"v": "5"}, {"v": ""}]},
        ],
    }
    by_cat, ops = aggregate_hlo_stats(table)
    assert by_cat == {"convolution fusion": 1500.0, "copy": 250.0}
    assert [o[2] for o in ops] == ["fusion.1", "fusion.2", "copy.1"]
    assert ops[0][3] == 150000.0
    text = format_op_table(by_cat, ops, top_n=2, steps=5)
    assert "0.35 ms/step" in text       # total 1750us / 5 steps
    assert "convolution fusion" in text
    assert "fusion.1" in text and "copy.1" not in text  # top_n=2
    # zero-time rows (truncated capture) must format, not divide by zero
    assert "0.0%" in format_op_table({"copy": 0.0}, []).replace(" ", "")


def test_summarize_models_svg(tmp_path):
    """--svg_dir renders a per-backbone architecture diagram (the
    reference commits plot_model SVGs, images/*.svg) whose boxes come
    from the live flax module tree under eval_shape."""
    import xml.dom.minidom

    from yolov3_tensorflow_tpu.tools.summarize_models import (
        _layer_rows, render_svg)

    rows = _layer_rows("resnet-18", (96, 128), 13)
    names = [r[1] for r in rows]
    assert "backbone/Conv_0" in names
    assert any(n.startswith("head_out") for n in names)
    assert "backbone" not in names  # containers filtered
    conv0 = next(r for r in rows if r[1] == "backbone/Conv_0")
    assert conv0[2] == (1, 48, 64, 64)      # stem output shape
    assert conv0[3] == 3 * 3 * 3 * 64       # stem kernel params

    svg = render_svg("resnet-18", (96, 128), rows)
    xml.dom.minidom.parseString(svg)        # well-formed
    assert "backbone/Conv_0 +BN" in svg
    assert "head_out_8" in svg


def test_roofline_report_and_stream_parse():
    """tools/roofline: HLO-expression stream parsing (memory-space
    S(k) exclusion, tuple outputs) and the per-op max/sum roofline
    bounds on synthetic hlo_stats rows — the audit that closed the
    round-3 'measured local optimum' question (PERF.md round 4)."""
    from yolov3_tensorflow_tpu.tools.roofline import (
        format_report, parse_expression_streams, roofline_report)

    expr = ("%f = bf16[64,104,104,64]{3,0,2,1:T(8,128)(2,1)} "
            "fusion(bf16[64,104,104,64]{3,0,2,1:T(8,128)(2,1)} %copy, "
            "bf16[3,3,64,64]{3,2,1,0:T(8,128)(2,1)S(1)} %w), "
            "kind=kOutput")
    s = parse_expression_streams(expr)
    assert [(x[0], x[4]) for x in s] == [("out", False), ("in", False),
                                         ("in", True)]
    assert s[0][3] == 64 * 104 * 104 * 64 * 2  # bf16 bytes
    tup = ("%g = (bf16[8,16]{1,0:T(8,128)(2,1)}, f32[16]{0:T(128)}) "
           "fusion(f32[8,16]{1,0} %a), kind=kLoop")
    assert [x[0] for x in parse_expression_streams(tup)] == \
        ["out", "out", "in"]

    rows = [
        # 5 occurrences over 5 steps; 150 TFLOP/s measured, low BW ->
        # compute-bound; bound = flops/peak
        {"program_id": "1", "hlo_op_name": "conv",
         "category": "convolution fusion", "occurrences": 5,
         "total_time": 5000.0, "total_self_time": 5000.0,
         "model_flop_rate": 150000.0, "hbm_bw": 100.0,
         "bound_by": "Compute", "hlo_op_expression": expr},
        # pure-bandwidth op at ~537 GB/s
        {"program_id": "1", "hlo_op_name": "copy",
         "category": "data formatting", "occurrences": 5,
         "total_time": 1000.0, "total_self_time": 1000.0,
         "model_flop_rate": 0.0, "hbm_bw": 500.0, "bound_by": "HBM",
         "hlo_op_expression": ""},
        # a different (smaller) program — the scalar fetch — must be
        # excluded by the dominant-program filter
        {"program_id": "2", "hlo_op_name": "other", "category": "x",
         "occurrences": 1, "total_time": 50.0, "total_self_time": 50.0,
         "model_flop_rate": 0.0, "hbm_bw": 0.0,
         "hlo_op_expression": ""},
    ]
    rep = roofline_report(rows, steps=5, flop_peak_tflops=197.0,
                          hbm_peak_gbs=819.0)
    assert [o["name"] for o in rep["ops"]] == ["conv", "copy"]
    conv = rep["ops"][0]
    assert abs(conv["tflops_rate"] - 150.0) < 1e-6
    # max bound is the flop phase; sum bound adds the memory phase
    assert abs(conv["bound_ms"] - 1.0 * 150 / 197) < 1e-3
    assert conv["sum_bound_ms"] > conv["bound_ms"]
    assert 0 < conv["pct_of_bound"] < conv["pct_of_sum_bound"]
    # stream attribution: measured bytes split over non-VMEM shapes
    streams = {(s["dims"], s["direction"]): s for s in rep["streams"]}
    assert ("64,104,104,64", "out") in streams
    assert ("3,3,64,64", "in") not in streams  # VMEM-pinned
    text = format_report(rep, top=5, threshold=0.85)
    assert "program totals" in text and "conv" in text
    assert "serial-phase" in text


def test_step_timer_reset_clears_samples():
    """reset() between phases must drop phase-1 samples (previously it
    only re-based the clock, mixing phases in summary())."""
    from yolov3_tensorflow_tpu.utils.profiler import StepTimer
    t = StepTimer(warmup=0)
    t.step(4)
    t.step(4)
    t.reset()
    assert t.summary() == {}
    t.step(8)
    assert t.summary()["steps"] == 1


def test_cli_derives_steps_per_epoch(tmp_path):
    """Without --train_set_size the epoch length must come from the
    ACTUAL dataset (ceil(len/batch)), not the config default sized for
    the 20-image fixture — a real corpus would otherwise silently run
    1-batch "epochs"."""
    import numpy as np
    from PIL import Image as PILImage

    import run as cli
    from yolov3_tensorflow_tpu.config import Config

    imgdir = tmp_path / "images"
    imgdir.mkdir()
    lines = []
    for i in range(5):
        PILImage.fromarray(
            np.zeros((16, 24, 3), np.uint8)).save(str(imgdir / f"i{i}.jpg"))
        lines.append(f"i{i}.jpg 0.5 0.5 0.4 0.4 0")
    label = tmp_path / "label.txt"
    label.write_text("\n".join(lines) + "\n")
    cfg = Config(input_image_size=(32, 32, 3), batch_size=2, max_boxes=4,
                 class_num=13, train_label_path=str(label),
                 train_set_dir=str(imgdir))

    class FakeTrainer:
        spe = "unset"
        input_shardings = None  # run.train feeds device_prefetch with it

        def train(self, it, val_batches=None, steps_per_epoch=None,
                  epoch_callback=None):
            self.spe = steps_per_epoch

    ft = FakeTrainer()
    cli.train(cfg, ft)                      # derive: ceil(5/2) = 3
    assert ft.spe == 3
    cli.train(cfg, ft, derive_steps=False)  # explicit --train_set_size
    assert ft.spe is None


def test_generate_logger_idempotent(tmp_path):
    """A second call (tests/embedders re-running the CLI flow) must not
    stack duplicate handlers — every line would log 2, 3, ... times."""
    import logging

    from yolov3_tensorflow_tpu.utils.logger import generate_logger

    path = str(tmp_path / "log.txt")
    before = len(logging.getLogger().handlers)
    root = generate_logger(path)
    n1 = len(root.handlers)
    generate_logger(path)
    assert len(root.handlers) == n1
    # cleanup: drop the handlers this test added
    for h in list(root.handlers)[before:]:
        root.removeHandler(h)
        h.close()


def test_coco_to_labels_roundtrip(tmp_path):
    """COCO JSON -> label.txt: corner+size boxes become normalized
    center/size, sparse category ids densify in ascending order,
    iscrowd/degenerate boxes drop, and the output parses through the
    real Dataset loader."""
    import json

    from yolov3_tensorflow_tpu.data.loader import parse_label_file
    from yolov3_tensorflow_tpu.tools import coco_to_labels

    coco = {
        "images": [
            {"id": 7, "file_name": "a.jpg", "width": 200, "height": 100},
            {"id": 9, "file_name": "b.jpg", "width": 100, "height": 100},
        ],
        # sparse ids 3 and 18 -> dense 0 and 1 (ascending id order)
        "categories": [{"id": 18, "name": "dog"}, {"id": 3, "name": "cat"}],
        "annotations": [
            # a.jpg: 50x20 box at (100, 40) -> cx=(100+25)/200, cy=0.5
            {"image_id": 7, "category_id": 18, "bbox": [100, 40, 50, 20]},
            {"image_id": 7, "category_id": 3, "bbox": [0, 0, 20, 10]},
            # crowd region and zero-area box must drop
            {"image_id": 9, "category_id": 3, "bbox": [1, 1, 5, 5],
             "iscrowd": 1},
            {"image_id": 9, "category_id": 3, "bbox": [10, 10, 0, 5]},
        ],
    }
    src = tmp_path / "inst.json"
    src.write_text(json.dumps(coco))
    out = tmp_path / "label.txt"
    coco_to_labels.main([str(src), "--out", str(out), "--keep_empty"])

    assert (tmp_path / "class.txt").read_text() == "cat\ndog\n"
    ex = parse_label_file(str(out), str(tmp_path))
    assert [os.path.basename(e.path) for e in ex] == ["a.jpg", "b.jpg"]
    a, b = ex[0].labels, ex[1].labels
    assert b.shape == (0, 5)  # both of b's boxes dropped, row kept
    np.testing.assert_allclose(
        a, [[0.625, 0.5, 0.25, 0.2, 1.0],      # dog -> dense 1
            [0.05, 0.05, 0.1, 0.1, 0.0]],      # cat -> dense 0
        atol=1e-6)


def test_coco_to_labels_orphans_and_whitespace_names(tmp_path):
    """Malformed-but-real COCO inputs must degrade gracefully: an
    annotation pointing at a missing image or an unlisted category_id
    drops (no KeyError), and a file_name containing whitespace is
    skipped with a warning — label.txt rows are whitespace-split
    (loader.py:63), so such a path would shear the row into garbage."""
    import json

    from yolov3_tensorflow_tpu.tools import coco_to_labels

    coco = {
        "images": [
            {"id": 1, "file_name": "ok.jpg", "width": 10, "height": 10},
            {"id": 2, "file_name": "has space.jpg", "width": 10,
             "height": 10},
        ],
        "categories": [{"id": 5, "name": "cat"}],
        "annotations": [
            {"image_id": 1, "category_id": 5, "bbox": [1, 1, 4, 4]},
            # orphan image id and orphan category id: drop, don't crash
            {"image_id": 99, "category_id": 5, "bbox": [1, 1, 4, 4]},
            {"image_id": 1, "category_id": 77, "bbox": [1, 1, 4, 4]},
            # lands on the whitespace-named image -> whole row skipped
            {"image_id": 2, "category_id": 5, "bbox": [2, 2, 4, 4]},
        ],
    }
    lines, names = coco_to_labels.convert(coco, keep_empty=True)
    assert names == ["cat"]
    assert len(lines) == 1 and lines[0].startswith("ok.jpg ")
    assert all("has space" not in ln for ln in lines)


def test_cli_stop_monitor_and_val_flags():
    """--stop_monitor plumbs through build_config (argparse rejects
    unknown names via choices); default stays the reference's 'loss'."""
    import argparse

    import run as cli

    import pytest

    cfg = cli.build_config(argparse.Namespace(stop_monitor="val_loss"))
    assert cfg.stop_monitor == "val_loss"
    assert cli.build_config(argparse.Namespace()).stop_monitor == "loss"
    # the argparse choices= layer constrains the vocabulary
    with pytest.raises(SystemExit):
        cli.main(["--stop_monitor", "bogus"])


def test_cli_map_style_flag():
    """--map_style plumbs through build_config; default stays 'voc'
    (the Cartucho-convention parity metric)."""
    import argparse

    import run as cli

    import pytest

    assert cli.build_config(argparse.Namespace()).map_style == "voc"
    cfg = cli.build_config(argparse.Namespace(map_style="coco"))
    assert cfg.map_style == "coco"
    with pytest.raises(SystemExit):
        cli.main(["--map_style", "pascal"])


def test_cli_grad_accum_flag():
    import argparse

    import run as cli

    assert cli.build_config(argparse.Namespace()).grad_accum_steps == 1
    cfg = cli.build_config(argparse.Namespace(grad_accum_steps=4))
    assert cfg.grad_accum_steps == 4


def test_lr_range_analyze():
    """analyze(): minimum of the smoothed curve, decade-below
    suggestion, and divergence point."""
    import numpy as np

    from yolov3_tensorflow_tpu.tools.lr_range_test import analyze, smooth

    lrs = np.logspace(-6, -1, 50)
    # V-shaped loss with a blow-up tail: min at index 30
    losses = np.concatenate([np.linspace(10, 2, 30),
                             np.linspace(2, 40, 20)])
    r = analyze(lrs, losses, window=1, divergence_ratio=4.0)
    assert r["lr_at_min"] == lrs[29] or r["lr_at_min"] == lrs[30]
    np.testing.assert_allclose(r["suggested"], r["lr_at_min"] / 10)
    assert r["diverged_at"] is not None and r["diverged_at"] > r["lr_at_min"]
    # smoothing: trailing mean over full+partial windows
    np.testing.assert_allclose(smooth(np.asarray([1.0, 3.0, 5.0]), 2),
                               [1.0, 2.0, 4.0])


def test_lr_range_test_cli(tmp_path):
    """End-to-end sweep on a synthetic set: CSV written, lr column is a
    geometric ramp, recommendation inside the sweep range."""
    import numpy as np

    from yolov3_tensorflow_tpu.tools.lr_range_test import main
    from yolov3_tensorflow_tpu.tools.make_synthetic_dataset import generate

    out_set = str(tmp_path / "set")
    generate(out_set, 6, (128, 96), seed=5)
    csv = str(tmp_path / "range.csv")
    rc = main(["--label_path", f"{out_set}/label.txt",
               "--image_dir", f"{out_set}/images",
               "--class_num", "3", "--batch_size", "2",
               "--num_devices", "1",
               "--input_size", "96x128", "--steps", "6",
               "--min_lr", "1e-7", "--max_lr", "1e-3",
               "--no_augment", "--out", csv])
    assert rc == 0
    rows = open(csv).read().strip().splitlines()
    assert rows[0] == "step,lr,loss,smoothed"
    data = np.array([[float(v) for v in r.split(",")] for r in rows[1:]])
    assert len(data) >= 2
    lrs = data[:, 1]
    assert (np.diff(lrs) > 0).all(), "lr must ramp up monotonically"
    np.testing.assert_allclose(lrs[0], 1e-7, rtol=1e-3)
    assert np.isfinite(data[:, 2]).all()


def _voc_xml(filename, w, h, objects, size=True):
    objs = "".join(
        f"<object><name>{n}</name><difficult>{d}</difficult>"
        f"<bndbox><xmin>{x0}</xmin><ymin>{y0}</ymin>"
        f"<xmax>{x1}</xmax><ymax>{y1}</ymax></bndbox></object>"
        for n, x0, y0, x1, y1, d in objects)
    sz = (f"<size><width>{w}</width><height>{h}</height>"
          f"<depth>3</depth></size>") if size else ""
    return (f"<annotation><filename>{filename}</filename>{sz}{objs}"
            "</annotation>")


def test_voc_to_labels_roundtrip(tmp_path):
    """VOC XML -> label.txt: corner boxes become normalized center/size,
    names densify sorted, difficult/degenerate objects drop, and the
    output parses through the real Dataset loader (companion of the
    COCO converter test above)."""
    from yolov3_tensorflow_tpu.data.loader import parse_label_file
    from yolov3_tensorflow_tpu.tools import voc_to_labels

    ann = tmp_path / "Annotations"
    ann.mkdir()
    # a.jpg 200x100: dog box (100,40)-(150,60) -> cx .625 cy .5 w .25 h .2
    (ann / "a.xml").write_text(_voc_xml("a.jpg", 200, 100, [
        ("dog", 100, 40, 150, 60, 0),
        ("cat", 0, 0, 20, 10, 0),
        ("cat", 5, 5, 9, 9, 1),        # difficult: dropped by default
        ("cat", 30, 30, 30, 45, 0),    # zero width: dropped
    ]))
    # b.xml has no boxes left -> row kept only via --keep_empty
    (ann / "b.xml").write_text(_voc_xml("b.jpg", 100, 100, []))
    out = tmp_path / "label.txt"
    voc_to_labels.main([str(ann), "--out", str(out), "--keep_empty"])

    assert (tmp_path / "class.txt").read_text() == "cat\ndog\n"
    ex = parse_label_file(str(out), str(tmp_path))
    assert [os.path.basename(e.path) for e in ex] == ["a.jpg", "b.jpg"]
    a, b = ex[0].labels, ex[1].labels
    assert b.shape == (0, 5)
    np.testing.assert_allclose(
        a, [[0.625, 0.5, 0.25, 0.2, 1.0],   # dog -> dense 1
            [0.05, 0.05, 0.1, 0.1, 0.0]],   # cat -> dense 0
        atol=1e-6)


def test_voc_to_labels_edge_cases(tmp_path):
    """Fixed --class_list mapping, unlisted-name drop, whitespace file
    names, missing <size>, clamping, keep_difficult."""
    from yolov3_tensorflow_tpu.tools.voc_to_labels import (convert,
                                                           parse_annotation)

    # fixed class list: ids follow the list, unlisted names drop
    parsed = [parse_annotation(_voc_xml("a.jpg", 100, 100, [
        ("dog", 0, 0, 10, 10, 0),
        ("bird", 0, 0, 10, 10, 0),          # not in the list
        ("cat", -5, -5, 10, 10, 0),         # clamps to (0,0)-(10,10)
        ("cat", 2, 2, 8, 8, 1),             # difficult, kept below
    ]))]
    lines, names = convert(parsed, class_names=["dog", "cat"],
                           keep_difficult=True)
    assert names == ["dog", "cat"]
    fields = lines[0].split()
    assert fields[0] == "a.jpg"
    rows = np.array(fields[1:], float).reshape(-1, 5)
    assert rows.shape == (3, 5)             # bird dropped
    np.testing.assert_allclose(rows[0], [0.05, 0.05, 0.1, 0.1, 0])
    np.testing.assert_allclose(rows[1], [0.05, 0.05, 0.1, 0.1, 1])

    # whitespace file name and missing <size> both skip the image
    ws = parse_annotation(_voc_xml("has space.jpg", 100, 100,
                                   [("dog", 0, 0, 10, 10, 0)]))
    nosz = parse_annotation(_voc_xml("c.jpg", 0, 0,
                                     [("dog", 0, 0, 10, 10, 0)],
                                     size=False))
    lines, _ = convert([ws, nosz], class_names=["dog"], keep_empty=True)
    assert lines == []

    # <filename> absent falls back to the XML stem
    name, _, _ = parse_annotation("<annotation><size><width>9</width>"
                                  "<height>9</height></size></annotation>",
                                  fallback_name="stem.jpg")
    assert name == "stem.jpg"
