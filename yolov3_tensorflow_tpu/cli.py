"""CLI entry point (reference: run.py:31-185) — installed as the
``yolov3-tpu`` console script; the repo-root ``run.py`` shim mirrors
the reference's launch convention.

Dispatches on mode: train, test, predict, save_pb, save_serving, serve
(a dynamic-batching HTTP inference server, infer/server.py).  Unlike
the reference (which requires editing configs.py, README.md:42), every
Config knob can be overridden from the command line.

Additions over the reference:
  * in-repo mAP@0.5 report in test mode (the reference leaves mAP to the
    external Cartucho/mAP tool, run.py:78-79)
  * --num_devices to size the data-parallel mesh (replaces
    gpu_num/visible_gpu)
  * --serving_dir: test/predict straight from a save_serving export (the
    serving-client path the reference delegates to external TF-Serving,
    trainer.py:165-185)
"""
from __future__ import annotations

import argparse
import glob
import logging
import os

import numpy as np


def build_config(args) -> "Config":
    from yolov3_tensorflow_tpu.config import Config
    cfg = Config()
    overrides = {}
    for field in ("mode", "model_backbone", "optimizer", "train_label_path",
                  "train_set_dir", "test_label_path", "test_set_dir",
                  "save_path", "image_root_path", "quant", "conv_backend",
                  "stem_backend", "augment_backend", "stop_monitor",
                  "map_style", "map_report_dir", "class_name_path",
                  "init_from"):
        v = getattr(args, field, None)
        if v is not None:
            overrides[field] = v
    for field in ("batch_size", "epoch", "class_num", "max_boxes",
                  "rectified_coord_num", "num_devices", "train_set_size",
                  "val_set_size", "spatial_partition", "grad_accum_steps"):
        v = getattr(args, field, None)
        if v is not None:
            overrides[field] = v
    for field in ("confidence_thresh", "nms_thresh", "init_lr",
                  "ema_decay"):
        v = getattr(args, field, None)
        if v is not None:
            overrides[field] = v
    # getattr like every other field: hand-built Namespaces (tests,
    # embedders) need not enumerate every flag
    input_size = getattr(args, "input_size", None)
    if input_size:
        h, w = (int(x) for x in input_size.split("x"))
        overrides["input_image_size"] = (h, w, 3)
    copts = getattr(args, "compiler_options", None)
    if copts is not None:
        # "flag=value,flag=value" -> ((flag, value), ...); values parse
        # as int/bool where they look like one ("" = explicitly none)
        pairs = []
        for item in filter(None, copts.split(",")):
            k, _, v = item.partition("=")
            if v.lower() in ("true", "false"):
                v = v.lower() == "true"
            elif v.lstrip("-").isdigit():
                v = int(v)
            pairs.append((k, v))
        overrides["compiler_options"] = tuple(pairs)
    multi_scale = getattr(args, "multi_scale", None)
    if multi_scale:
        sizes = tuple(tuple(int(v) for v in s.split("x"))
                      for s in multi_scale.split(","))
        overrides["multi_scale_sizes"] = sizes
    if getattr(args, "no_augment", False):
        overrides["is_augment"] = False
    # Boolean feature flags; getattr-with-default so a hand-built
    # Namespace (tests, embedders) need not enumerate every flag.
    for arg, field in (("focal_loss", "is_focal_loss"),
                       ("tiou_recall", "is_tiou_recall"),
                       ("giou_loss", "is_giou_loss"),
                       ("ghm", "is_gradient_harmonized"),
                       ("mixup", "is_mixup"),
                       ("gaussian_yolo", "is_gaussian_yolo"),
                       ("freeze_backbone", "freeze_backbone")):
        if getattr(args, arg, False):
            overrides[field] = True
    return cfg.replace(**overrides)


def train(cfg, trainer, derive_steps: bool = True,
          val_label_path=None, val_set_dir=None, val_map_every: int = 0):
    """(run.py:31-38)

    ``derive_steps``: without an explicit --train_set_size the epoch
    length comes from the ACTUAL dataset (ceil(len/batch)); keeping the
    config default (a 20-image fixture) on a real corpus would silently
    run 1-batch "epochs" and under-train by orders of magnitude.

    ``val_label_path``/``val_set_dir``: per-epoch val_loss over a
    held-out set (the trainer.train val_set capability the reference
    declares but never wires through its CLI — its run.py:37 passes
    val_set=None into trainer.py:99)."""
    import math

    import jax

    from yolov3_tensorflow_tpu.data.loader import Dataset
    logging.info("loading train set: %s", cfg.train_label_path)

    # Multi-host SPMD feeding: each process decodes a disjoint example
    # shard and ships batch/process_count images; device_prefetch
    # assembles the global batch (make_array_from_process_local_data).
    # Single-process (this CLI's usual case): shard is a no-op and the
    # sharded device_put still lands each batch shard directly on its
    # mesh device instead of round-tripping through device 0.
    procs = jax.process_count()
    shard = (jax.process_index(), procs) if procs > 1 else None
    local_bs = cfg.batch_size // procs if procs > 1 else None
    if procs > 1 and cfg.batch_size % procs:
        raise ValueError(f"batch_size {cfg.batch_size} does not divide "
                         f"over {procs} processes")

    def spe_for(ds):
        if not derive_steps:
            return None  # trainer uses cfg.steps_per_epoch
        spe = max(1, math.ceil(ds.global_size / cfg.batch_size))
        if spe != cfg.steps_per_epoch:
            logging.info("steps_per_epoch=%d derived from %d images "
                         "(pass --train_set_size to override)",
                         spe, ds.global_size)
        return spe

    def feed(ds):
        return ds.device_prefetch(batch_size=local_bs,
                                  shardings=trainer.input_shardings)

    val_batches = None
    if val_label_path:
        val_ds = Dataset(cfg, val_label_path,
                         val_set_dir or cfg.train_set_dir,
                         shuffle=False, shard=shard)
        if getattr(trainer.cfg, "val_set_size", None) != val_ds.global_size:
            # validation_steps derives from the ACTUAL held-out set, like
            # steps_per_epoch (ceil(len/batch), configs.py:82)
            trainer.cfg = trainer.cfg.replace(
                val_set_size=val_ds.global_size)
        # factory, not iterator: the trainer opens a FRESH stream each
        # epoch so every epoch scores the identical val window (keras
        # resets validation_data per epoch; a persistent repeat=True
        # stream drifts when batch does not divide the set)
        val_batches = lambda: feed(val_ds)  # noqa: E731
        logging.info("validation set: %s (%d images, %d steps/epoch)",
                     val_label_path, val_ds.global_size,
                     trainer.cfg.validation_steps)

    epoch_cb = None
    if val_label_path and val_map_every:
        # periodic held-out mAP (beyond the reference — detector users
        # track val mAP, not just val_loss); full decode+NMS+evaluator
        # pass over the val set every N epochs, logged + TB scalar
        from yolov3_tensorflow_tpu.infer.evaluator import score_dataset
        val_eval_ds = Dataset(cfg, val_label_path,
                              val_set_dir or cfg.train_set_dir,
                              is_test=True, shuffle=False)
        style = "@[.5:.95]" if cfg.map_style == "coco" else "@0.5"

        def epoch_cb(epoch):
            if (epoch + 1) % val_map_every:
                return None
            report = score_dataset(
                cfg, lambda b: trainer.predict(b.images), val_eval_ds,
                map_style=cfg.map_style)
            logging.info("  val mAP%s = %.4f", style, report["mAP"])
            if trainer.tb is not None:
                trainer.tb.scalar("val_mAP", report["mAP"], epoch)
            # the return feeds stop_monitor='val_map' (maximized by the
            # trainer); None on off-cadence epochs leaves patience alone
            return report["mAP"]

    if cfg.multi_scale_sizes:
        datasets = {
            tuple(hw): Dataset(cfg, cfg.train_label_path, cfg.train_set_dir,
                               dst_hw=tuple(hw), shard=shard)
            for hw in cfg.multi_scale_sizes}
        batches = {hw: feed(ds) for hw, ds in datasets.items()}
        # the val stream keeps ITS fixed --input_size while train sizes
        # cycle (eval_step retraces per shape), so val_loss stays
        # epoch-comparable across the size rotation
        trainer.train_multi_scale(
            batches, val_batches=val_batches,
            steps_per_epoch=spe_for(next(iter(datasets.values()))),
            epoch_callback=epoch_cb)
    else:
        ds = Dataset(cfg, cfg.train_label_path, cfg.train_set_dir,
                     shard=shard)
        trainer.train(feed(ds), val_batches=val_batches,
                      steps_per_epoch=spe_for(ds),
                      epoch_callback=epoch_cb)
    logging.info("training done")


def test(cfg, trainer):
    """Batch evaluation + visualization + in-repo mAP (run.py:41-80)."""
    from yolov3_tensorflow_tpu.data.loader import Dataset
    from yolov3_tensorflow_tpu.infer.evaluator import score_dataset

    ds = Dataset(cfg, cfg.test_label_path, cfg.test_set_dir, is_test=True,
                 shuffle=False)
    report = score_dataset(cfg, lambda b: trainer.predict(b.images), ds,
                           save_path=cfg.save_path,
                           map_style=cfg.map_style,
                           with_curves=bool(cfg.map_report_dir))
    if cfg.map_style == "coco":
        logging.info(
            "mAP@[.5:.95] = %.4f (mAP@0.5 = %.4f, mAP@0.75 = %.4f; "
            "per-class: %s)", report["mAP"], report.get("mAP@0.5", 0.0),
            report.get("mAP@0.75", 0.0), report["per_class"])
    else:
        logging.info("mAP@0.5 = %.4f (per-class: %s)", report["mAP"],
                     report["per_class"])
    if cfg.map_report_dir:
        # Cartucho-style artifact directory (the external tool's
        # output/ the reference points its users at, run.py:78-79)
        from yolov3_tensorflow_tpu.infer.map_report import (
            load_class_names, write_map_report)
        names = (load_class_names(cfg.class_name_path)
                 if cfg.class_name_path else None)
        write_map_report(report, cfg.map_report_dir, names)
        logging.info("mAP report artifacts written to %s",
                     cfg.map_report_dir)
    return report


def predict(cfg, trainer):
    """Single-image prediction over a directory (run.py:83-120)."""
    from yolov3_tensorflow_tpu.data.loader import load_image
    from yolov3_tensorflow_tpu.infer.postprocess import (
        YOLOv3PostProcessor, resize_boxes, visualize)

    if not cfg.image_root_path or not os.path.isdir(cfg.image_root_path):
        raise ValueError("image_root_path missing or not a directory")
    os.makedirs(cfg.save_path, exist_ok=True)
    post = YOLOv3PostProcessor(cfg)
    dst_hw = (cfg.input_image_size[0], cfg.input_image_size[1])
    input_box_size = np.array([dst_hw[1], dst_hw[0]] * 2, np.float64)
    paths = sorted(glob.glob(os.path.join(cfg.image_root_path, "*.jpg")))
    for path in paths:
        img = load_image(path, dst_hw)
        heads = trainer.predict(img[None])
        head_boxes = post.process(heads)[0]
        in_boxes = resize_boxes(head_boxes, input_box_size)
        out = os.path.join(cfg.save_path, os.path.basename(path))
        visualize(img, in_boxes, input_box_size, out)
        logging.info("predicted %s -> %s", path, out)


def serve(cfg, model, args):
    """Dynamic-batching HTTP server over a trained model (infer/server.py).
    ``model`` duck-types ``predict(uint8 batch) -> raw heads`` — a live
    trainer or a ServingModel export consumer."""
    from yolov3_tensorflow_tpu.infer.server import InferenceServer

    if cfg.quant == "int8" and hasattr(model, "calibrate"):
        # trainer.predict auto-calibrates activation scales on the FIRST
        # batch it sees — which in serve mode would be the zero-filled
        # warmup batch.  Calibrate on real images up front instead.
        if not (cfg.test_label_path and os.path.isfile(cfg.test_label_path)):
            raise SystemExit(
                "--mode serve --quant int8 needs calibration data: pass "
                "--test_label_path/--test_set_dir (scales are calibrated "
                "on one batch before serving), or serve a pre-calibrated "
                "save_serving export via --serving_dir")
        from yolov3_tensorflow_tpu.data.loader import Dataset
        ds = Dataset(cfg, cfg.test_label_path, cfg.test_set_dir,
                     is_test=True, shuffle=False)
        batch = next(ds.batches(repeat=False))
        model.calibrate(batch.images)
        logging.info("serve: int8 scales calibrated on %d images",
                     len(batch.paths))

    srv = InferenceServer(
        cfg, model.predict, host=args.serve_host, port=args.port,
        max_batch=args.max_batch, batch_timeout_ms=args.batch_timeout_ms)
    srv.start(warmup=not args.no_warmup)
    srv.serve_forever()


def main(argv=None):
    p = argparse.ArgumentParser(description="TPU-native YOLOv3")
    p.add_argument("--mode", default=None,
                   choices=["train", "test", "predict", "save_pb",
                            "save_serving", "serve"])
    p.add_argument("--model_backbone", default=None)
    p.add_argument("--optimizer", default=None)
    p.add_argument("--train_label_path", default=None)
    p.add_argument("--train_set_dir", default=None)
    p.add_argument("--val_label_path", default=None,
                   help="held-out label.txt: per-epoch val_loss "
                        "(keras validation_data analog)")
    p.add_argument("--val_set_dir", default=None,
                   help="val image root (default: --train_set_dir)")
    p.add_argument("--val_map_every", type=int, default=0,
                   help="evaluate held-out mAP every N epochs (0 = off; "
                        "needs --val_label_path; style per --map_style)")
    p.add_argument("--stop_monitor", default=None,
                   choices=("loss", "val_loss", "val_map"),
                   help="early-stop metric: 'loss' (reference default), "
                        "'val_loss' (needs --val_label_path), or "
                        "'val_map' (maximize held-out mAP; needs "
                        "--val_label_path and --val_map_every)")
    p.add_argument("--test_label_path", default=None)
    p.add_argument("--test_set_dir", default=None)
    p.add_argument("--map_style", default=None, choices=("voc", "coco"),
                   help="test-mode metric: 'voc' = mAP@0.5 (Cartucho "
                        "convention) or 'coco' = mAP@[.5:.95]")
    p.add_argument("--map_report_dir", default=None,
                   help="test mode: write Cartucho-style report "
                        "artifacts (results.txt, per-class PR curves, "
                        "AP/GT bar charts) into this directory")
    p.add_argument("--class_name_path", default=None,
                   help="class.txt-convention names (one per line) "
                        "labeling the mAP report; default: class_<id>")
    p.add_argument("--save_path", default=None)
    p.add_argument("--image_root_path", default=None)
    p.add_argument("--input_size", default=None, help="HxW, e.g. 384x480")
    p.add_argument("--multi_scale", default=None,
                   help="comma-separated HxW list, e.g. 320x416,384x480")
    p.add_argument("--batch_size", type=int, default=None)
    p.add_argument("--grad_accum_steps", type=int, default=None,
                   help="average gradients over this many micro-batches "
                        "per optimizer update (effective batch = "
                        "batch_size * this)")
    p.add_argument("--ema_decay", type=float, default=None,
                   help="weight-EMA decay (e.g. 0.999; 0 = off).  When "
                        "on, eval/test/predict/exports score the EMA "
                        "shadow weights; pass the same flag at "
                        "test/predict time to use the shadow")
    p.add_argument("--init_from", default=None,
                   help="transfer-learning init: checkpoint directory of "
                        "ANOTHER run; shape-matching leaves are copied "
                        "into the fresh init (heads with a different "
                        "class_num keep their fresh init).  Ignored when "
                        "this run resumes its own checkpoint")
    p.add_argument("--freeze_backbone", action="store_true",
                   help="fine-tune mode: train only the detection heads "
                        "(backbone weights frozen; BN statistics still "
                        "adapt)")
    p.add_argument("--epoch", type=int, default=None)
    p.add_argument("--class_num", type=int, default=None)
    p.add_argument("--max_boxes", type=int, default=None)
    p.add_argument("--rectified_coord_num", type=int, default=None)
    p.add_argument("--num_devices", type=int, default=None)
    p.add_argument("--spatial_partition", type=int, default=None,
                   help="shard image height over this many devices "
                        "(mesh model axis; XLA GSPMD halo exchange)")
    p.add_argument("--train_set_size", type=int, default=None,
                   help="images per epoch (sets steps_per_epoch)")
    p.add_argument("--val_set_size", type=int, default=None)
    p.add_argument("--confidence_thresh", type=float, default=None)
    p.add_argument("--nms_thresh", type=float, default=None)
    p.add_argument("--init_lr", type=float, default=None)
    p.add_argument("--no_augment", action="store_true")
    p.add_argument("--focal_loss", action="store_true")
    p.add_argument("--tiou_recall", action="store_true")
    p.add_argument("--giou_loss", action="store_true",
                   help="GIOU box regression (reference roadmap item)")
    p.add_argument("--ghm", action="store_true",
                   help="GHM-C confidence loss (reference roadmap item)")
    p.add_argument("--mixup", action="store_true",
                   help="detection mixup (reference roadmap item)")
    p.add_argument("--gaussian_yolo", action="store_true",
                   help="Gaussian YOLO uncertainty head (roadmap item)")
    p.add_argument("--quant", default=None, choices=["none", "int8"],
                   help="post-training int8 inference (test/predict "
                        "modes): eligible convs run int8 with scales "
                        "calibrated on the first batch")
    p.add_argument("--conv_backend", default=None,
                   choices=["auto", "xla", "winograd"],
                   help="conv algorithm (default auto = the measured "
                        "per-shape winner; PERF.md)")
    p.add_argument("--stem_backend", default=None,
                   choices=["auto", "xla", "fused"],
                   help="stem BN+maxpool+relu path (default auto = "
                        "fused Pallas kernel for TPU training)")
    p.add_argument("--augment_backend", default=None,
                   choices=["auto", "xla", "fused"],
                   help="noise-stage augment path (default auto = xla, "
                        "the measured winner; PERF.md)")
    p.add_argument("--compiler_options", default=None,
                   help="XLA compiler options for the jitted steps, "
                        "'flag=value,flag=value' (the GPU session-config "
                        "analog; default: measured per-hardware best — "
                        "scoped VMEM 32 MiB on TPU; pass '' for none)")
    p.add_argument("--serving_dir", default=None,
                   help="test/predict from a save_serving export instead "
                        "of a checkpoint (the serving-client path: no "
                        "Python model code, no trainer); save_serving "
                        "mode writes here (default cfg.serving_model_dir)")
    p.add_argument("--port", type=int, default=8000,
                   help="serve mode: HTTP port (0 = ephemeral)")
    p.add_argument("--serve_host", default="127.0.0.1",
                   help="serve mode: bind address (0.0.0.0 to expose)")
    p.add_argument("--max_batch", type=int, default=64,
                   help="serve mode: request-coalescing batch cap "
                        "(compiled shape ladder = powers of two up to "
                        "this; b64 is the measured v5e serving peak)")
    p.add_argument("--batch_timeout_ms", type=float, default=2.0,
                   help="serve mode: max wait after the first queued "
                        "request before dispatching a partial batch "
                        "(2 ms from the measured-ladder sim, round 5: "
                        "5 ms sits on a heavy-load queue resonance — "
                        "p99 150-850 ms — while 2 ms holds both the "
                        "light-load p50 and the heavy-load p99)")
    p.add_argument("--no_warmup", action="store_true",
                   help="serve mode: skip compiling the batch-shape "
                        "ladder before opening the socket")
    p.add_argument("--cpu", action="store_true",
                   help="force the CPU backend")
    p.add_argument("--checkpoint_dir", default=None)
    p.add_argument("--tensorboard", action="store_true")
    args = p.parse_args(argv)

    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    cfg = build_config(args)
    from yolov3_tensorflow_tpu.train.trainer import YOLOv3Trainer
    from yolov3_tensorflow_tpu.utils.logger import generate_logger

    generate_logger(cfg.log_path)
    import jax
    logging.info("jax %s devices=%s", jax.__version__, jax.devices())

    serving_dir = getattr(args, "serving_dir", None)
    if serving_dir and cfg.mode in ("test", "predict", "serve"):
        # serving-client path: inference from the deployed artifact
        # alone — no checkpoint discovery, no model build.  ServingModel
        # duck-types trainer.predict (uint8 batches, any size).
        from yolov3_tensorflow_tpu.infer.export import ServingModel
        model = ServingModel(serving_dir)
        logging.info("serving export loaded: %s (batch %d, heads %s)",
                     serving_dir, model.batch_size, model.head_names)
        # The export's avals fix the input size; the Dataset must
        # letterbox to IT, not to the CLI default.  Derive when the
        # user didn't pass --input_size, reject a contradiction early
        # (the aval mismatch it would cause is opaque).
        hw = tuple(int(x) for x in model.input_hw)
        if not getattr(args, "input_size", None):
            cfg = cfg.replace(input_image_size=(hw[0], hw[1],
                                                cfg.input_image_size[2]))
            logging.info("input size derived from export: %dx%d", *hw)
        elif tuple(cfg.input_image_size[:2]) != hw:
            raise SystemExit(
                f"--input_size {cfg.input_image_size[0]}x"
                f"{cfg.input_image_size[1]} contradicts the serving "
                f"export's fixed input {hw[0]}x{hw[1]} ({serving_dir}); "
                "drop the flag or re-export")
        if cfg.mode == "test":
            test(cfg, model)
        elif cfg.mode == "serve":
            serve(cfg, model, args)
        else:
            predict(cfg, model)
        return

    trainer = YOLOv3Trainer(cfg, enable_tensorboard=args.tensorboard,
                            checkpoint_dir=args.checkpoint_dir)
    if cfg.mode in ("test", "predict", "save_pb", "save_serving",
                    "serve") and int(trainer.state.step) == 0:
        # Inference from a fresh init scores mAP ~0 with garbage boxes;
        # fail fast like tools/map_parity.py:75 instead of silently
        # evaluating random weights (reference run.py:41-80 likewise
        # loads a trained model before test/predict).
        raise SystemExit(
            f"--mode {cfg.mode}: no checkpoint restored from "
            f"{trainer.ckpt.directory} (step 0 = fresh init); train "
            "first or pass --checkpoint_dir")
    if cfg.mode == "train":
        train(cfg, trainer,
              derive_steps=getattr(args, "train_set_size", None) is None,
              val_label_path=getattr(args, "val_label_path", None),
              val_set_dir=getattr(args, "val_set_dir", None),
              val_map_every=getattr(args, "val_map_every", 0) or 0)
    elif cfg.mode == "test":
        test(cfg, trainer)
    elif cfg.mode == "predict":
        predict(cfg, trainer)
    elif cfg.mode == "serve":
        serve(cfg, trainer, args)
    elif cfg.mode in ("save_pb", "save_serving"):
        if cfg.quant == "int8":
            # bake calibrated activation scales into the exported int8
            # graph: calibrate on the first test batch
            from yolov3_tensorflow_tpu.data.loader import Dataset
            ds = Dataset(cfg, cfg.test_label_path, cfg.test_set_dir,
                         is_test=True, shuffle=False)
            batch = next(ds.batches(repeat=False))
            trainer.calibrate(batch.images)
            logging.info("int8 export: calibrated on %d test images",
                         len(batch.paths))
        if cfg.mode == "save_pb":
            from yolov3_tensorflow_tpu.infer.export import save_frozen
            out = save_frozen(trainer, os.path.join(cfg.pb_model_dir,
                                                    cfg.type + ".stablehlo"))
            logging.info("frozen model saved: %s", out)
        else:
            from yolov3_tensorflow_tpu.infer.export import save_serving
            out = save_serving(trainer, serving_dir or cfg.serving_model_dir,
                               batch_size=getattr(args, "batch_size", None)
                               or 1)
            logging.info("serving model saved: %s", out)
    else:
        raise ValueError("Mode Error!")


if __name__ == "__main__":
    main()
