"""Export a framework checkpoint to a reference-architecture Keras
weights file (.weights.h5) — the inverse migration path of
``tools/import_keras.py``.

Users deploying on the reference's stack (tf.keras models checkpointed
by ``ModelCheckpoint``, reference yolov3/trainer.py:60-66, and the
frozen-pb / TF-Serving exports built from them, trainer.py:140-185) can
train here on TPU and take the weights back: the tool restores an Orbax
checkpoint, transplants every parameter into the layer-by-layer TF2
rebuild of the reference detector (tests/test_parity_e2e.py — the
rebuild the 5-backbone end-to-end parity gate proves equivalent), and
saves Keras weights.  The transplant is the exact walk the parity gate
uses, so the exported model's logits match this framework's to
measured TF-vs-XLA numerical noise (see PARITY.md).

Weight layout notes mirror import_keras.py: Conv2D kernels copy as-is,
flax grouped-conv kernels split per reference ResNeXt group, depthwise
kernels transpose to (kh, kw, C, 1), BN {scale, bias}+{mean, var} map
to [gamma, beta, moving_mean, moving_var].

Round-trip exactness (flax -> keras -> flax bit-identical) is pinned by
tests/test_import_keras.py; the export CLI itself by
tests/test_import_keras.py::test_cli_export_roundtrips_through_import.

Usage:
  python -m yolov3_tensorflow_tpu.tools.export_keras \
      --checkpoint models/resnet-18-radam-aug-13c --backbone resnet-18 \
      --class_num 13 --input_size 416x416 --out trained.weights.h5
"""
from __future__ import annotations

import argparse
import os
import sys

import numpy as np


def _tests_module():
    root = os.path.dirname(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))))
    if root not in sys.path:
        sys.path.insert(0, root)
    from tests import test_parity_e2e
    return test_parity_e2e


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--checkpoint", required=True,
                   help="Orbax checkpoint directory to export")
    p.add_argument("--backbone", default="resnet-18",
                   choices=("resnet-18", "resnet-18-v2", "resnext-18",
                            "mixnet-18", "mobilenet-v2"))
    p.add_argument("--class_num", type=int, default=13)
    p.add_argument("--input_size", default="416x416")
    p.add_argument("--optimizer", default="radam",
                   help="optimizer the checkpoint was trained with "
                        "(its state structure must match to restore)")
    p.add_argument("--out", required=True,
                   help="output Keras weights file (.weights.h5)")
    p.add_argument("--ema", action="store_true",
                   help="export the EMA shadow weights (checkpoint must "
                        "have been trained with --ema_decay)")
    a = p.parse_args(argv)

    import jax
    # host-side tool: keep it off the (single-tenant) TPU and its
    # 20-40s remote compiles; must run before any device query
    jax.config.update("jax_platforms", "cpu")

    from ..config import Config
    from ..train.trainer import YOLOv3Trainer

    t = _tests_module()
    h, w = (int(v) for v in a.input_size.split("x"))
    cfg = Config(class_num=a.class_num, model_backbone=a.backbone,
                 optimizer=a.optimizer, input_image_size=(h, w, 3),
                 # any nonzero decay flips infer_params to the shadow
                 ema_decay=0.999 if a.ema else 0.0)

    trainer = YOLOv3Trainer(cfg, restore=True, checkpoint_dir=a.checkpoint)
    step = int(trainer.state.step)
    assert step > 0, f"no checkpoint restored from {a.checkpoint}"
    print(f"restored step {step} from {a.checkpoint}")

    ref = t.REF_BUILDERS[a.backbone]()
    keras_model = ref.build((h, w), cfg.head_channel_nums)
    params = jax.tree.map(np.asarray, trainer.infer_params)
    stats = jax.tree.map(np.asarray, trainer.state.batch_stats)
    t._transplant(keras_model, ref, params, stats)

    out = a.out
    if not out.endswith(".weights.h5"):
        # keras 3 save_weights requires the .weights.h5 suffix
        out = out + (".weights.h5" if not out.endswith(".h5")
                     else "")
        if not out.endswith(".weights.h5"):
            out = out[:-len(".h5")] + ".weights.h5"
    keras_model.save_weights(out)
    print(f"exported {a.backbone} ({len(keras_model.layers)} layers) "
          f"to {out} — load into the reference architecture with "
          f"model.load_weights(...) or re-import here via "
          f"tools.import_keras")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
