"""Import a reference-architecture Keras checkpoint (.h5) into this
framework — the migration path for users with models trained on the
reference (zheng-yuwei/YOLOv3-tensorflow).

The reference trains a ``tf.keras`` model and checkpoints it with
``ModelCheckpoint`` (reference yolov3/trainer.py:60-66, run.py:30-38).
This tool loads such an .h5 into the layer-by-layer TF2 rebuild of the
reference detector (tests/test_parity_e2e.py — the rebuild mirrors the
reference's layer creation order exactly, which the 5-backbone
end-to-end parity gate proves), then maps every layer's weights into
the flax parameter/batch-stats trees — the exact INVERSE of the
``_transplant`` walk the parity gate uses — and writes an Orbax
checkpoint that ``YOLOv3Trainer(restore=True)`` resumes from (fresh
optimizer state, step 0).

Weight layout notes:
  * Conv2D kernels are (kh, kw, cin, cout) in both frameworks — copied
    as-is; DepthwiseConv2D's (kh, kw, C, 1) transposes to the flax
    grouped-conv (kh, kw, 1, C).
  * The reference's ResNeXt builds per-group convolutions; these merge
    into single flax grouped-conv kernels (concat along cout), the
    inverse of the parity gate's per-slice split.
  * BatchNormalization [gamma, beta, moving_mean, moving_var] map to
    flax {scale, bias} params + {mean, var} batch stats.

Round-trip exactness (flax -> keras -> flax bit-identical for all 5
backbones) is pinned by tests/test_import_keras.py.

Accepted formats: Keras 3 ``.weights.h5`` and legacy HDF5 ``.h5``
checkpoints (what the reference's TF1-era ``ModelCheckpoint`` writes —
keras' legacy loader matches weights topologically, which is exactly
the rebuild's layer order).

Usage:
  python -m yolov3_tensorflow_tpu.tools.import_keras \
      --h5 /path/to/reference_model.h5 --backbone resnet-18 \
      --class_num 13 --out models/imported-resnet18
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


def _okeys(tree, prefix):
    """Auto-named flax submodule KEYS of one type, by creation index."""
    t = _tests_module()
    return sorted((k for k in tree if k.startswith(prefix)),
                  key=t._index_of)


def import_keras_weights(keras_model, ref, params, stats):
    """Inverse of tests.test_parity_e2e._transplant: read the Keras
    layers positionally by creation order and return NEW (params,
    batch_stats) trees with every conv/BN/head weight replaced.  Shapes
    are guarded per index against the flax trees."""
    import tensorflow as tf

    # jax_to_np rebuilds every dict container (fresh tree), so leaf
    # re-binding below never mutates the caller's trees; the arrays
    # themselves are read-only here — no deep copy needed
    params = jax_to_np(params)
    stats = jax_to_np(stats)
    bb_p = params["backbone"]
    bb_s = stats["backbone"]["backbone"] \
        if "backbone" in stats["backbone"] else stats["backbone"]

    # ---- convs: backbone then heads, one cursor ---------------------- #
    conv_slots = [bb_p[k] for k in _okeys(bb_p, "Conv_")] + \
                 [params[k] for k in _okeys(params, "Conv_")]
    conv_groups = getattr(ref, "conv_groups", None) or \
        [None] * len(ref.convs)
    fi = 0
    parts = []
    for i, name in enumerate(ref.convs):
        layer = keras_model.get_layer(name)
        w = np.asarray(layer.get_weights()[0], np.float32)
        spec = conv_groups[i]
        if spec is not None:
            j, groups = spec
            parts.append(w)
            if j < groups - 1:
                continue
            w = np.concatenate(parts, axis=3)
            parts = []
        elif isinstance(layer, tf.keras.layers.DepthwiseConv2D):
            # keras depthwise (kh, kw, C, 1) -> flax grouped (kh, kw, 1, C)
            w = np.transpose(w, (0, 1, 3, 2))
        slot = conv_slots[fi]
        assert slot["kernel"].shape == w.shape, \
            (name, slot["kernel"].shape, w.shape)
        slot["kernel"] = w
        fi += 1
    assert fi == len(conv_slots), (fi, len(conv_slots))

    # ---- BNs: params + running stats, grouped specs concat ---------- #
    bn_slots = [(bb_p[k], bb_s[k]) for k in _okeys(bb_p,
                                                   "FusedBatchNorm_")] + \
               [(params[k], stats[k]) for k in _okeys(params,
                                                      "FusedBatchNorm_")]
    bn_groups = getattr(ref, "bn_groups", None) or [None] * len(ref.bns)
    fi = 0
    parts = []
    for i, name in enumerate(ref.bns):
        gbmv = [np.asarray(a, np.float32)
                for a in keras_model.get_layer(name).get_weights()]
        spec = bn_groups[i]
        if spec is not None:
            j, groups = spec
            parts.append(gbmv)
            if j < groups - 1:
                continue
            gbmv = [np.concatenate(cols) for cols in zip(*parts)]
            parts = []
        p, st = bn_slots[fi]
        gamma, beta, mean, var = gbmv
        assert p["scale"].shape == gamma.shape, (name, gamma.shape)
        p["scale"], p["bias"] = gamma, beta
        st["mean"], st["var"] = mean, var
        fi += 1
    assert fi == len(bn_slots), (fi, len(bn_slots))

    # ---- detection heads (bias convs) -------------------------------- #
    for name in ref.head_outs:
        suffix = name.rsplit("_", 1)[1]
        k, b = keras_model.get_layer(name).get_weights()
        slot = params[f"head_out_{suffix}"]
        assert slot["kernel"].shape == tuple(k.shape), (name, k.shape)
        slot["kernel"] = np.asarray(k, np.float32)
        slot["bias"] = np.asarray(b, np.float32)
    return params, stats


def jax_to_np(tree):
    if isinstance(tree, dict):
        return {k: jax_to_np(v) for k, v in tree.items()}
    return np.asarray(tree)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--h5", required=True,
                   help="Keras checkpoint of the reference architecture")
    p.add_argument("--backbone", default="resnet-18",
                   choices=("resnet-18", "resnet-18-v2", "resnext-18",
                            "mixnet-18", "mobilenet-v2"))
    p.add_argument("--class_num", type=int, default=13)
    p.add_argument("--input_size", default="416x416")
    p.add_argument("--out", required=True,
                   help="checkpoint directory to create")
    a = p.parse_args(argv)

    import jax

    from ..config import Config
    from ..train.trainer import YOLOv3Trainer

    t = _tests_module()
    h, w = (int(v) for v in a.input_size.split("x"))
    cfg = Config(class_num=a.class_num, model_backbone=a.backbone,
                 input_image_size=(h, w, 3))

    ref = t.REF_BUILDERS[a.backbone]()
    keras_model = ref.build((h, w), cfg.head_channel_nums)
    keras_model.load_weights(a.h5)
    print(f"loaded {a.h5} into the {a.backbone} reference rebuild "
          f"({len(keras_model.layers)} layers)")

    trainer = YOLOv3Trainer(cfg, restore=False, checkpoint_dir=a.out)
    # import_keras_weights' jax_to_np pass already rebuilds both trees
    # as fresh numpy containers — pass the state trees directly
    params, stats = import_keras_weights(
        keras_model, ref, trainer.state.params, trainer.state.batch_stats)
    # step 1, not 0: downstream tools assert state.step > 0 as their
    # "a checkpoint actually restored" check (quant_gate, map_parity)
    state = trainer.state.replace(
        params=params, batch_stats=stats,
        step=jax.numpy.ones_like(trainer.state.step))
    trainer.ckpt.save(1, state, force=True)  # save() waits internally
    print(f"imported checkpoint written to {a.out} (step 1, fresh "
          f"optimizer state) — resume with YOLOv3Trainer(restore=True, "
          f"checkpoint_dir=...) or run.py --checkpoint_dir {a.out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
