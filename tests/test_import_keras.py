"""Reference-checkpoint importer (tools/import_keras.py).

The import is the inverse of the parity gate's flax->Keras transplant,
so the decisive test is ROUND-TRIP EXACTNESS: flax weights ->
transplant into the Keras rebuild -> save .h5 -> load into a FRESH
rebuild -> import back to flax must be bit-identical, for every
backbone (covers the grouped-conv merge, the depthwise transpose and
the v2 BN cursor).  The CLI test additionally pins the Orbax
checkpoint hand-off into YOLOv3Trainer(restore=True)."""
import os
import tempfile

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from yolov3_tensorflow_tpu.config import Config
from yolov3_tensorflow_tpu.models.detector import YOLOv3Detector
from yolov3_tensorflow_tpu.tools.import_keras import import_keras_weights

from .test_parity_e2e import REF_BUILDERS, _randomize, _transplant

INPUT_HW = (96, 128)


def _flax_random(backbone, class_num=7):
    cfg = Config(class_num=class_num, model_backbone=backbone,
                 input_image_size=(INPUT_HW[0], INPUT_HW[1], 3),
                 compute_dtype="float32")
    model = YOLOv3Detector(backbone_name=backbone,
                           head_channel_nums=tuple(cfg.head_channel_nums),
                           dtype=jnp.float32)
    variables = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1,) + tuple(cfg.input_image_size), jnp.float32),
        train=True)
    params, stats = _randomize(variables["params"],
                               variables["batch_stats"])
    return cfg, params, stats


def _trees_equal(a, b, path=()):
    if isinstance(a, dict) or isinstance(b, dict):
        assert sorted(a) == sorted(b), (path, sorted(a), sorted(b))
        for k in a:
            _trees_equal(a[k], b[k], path + (k,))
        return
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                  err_msg=str(path))


@pytest.mark.parametrize("backbone", ("resnet-18", "resnet-18-v2",
                                      "resnext-18", "mixnet-18",
                                      "mobilenet-v2"))
def test_h5_roundtrip_is_bit_exact(backbone, tmp_path):
    cfg, params, stats = _flax_random(backbone)
    ref = REF_BUILDERS[backbone]()
    km = ref.build(INPUT_HW, cfg.head_channel_nums)
    _transplant(km, ref, params, stats)
    h5 = os.path.join(tmp_path, "ref.weights.h5")
    km.save_weights(h5)

    # fresh rebuild + fresh flax trees, as a real import would start
    ref2 = REF_BUILDERS[backbone]()
    km2 = ref2.build(INPUT_HW, cfg.head_channel_nums)
    km2.load_weights(h5)
    _, p0, s0 = _flax_random(backbone)  # same structure, same values
    imported_p, imported_s = import_keras_weights(km2, ref2, p0, s0)
    _trees_equal(imported_p, params)
    _trees_equal(imported_s, stats)


def test_cli_import_writes_restorable_checkpoint(tmp_path):
    from yolov3_tensorflow_tpu.tools import import_keras
    from yolov3_tensorflow_tpu.train.trainer import YOLOv3Trainer

    cfg, params, stats = _flax_random("resnet-18", class_num=7)
    ref = REF_BUILDERS["resnet-18"]()
    km = ref.build(INPUT_HW, cfg.head_channel_nums)
    _transplant(km, ref, params, stats)
    h5 = os.path.join(tmp_path, "trained.weights.h5")
    km.save_weights(h5)

    out = os.path.join(tmp_path, "imported")
    rc = import_keras.main([
        "--h5", h5, "--backbone", "resnet-18", "--class_num", "7",
        "--input_size", f"{INPUT_HW[0]}x{INPUT_HW[1]}", "--out", out])
    assert rc == 0

    trainer = YOLOv3Trainer(cfg, restore=True, checkpoint_dir=out)
    _trees_equal(jax.tree.map(np.asarray, trainer.state.params), params)
    _trees_equal(jax.tree.map(np.asarray, trainer.state.batch_stats),
                 stats)
    # and the imported model runs
    imgs = np.random.RandomState(0).randint(
        0, 255, (2, INPUT_HW[0], INPUT_HW[1], 3), np.uint8)
    heads = trainer.predict(imgs)
    assert all(np.isfinite(np.asarray(h)).all() for h in heads)

def test_cli_export_roundtrips_through_import(tmp_path):
    """tools/export_keras: checkpoint -> reference-architecture Keras
    weights.  Round-trip through the import tool must be bit-exact."""
    from yolov3_tensorflow_tpu.tools import export_keras, import_keras
    from yolov3_tensorflow_tpu.train.trainer import YOLOv3Trainer

    cfg, params, stats = _flax_random("resnet-18", class_num=7)
    ckdir = os.path.join(tmp_path, "trained")
    trainer = YOLOv3Trainer(cfg, restore=False, checkpoint_dir=ckdir)
    state = trainer.state.replace(
        params=jax.tree.map(jnp.asarray, params),
        batch_stats=jax.tree.map(jnp.asarray, stats),
        step=jnp.ones_like(trainer.state.step))
    trainer.ckpt.save(1, state, force=True)

    h5 = os.path.join(tmp_path, "exported.weights.h5")
    rc = export_keras.main([
        "--checkpoint", ckdir, "--backbone", "resnet-18",
        "--class_num", "7",
        "--input_size", f"{INPUT_HW[0]}x{INPUT_HW[1]}", "--out", h5])
    assert rc == 0 and os.path.exists(h5)

    back = os.path.join(tmp_path, "reimported")
    rc = import_keras.main([
        "--h5", h5, "--backbone", "resnet-18", "--class_num", "7",
        "--input_size", f"{INPUT_HW[0]}x{INPUT_HW[1]}", "--out", back])
    assert rc == 0
    tr2 = YOLOv3Trainer(cfg, restore=True, checkpoint_dir=back)
    _trees_equal(jax.tree.map(np.asarray, tr2.state.params), params)
    _trees_equal(jax.tree.map(np.asarray, tr2.state.batch_stats), stats)
