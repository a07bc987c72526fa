"""Post-training int8 inference quantization (ops/quantize.py,
models/layers.py QuantConv, trainer calibrate/predict integration).

The reference has no quantization; this is a TPU-native serving
feature over the same checkpoints, gated per-shape by the measured
int8-vs-bf16 conv table (experiments/probe_int8_conv.py)."""
import tempfile

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from yolov3_tensorflow_tpu.ops.quantize import (act_scale, int8_conv,
                                                quant_eligible,
                                                quantize_acts,
                                                quantize_weights,
                                                quantized_conv)


def test_weight_quant_roundtrip_bound():
    rng = np.random.RandomState(0)
    k = rng.randn(3, 3, 8, 16).astype(np.float32) * rng.rand(16)
    wq, s_w = quantize_weights(jnp.asarray(k))
    assert wq.dtype == jnp.int8
    err = np.abs(k - np.asarray(wq, np.float32) * np.asarray(s_w))
    # symmetric round-to-nearest: error <= half a step, per channel
    assert (err <= np.asarray(s_w) / 2 + 1e-7).all()
    # the max-magnitude weight per channel hits +/-127 exactly
    assert (np.abs(np.asarray(wq)).max(axis=(0, 1, 2)) == 127).all()


def test_int8_conv_matches_int32_oracle():
    rng = np.random.RandomState(1)
    x = rng.randint(-127, 128, (2, 9, 11, 4)).astype(np.int8)
    w = rng.randint(-127, 128, (3, 3, 4, 8)).astype(np.int8)
    y = int8_conv(jnp.asarray(x), jnp.asarray(w))
    ref = jax.lax.conv_general_dilated(
        jnp.asarray(x, jnp.int32), jnp.asarray(w, jnp.int32), (1, 1),
        "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))
    assert y.dtype == jnp.int32
    assert (np.asarray(y) == np.asarray(ref)).all()


def test_quantized_conv_close_to_f32():
    rng = np.random.RandomState(2)
    x = np.abs(rng.randn(2, 16, 16, 8)).astype(np.float32)  # post-relu-like
    k = (rng.randn(3, 3, 8, 16) * 0.1).astype(np.float32)
    amax = jnp.asarray(np.abs(x).max())
    yq = quantized_conv(jnp.asarray(x), jnp.asarray(k), amax,
                        out_dtype=jnp.float32)
    ref = jax.lax.conv_general_dilated(
        jnp.asarray(x), jnp.asarray(k), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    rel = float(jnp.sqrt(jnp.mean((yq - ref) ** 2))
                / jnp.sqrt(jnp.mean(ref ** 2)))
    assert rel < 0.02, rel


def test_act_quant_range_and_sign():
    x = jnp.asarray([[-5.0, 0.0, 2.5, 10.0]])
    s = act_scale(jnp.asarray(5.0))
    xq = quantize_acts(x, s)
    assert xq.dtype == jnp.int8
    np.testing.assert_array_equal(np.asarray(xq), [[-127, 0, 64, 127]])


def test_eligibility_gate_is_the_measured_table():
    """probe_int8_conv.py: m1 1.30x / m2 1.18x win; m3 0.94x / m4 1.06x
    don't (and only the measured 3x3/s1 ungrouped no-bias form is in)."""
    b = 128
    assert quant_eligible((b, 104, 104, 64), 64)          # m1
    assert quant_eligible((b, 52, 52, 128), 128)          # m2
    assert not quant_eligible((b, 26, 26, 256), 256)      # m3: channels
    assert not quant_eligible((b, 13, 13, 512), 512)      # m4
    assert not quant_eligible((b, 104, 104, 64), 128, strides=(2, 2))
    assert not quant_eligible((b, 104, 104, 64), 64, kernel_size=(1, 1))
    assert not quant_eligible((b, 104, 104, 64), 64, feature_group_count=64)
    assert not quant_eligible((b, 104, 104, 64), 64, use_bias=True)
    assert not quant_eligible((b, 26, 26, 64), 64)        # area too small
    assert not quant_eligible((b, 104, 104, 64), 64, padding="VALID")


def test_quantconv_calibrate_and_int8_modes():
    from yolov3_tensorflow_tpu.models.layers import QuantConv
    rng = np.random.RandomState(3)
    x1 = jnp.asarray(rng.randn(2, 8, 8, 4).astype(np.float32))
    x2 = jnp.asarray(rng.randn(2, 8, 8, 4).astype(np.float32) * 3.0)
    calib = QuantConv(features=8, mode="calibrate", dtype=jnp.float32)
    variables = calib.init(jax.random.PRNGKey(0), x1)
    assert float(variables["quant"]["act_absmax"]) == 0.0  # init is zero
    _, mut = calib.apply(variables, x1, mutable=["quant"])
    assert float(mut["quant"]["act_absmax"]) == pytest.approx(
        float(jnp.max(jnp.abs(x1))))
    # running max across calibration batches
    _, mut = calib.apply({**variables, **mut}, x2, mutable=["quant"])
    assert float(mut["quant"]["act_absmax"]) == pytest.approx(
        float(jnp.max(jnp.abs(x2))))
    # int8 mode == the bare op with the calibrated scale
    q = QuantConv(features=8, mode="int8", dtype=jnp.float32)
    y = q.apply({"params": variables["params"], "quant": mut["quant"]}, x2)
    ref = quantized_conv(x2, variables["params"]["kernel"],
                         mut["quant"]["act_absmax"], out_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref), rtol=0, atol=0)


@pytest.fixture(scope="module")
def _quant_trainers():
    """One unquantized-vs-int8 single-device trainer pair at 224 (m1 at
    56^2 passes the area gate) + an 8-device DP trainer, f32 compute so
    cross-mesh comparisons see quantization error only."""
    from yolov3_tensorflow_tpu.config import Config
    from yolov3_tensorflow_tpu.train.trainer import YOLOv3Trainer
    out = {}
    for name, kw in (("single", dict(num_devices=1)),
                     ("mesh", dict(num_devices=8))):
        cfg = Config(input_image_size=(224, 224, 3), batch_size=8,
                     max_boxes=4, num_devices=kw["num_devices"],
                     quant="int8", is_augment=False,
                     compute_dtype="float32", stem_backend="xla")
        out[name] = YOLOv3Trainer(cfg, restore=False,
                                  checkpoint_dir=tempfile.mkdtemp())
    # identical params across the pair so outputs are comparable
    out["mesh"].state = out["mesh"].state.replace(
        params=out["single"].state.params,
        batch_stats=out["single"].state.batch_stats)
    return out


def test_model_int8_predict_close_and_calibrated(_quant_trainers):
    tr = _quant_trainers["single"]
    rng = np.random.RandomState(4)
    imgs = rng.randint(0, 255, (8, 224, 224, 3), np.uint8)
    heads_q = tr.predict(imgs)  # auto-calibrates on this batch
    # the quantized set is exactly m1's four residual convs (224/4=56:
    # area gate passes; m2 at 28^2 does not)
    qnames = sorted(tr._quant_vars["backbone"].keys())
    assert len(qnames) == 4, qnames
    assert all(float(v["act_absmax"]) > 0
               for v in tr._quant_vars["backbone"].values())
    heads = tr.forward(tr.state, jnp.asarray(imgs))
    for hq, h in zip(heads_q, heads):
        rel = float(jnp.sqrt(jnp.mean((hq - h) ** 2))
                    / jnp.sqrt(jnp.mean(h ** 2)))
        assert rel < 0.05, rel


def test_model_int8_mesh_matches_single(_quant_trainers):
    """int8 inference partitions over the data mesh: 8-device DP heads
    == single-device heads (same params, same calibration batch; int32
    conv accumulation is exact, residual f32 noise is reduction order
    in the unquantized convs)."""
    single, mesh = _quant_trainers["single"], _quant_trainers["mesh"]
    rng = np.random.RandomState(5)
    imgs = rng.randint(0, 255, (8, 224, 224, 3), np.uint8)
    # calibrate BOTH on this exact batch (predict's lazy calibration
    # would otherwise leave them calibrated on different data)
    single._quant_vars = None
    mesh._quant_vars = None
    single.calibrate(imgs)
    mesh.calibrate(imgs)
    hs = single.predict(imgs)
    hm = mesh.predict(imgs)
    # identical calibrated scales (max over the batch is mesh-invariant)
    js, jm = (jax.tree_util.tree_map(float, t._quant_vars)
              for t in (single, mesh))
    assert js == jm
    for a, b in zip(hs, hm):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=0, atol=1e-4)


def test_quantized_frozen_export_roundtrip(tmp_path):
    """save_frozen with cfg.quant='int8' bakes the calibrated scales
    into the exported StableHLO: the reloaded artifact reproduces the
    live int8 predict path (run.py --mode save_pb --quant int8)."""
    import json
    import os

    from yolov3_tensorflow_tpu.config import Config
    from yolov3_tensorflow_tpu.infer.export import load_frozen, save_frozen
    from yolov3_tensorflow_tpu.train.trainer import YOLOv3Trainer

    cfg = Config(input_image_size=(224, 224, 3), batch_size=2, max_boxes=4,
                 num_devices=1, quant="int8", compute_dtype="float32",
                 stem_backend="xla")
    trainer = YOLOv3Trainer(cfg, restore=False,
                            checkpoint_dir=tempfile.mkdtemp())
    imgs = np.random.RandomState(7).randint(0, 255, (2, 224, 224, 3),
                                            np.uint8)
    path = os.path.join(tmp_path, "model.stablehlo")
    # uncalibrated export must refuse
    with pytest.raises(AssertionError):
        save_frozen(trainer, path)
    trainer.calibrate(imgs)
    save_frozen(trainer, path, batch_size=2)
    meta = json.load(open(path + ".json"))
    assert meta["quant"] == "int8"
    fn = load_frozen(path)
    out = fn(imgs.astype(np.float32) / 255.0)  # export takes normalized
    ref = trainer.predict(imgs)
    for a, b in zip(out, ref):
        d = np.abs(np.asarray(a) - np.asarray(b))
        # the export recompiles the graph with different fusion orders;
        # f32 ulp differences flip a few activations sitting exactly on
        # int8 rounding boundaries, and each flip smears one quant step
        # through downstream receptive fields — inherent to requantized
        # graphs (measured: ~0.01 max on raw logits = <=0.0025 after
        # sigmoid, invisible at detection level; the mAP-level gate is
        # tools/quant_gate.py)
        assert d.max() < 5e-2, d.max()
        assert d.mean() < 5e-3, d.mean()


def test_int8_noop_when_no_conv_eligible():
    """A configuration where NO conv passes the eligibility gate (64x64
    input: m1 area 16^2 < 52^2) must not crash — calibration yields an
    empty quant collection and predict falls back to the plain forward
    (review finding: flax returns {} for an untouched mutable
    collection)."""
    from yolov3_tensorflow_tpu.config import Config
    from yolov3_tensorflow_tpu.train.trainer import YOLOv3Trainer

    cfg = Config(input_image_size=(64, 64, 3), batch_size=4, max_boxes=4,
                 num_devices=1, quant="int8", compute_dtype="float32",
                 stem_backend="xla")
    tr = YOLOv3Trainer(cfg, restore=False,
                       checkpoint_dir=tempfile.mkdtemp())
    imgs = np.random.RandomState(9).randint(0, 255, (4, 64, 64, 3),
                                            np.uint8)
    heads = tr.predict(imgs)  # auto-calibrates; must not KeyError
    assert tr._quant_vars == {}
    ref = tr.forward(tr.state, jnp.asarray(imgs))
    for a, b in zip(heads, ref):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_quantized_serving_export_manifests(_quant_trainers, tmp_path):
    """save_serving with quant='int8' must ship a reconstructable model:
    weights.pkl carries the calibrated 'quant' collection (the frozen
    graph is fixed at batch 1; any other batch size rebuilds from the
    weights and needs the SAME calibration the gate measured), and
    signature.json records the serialized callable's exact [1,h,w,c]
    aval."""
    import os
    import pickle

    from yolov3_tensorflow_tpu.infer.export import save_serving

    tr = _quant_trainers["single"]
    if tr._quant_vars is None:
        imgs = np.random.RandomState(8).randint(0, 255, (8, 224, 224, 3),
                                                np.uint8)
        tr.calibrate(imgs)
    d = str(tmp_path / "serving")
    save_serving(tr, d)
    weights = pickle.load(open(os.path.join(d, "weights.pkl"), "rb"))
    assert "quant" in weights, sorted(weights)
    assert weights["quant"].keys() == tr._quant_vars.keys()
    import json
    sig = json.load(open(os.path.join(d, "signature.json")))
    assert sig["inputs"]["images"] == [1, 224, 224, 3]
    assert sig["quant"] == "int8"
