"""Model export.

Reference: trainer.save_mobile (h5 -> frozen-graph .pb, trainer.py:140-163)
and trainer.save_serving (TF-Serving SavedModel, trainer.py:165-185 — which
crashes as shipped on the undefined ``FLAGS.output_name``, trainer.py:174).

TPU-native equivalents:
  * :func:`save_frozen` — the frozen-pb analog: the jitted forward with the
    weights closed over as constants, serialized with ``jax.export``
    (StableHLO), loadable on any device without the Python model code.
  * :func:`save_serving` — the SavedModel analog: a directory containing
    the serialized serving function plus the weights as a separate
    checkpoint, with an explicit signature file naming input 'images' and
    outputs after the heads (fixing the reference's output_name crash by
    defining them: cfg.head_names).

Numerics note: with the default bfloat16 conv path, a reloaded frozen
artifact may differ from the live model by ~1e-2 absolute (different XLA
fusions round bf16 differently).  With ``compute_dtype='float32'`` the
round-trip matches to ~5e-6.
"""
from __future__ import annotations

import json
import os
import pickle
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def _forward_fn(model, params, batch_stats, quant_vars=None):
    variables = {"params": params, "batch_stats": batch_stats}
    if quant_vars:  # empty == no gate-eligible convs == plain graph
        variables["quant"] = quant_vars

    def forward(images):
        return model.apply(variables, images, train=False)
    return forward


def _export_model(trainer):
    """The model + variables the export should freeze: with
    ``cfg.quant == 'int8'`` the quantized inference graph (calibrated
    scales baked in as constants — serve exactly what was measured by
    tools/quant_gate.py), else the plain bf16/f32 forward."""
    if trainer.cfg.quant == "int8":
        assert trainer._quant_vars is not None, (
            "quant='int8' export needs calibrated activation scales: "
            "run trainer.calibrate(batch) (or one predict) first")
        from ..models.detector import build_detector
        return (build_detector(trainer.cfg, quant="int8"),
                trainer._quant_vars)
    return trainer.model, None


def save_frozen(trainer, path: str, batch_size: Optional[int] = None):
    """Frozen single-artifact export (save_mobile analog)."""
    cfg = trainer.cfg
    h, w, c = cfg.input_image_size
    n = batch_size or 1
    model, qvars = _export_model(trainer)
    fn = _forward_fn(model, trainer.infer_params,
                     trainer.state.batch_stats, qvars)
    exported = jax.export.export(jax.jit(fn))(
        jax.ShapeDtypeStruct((n, h, w, c), jnp.float32))
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "wb") as f:
        f.write(exported.serialize())
    meta = {
        "input": {"name": "images", "shape": [n, h, w, c],
                  "dtype": "float32"},
        "outputs": list(cfg.head_names),
        "backbone": cfg.model_backbone,
        "quant": cfg.quant,
    }
    with open(path + ".json", "w") as f:
        json.dump(meta, f, indent=2)
    return path


def load_frozen(path: str):
    """Deserialize a frozen export back into a callable."""
    with open(path, "rb") as f:
        exported = jax.export.deserialize(f.read())
    return exported.call


def save_serving(trainer, directory: str, batch_size: int = 1):
    """Serving-directory export (save_serving analog): weights + signature
    + serialized graph.  ``batch_size`` fixes the serialized graph's batch
    dimension (jax.export requires static shapes); :class:`ServingModel`
    chunks/pads arbitrary request sizes to it."""
    os.makedirs(directory, exist_ok=True)
    # weights (host numpy pytree, device-agnostic).  Include the
    # calibrated quant scales when exporting an int8 model: the frozen
    # graph is fixed at batch 1, so a consumer rebuilding at another
    # batch size from weights.pkl must get the SAME calibration the
    # gate measured, not an uncalibrated (garbage-clipping) model.
    _, qvars = _export_model(trainer)
    # infer_params = the EMA shadow when Config.ema_decay is on — the
    # export must match what trainer.predict() serves
    tree = {"params": trainer.infer_params,
            "batch_stats": trainer.state.batch_stats}
    if qvars:
        tree["quant"] = qvars
    weights = jax.tree.map(lambda x: np.asarray(x), tree)
    with open(os.path.join(directory, "weights.pkl"), "wb") as f:
        pickle.dump(weights, f)
    save_frozen(trainer, os.path.join(directory, "model.stablehlo"),
                batch_size=batch_size)
    h, w, c = trainer.cfg.input_image_size
    sig = {
        "signature": "predict",
        # the serialized callable's exact aval (jax.export fixes the
        # batch dim; keep this in lockstep with save_frozen's shape)
        "inputs": {"images": [int(batch_size), int(h), int(w), int(c)]},
        "outputs": list(trainer.cfg.head_names),
        "quant": trainer.cfg.quant,
    }
    with open(os.path.join(directory, "signature.json"), "w") as f:
        json.dump(sig, f, indent=2)
    return directory


def load_serving(directory: str):
    """Load a serving export -> (callable, signature dict)."""
    with open(os.path.join(directory, "signature.json")) as f:
        sig = json.load(f)
    fn = load_frozen(os.path.join(directory, "model.stablehlo"))
    return fn, sig


class ServingModel:
    """Consumer for a :func:`save_serving` export — the serving-client
    analog.  The reference stops at producing the SavedModel and leaves
    execution to external TF-Serving (trainer.py:165-185, run.py:176-181);
    this framework ships the consumer too, so ``run.py --mode
    test|predict --serving_dir DIR`` runs inference from the deployed
    artifact with no checkpoint and no Python model code.

    ``predict`` keeps the live trainer's exact input contract
    (trainer.predict, train/trainer.py): uint8 (or pre-normalized float)
    image batches of ANY size.  Normalization happens here — the
    serialized graph holds the post-normalize forward (see
    :func:`_forward_fn`) — and requests are chunked/zero-padded to the
    graph's fixed batch dimension, then sliced back.
    """

    def __init__(self, directory: str):
        self.fn, self.signature = load_serving(directory)
        self.batch_size = int(self.signature["inputs"]["images"][0])
        self.input_hw = tuple(self.signature["inputs"]["images"][1:3])
        self.head_names = tuple(self.signature["outputs"])

    @staticmethod
    def _normalize(images) -> np.ndarray:
        # host-side mirror of trainer._normalize_images (1/255 for
        # integer batches, reference file_util.py:58)
        x = np.asarray(images)
        if np.issubdtype(x.dtype, np.integer):
            return x.astype(np.float32) * (1.0 / 255.0)
        return x.astype(np.float32)

    def predict(self, images) -> tuple:
        x = self._normalize(images)
        n, b = x.shape[0], self.batch_size
        chunks = []
        for start in range(0, n, b):
            part = x[start:start + b]
            if part.shape[0] != b:  # ragged tail: zero-pad to the aval
                pad = np.zeros((b - part.shape[0],) + part.shape[1:],
                               np.float32)
                part = np.concatenate([part, pad], axis=0)
            chunks.append(self.fn(part))
        heads = tuple(
            np.concatenate([np.asarray(c[i]) for c in chunks], axis=0)[:n]
        for i in range(len(chunks[0])))
        return heads
