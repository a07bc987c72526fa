"""Device mesh + sharding layer.

The reference's only parallelism is in-graph Keras data parallelism —
``keras.utils.multi_gpu_model(model, gpus=FLAGS.gpu_num)``
(yolov3/trainer.py:40-43) with gpu knobs at configs.py:104-106 and a
multi->single weight-conversion utility (trainer.py:126-138).

TPU-native equivalent: a ``jax.sharding.Mesh`` with a ``data`` axis; the
jitted train step takes the batch sharded over ``data`` and replicated
params, and XLA inserts the gradient all-reduce over ICI (DCN across
slices).  No multi->single conversion exists because parameters are
replicated and checkpoints are device-count-agnostic.

A ``model`` axis is plumbed through (size 1 by default) so tensor-style
sharding can be grown into without re-threading the mesh.
"""
from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import Config


def make_mesh(num_devices: int = 0, data_axis: str = "data",
              model_axis: str = "model",
              devices=None, model_size: int = 1) -> Mesh:
    """Build a (data, model) mesh.  num_devices<=0 -> all devices;
    ``model_size`` > 1 folds that many devices into the model axis
    (used for spatial partitioning of the conv grid)."""
    devs = list(devices if devices is not None else jax.devices())
    if num_devices and num_devices > 0:
        assert len(devs) >= num_devices, (
            f"Config asked for {num_devices} devices but only "
            f"{len(devs)} are visible — a silent smaller mesh would "
            f"change per-device batch and global-batch semantics "
            f"(on CPU set xla_force_host_platform_device_count)")
        devs = devs[:num_devices]
    model_size = max(1, model_size)
    assert len(devs) % model_size == 0, (
        f"{len(devs)} devices do not factor into model axis "
        f"{model_size}")
    arr = np.asarray(devs).reshape(len(devs) // model_size, model_size)
    return Mesh(arr, (data_axis, model_axis))


def mesh_from_config(cfg: Config, devices=None) -> Mesh:
    return make_mesh(cfg.num_devices, cfg.data_axis, cfg.model_axis,
                     devices, model_size=cfg.spatial_partition)


def batch_sharding(mesh: Mesh, data_axis: str = "data") -> NamedSharding:
    """Leading (batch) dim sharded over the data axis."""
    return NamedSharding(mesh, P(data_axis))


def image_sharding(mesh: Mesh, data_axis: str = "data",
                   model_axis: str = "model") -> NamedSharding:
    """(N, H, W, C) images: batch over data; when the mesh has a
    non-trivial model axis, HEIGHT is sharded over it — XLA GSPMD then
    partitions the whole conv stack spatially (halo exchanges over
    ICI).  The TPU-native scaling axis for activation-bound regimes
    (high resolution / tiny per-device batch) where DP cannot help."""
    if mesh.shape[model_axis] > 1:
        return NamedSharding(mesh, P(data_axis, model_axis))
    return NamedSharding(mesh, P(data_axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
