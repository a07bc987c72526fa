"""TPU-native YOLOv3 detection framework (JAX/XLA/Pallas/pjit).

A from-scratch re-design of zheng-yuwei/YOLOv3-tensorflow for TPU:
flax models, fully-vectorized loss, pjit data parallelism over a device
mesh, on-device NMS, optax optimizers, Orbax checkpointing.
"""
from .config import Config, default_config  # noqa: F401

__version__ = "0.1.0"
