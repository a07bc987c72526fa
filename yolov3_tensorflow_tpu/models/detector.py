"""YOLOv3 detector: backbone registry + 3-scale detection heads.

Reference: yolov3/yolov3_detector.py:15-151.

Heads (exact op-for-op semantics):
  * /32 head: conv_bn(512) -> relu -> 1x1 conv(head_channels)
    (yolov3_detector.py:88-101)
  * /16 head: 3x3 conv_bn(256) on the /32 FEATURE (pre-head; the
    reference calls conv_bn with its 3x3 default, yolov3_detector.py:113
    + basic_backbone.py conv default) -> 2x nearest upsample ->
    concat(s16) -> 1x1 conv_bn(256) -> 3x3 conv_bn(512) -> 1x1 head conv
    (yolov3_detector.py:103-126)
  * /8 head: analogous with 128/256 channels but the branch conv IS 1x1
    there (yolov3_detector.py:138) (yolov3_detector.py:128-151)
  * head output convs: RandomNormal(0.01) init, WITH bias, NO L2
    (yolov3_detector.py:98-100) — named with the `head_out` marker so
    l2_regularization skips them.

TPU-native delta: the reference reshapes /8 and /16 outputs to the /32 grid
and channel-concats all three so a single Keras loss can consume one tensor
(yolov3_detector.py:79-86).  That packing exists only to satisfy Keras; our
loss takes the three head tensors directly, so ``__call__`` returns the
triple.  :func:`pack_heads` / :func:`unpack_heads` reproduce the reference's
merged layout for export parity and tests.
"""
from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
from flax import linen as nn

from ..config import (BACKBONE_MIXNET_18,
                      BACKBONE_MOBILENET_V2, BACKBONE_RESNET_18,
                      BACKBONE_RESNET_18_V2, BACKBONE_RESNEXT_18, Config)
from .layers import HEAD_OUT_MARKER, BasicBackbone, upsample2x_nearest
from .mixnet18 import MixNet18
from .mobilenet_v2 import MobileNetV2
from .resnet18 import ResNet18
from .resnet18_v2 import ResNet18V2
from .resnext18 import ResNeXt18

# name -> class (reference: yolov3_detector.py:24-30)
BACKBONE_TYPE = {
    BACKBONE_RESNET_18: ResNet18,
    BACKBONE_RESNET_18_V2: ResNet18V2,
    BACKBONE_RESNEXT_18: ResNeXt18,
    BACKBONE_MOBILENET_V2: MobileNetV2,
    BACKBONE_MIXNET_18: MixNet18,
}


class YOLOv3Detector(BasicBackbone):
    """Full detector module.  ``__call__(images, train)`` -> (p8, p16, p32)
    raw head tensors, NHWC, channels = box_num * (5 + class_num)."""

    backbone_name: str = BACKBONE_RESNET_18
    head_channel_nums: Tuple[int, int, int] = (15, 10, 15)

    def _head_out_conv(self, x, channels, name):
        """Final 1x1 head conv: RandomNormal(0.01), bias, no L2
        (yolov3_detector.py:98-100)."""
        return nn.Conv(
            features=channels,
            kernel_size=(1, 1),
            use_bias=True,
            kernel_init=nn.initializers.normal(stddev=0.01),
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name=f"{HEAD_OUT_MARKER}_{name}",
        )(x)

    @nn.compact
    def __call__(self, images, train: bool = True):
        if self.backbone_name not in BACKBONE_TYPE:
            raise ValueError(f"no such backbone: {self.backbone_name}")
        backbone = BACKBONE_TYPE[self.backbone_name](
            dtype=self.dtype, param_dtype=self.param_dtype,
            conv_backend=self.conv_backend,
            stem_backend=self.stem_backend,
            grouped_backend=self.grouped_backend,
            winograd_min_channels=self.winograd_min_channels,
            quant=self.quant,
            name="backbone")
        s8, s16, s32 = backbone(images, train=train)
        c8, c16, c32 = self.head_channel_nums

        # /32 head (yolov3_detector.py:88-101)
        net = self.conv_bn_relu(s32, 512, train=train)
        p32 = self._head_out_conv(net, c32, "32")

        # /16 head (yolov3_detector.py:103-126): branches off the raw s32
        # feature, not the /32 head tower.  conv_bn_relu so this 3x3 link
        # rides the fused winograd path when eligible, like its siblings
        # at the /32 and /8 towers (identical classic composition).
        net = self.conv_bn_relu(s32, 256, train=train)
        net = upsample2x_nearest(net)
        merge16 = jnp.concatenate(
            [net, jnp.asarray(s16, net.dtype)], axis=-1)
        merge16 = self.conv_bn(merge16, 256, train=train, kernel_size=(1, 1))
        merge16 = self.activation(merge16)
        net = self.conv_bn_relu(merge16, 512, train=train)
        p16 = self._head_out_conv(net, c16, "16")

        # /8 head (yolov3_detector.py:128-151): branches off merge16.
        net = self.conv_bn(merge16, 128, train=train, kernel_size=(1, 1))
        net = self.activation(net)
        net = upsample2x_nearest(net)
        merge8 = jnp.concatenate([net, jnp.asarray(s8, net.dtype)], axis=-1)
        merge8 = self.conv_bn(merge8, 128, train=train, kernel_size=(1, 1))
        merge8 = self.activation(merge8)
        merge8 = self.conv_bn_relu(merge8, 256, train=train)
        p8 = self._head_out_conv(merge8, c8, "8")

        return (jnp.asarray(p8, jnp.float32), jnp.asarray(p16, jnp.float32),
                jnp.asarray(p32, jnp.float32))


def build_detector(cfg: Config, quant: str = "none") -> YOLOv3Detector:
    """``quant``: "none" (training / plain eval), "calibrate" or "int8"
    (PTQ inference, ops/quantize.py) — passed separately from cfg.quant
    because the trainer's train/eval model is always unquantized; only
    its dedicated inference path engages the quantized variants."""
    return YOLOv3Detector(
        backbone_name=cfg.model_backbone,
        head_channel_nums=tuple(cfg.head_channel_nums),
        dtype=jnp.dtype(cfg.compute_dtype),
        conv_backend=cfg.conv_backend,
        stem_backend=cfg.stem_backend,
        grouped_backend=cfg.grouped_backend,
        winograd_min_channels=cfg.winograd_min_channels,
        quant=quant,
    )


def pack_heads(p8, p16, p32):
    """Reproduce the reference's merged single-tensor layout
    (yolov3_detector.py:79-86): /8 and /16 are reshaped onto the /32 grid
    (channel x16 and x4 respectively) then channel-concatenated."""
    n, h32, w32, _ = p32.shape
    r8 = p8.reshape(n, h32, w32, -1)
    r16 = p16.reshape(n, h32, w32, -1)
    return jnp.concatenate([r8, r16, p32], axis=-1)


def unpack_heads(merged, head_grid_sizes, box_nums, box_len):
    """Inverse of :func:`pack_heads` (reference yolov3_decoder.py:89-117):
    split the merged tensor back into (N, H, W, B, box_len) per head."""
    (h8, w8), (h16, w16), (h32, w32) = head_grid_sizes
    b8, b16, b32 = box_nums
    n = merged.shape[0]
    c8 = b8 * box_len * 16
    c16 = b16 * box_len * 4
    p8 = merged[..., :c8].reshape(n, h8, w8, b8, box_len)
    p16 = merged[..., c8:c8 + c16].reshape(n, h16, w16, b16, box_len)
    p32 = merged[..., c8 + c16:].reshape(n, h32, w32, b32, box_len)
    return p8, p16, p32
