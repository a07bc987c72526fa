"""MixNet-18 backbone (reference: backbone/mixnet18.py:11-83).

MixConv-style residual blocks: channels split by cumulative ratio
[8,4,2,2]/16 -> depthwise conv with kernel sizes (3,5,7,9) per split ->
concat; otherwise the ResNet-18 topology.  The reference's slices here are
already disjoint (mixnet18.py:19-20,42), so behaviour matches exactly.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from flax import linen as nn

from .layers import BasicBackbone

MIX_KERNEL_SIZES = ((3, 3), (5, 5), (7, 7), (9, 9))
_RATIO = np.array([0, 8, 4, 2, 2], dtype=np.float64)
MIX_KERNEL_RATIO = _RATIO.cumsum() / _RATIO.sum()


class MixNet18(BasicBackbone):

    def _mix_residual_block(self, x, filters, is_nin=True, train=True,
                            strides=(1, 1)):
        """(mixnet18.py:23-48)"""
        residual = self.conv_bn(x, filters, train=train, strides=strides)
        residual = self.activation(residual)

        bounds = (filters * MIX_KERNEL_RATIO).astype(np.int64)
        outs = []
        for i, ksize in enumerate(MIX_KERNEL_SIZES):
            chunk = residual[:, :, :, int(bounds[i]):int(bounds[i + 1])]
            outs.append(self.depthwise_conv_bn(chunk, train=train,
                                               kernel_size=ksize))
        merged = jnp.concatenate(outs, axis=-1)
        out = self.element_wise_add(x, merged, is_nin=is_nin, train=train)
        return self.activation(out)

    def _mix_residual_module(self, x, filters, train=True, strides=(1, 1)):
        """(mixnet18.py:51-63)"""
        x = self._mix_residual_block(x, filters, is_nin=True, train=train,
                                     strides=strides)
        return self._mix_residual_block(x, filters, is_nin=False, train=train)

    @nn.compact
    def __call__(self, x, train: bool = True):
        """(mixnet18.py:66-83) -> (s8, s16, s32)."""
        net = self.stem_pooled_nhwc(x, 64, train)

        net = self._mix_residual_module(net, 64, train=train)
        s8 = self._mix_residual_module(net, 128, train=train, strides=(2, 2))
        s16 = self._mix_residual_module(s8, 256, train=train, strides=(2, 2))
        s32 = self._mix_residual_module(s16, 512, train=train, strides=(2, 2))
        return s8, s16, s32
