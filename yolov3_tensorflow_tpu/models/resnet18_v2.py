"""ResNet-18-v2 backbone (reference: backbone/resnet18_v2.py:10-74).

Pre-activation variant: stem without BN/act; blocks are
bn+relu -> conv -> bn+relu -> conv -> add, with an extra bn_activation
applied to each of the three output taps.
"""
from __future__ import annotations

from flax import linen as nn

from .layers import BasicBackbone


class ResNet18V2(BasicBackbone):

    def _residual_v2_block(self, x, filters, is_nin=True, train=True,
                           strides=(1, 1)):
        """(resnet18_v2.py:14-37).  When is_nin, the NIN shortcut taps the
        PRE-ACTIVATED input; otherwise the raw input (identity)."""
        pre = self.bn_activation(x, train=train)
        residual = self.conv(pre, filters, strides=strides)
        residual = self.bn_activation(residual, train=train)
        residual = self.conv(residual, filters)
        if is_nin:
            return self.element_wise_add(pre, residual, is_nin=True,
                                         train=train)
        return self.element_wise_add(x, residual, is_nin=False, train=train)

    def _residual_v2_module(self, x, filters, train=True, strides=(1, 1)):
        """(resnet18_v2.py:40-52)"""
        x = self._residual_v2_block(x, filters, is_nin=True, train=train,
                                    strides=strides)
        return self._residual_v2_block(x, filters, is_nin=False, train=train)

    @nn.compact
    def __call__(self, x, train: bool = True):
        """(resnet18_v2.py:55-74) -> (s8, s16, s32)."""
        net = self.conv(x, 64, strides=(2, 2))
        net = self.max_pool(net)

        net = self._residual_v2_module(net, 64, train=train)
        s8 = self._residual_v2_module(net, 128, train=train, strides=(2, 2))
        s16 = self._residual_v2_module(s8, 256, train=train, strides=(2, 2))
        s32 = self._residual_v2_module(s16, 512, train=train, strides=(2, 2))

        s8 = self.bn_activation(s8, train=train)
        s16 = self.bn_activation(s16, train=train)
        s32 = self.bn_activation(s32, train=train)
        return s8, s16, s32
