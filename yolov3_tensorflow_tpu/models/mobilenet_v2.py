"""MobileNet-v2 backbone (reference: backbone/mobilenet_v2.py:10-76).

Inverted-residual / linear-bottleneck network: 1x1 expand (x ratio) ->
3x3 depthwise -> 1x1 linear bottleneck, with identity skips; taps at
stride 8 (64ch), stride 16 (96ch) and stride 32 (512ch after a final 1x1).
"""
from __future__ import annotations

from flax import linen as nn

from .layers import BasicBackbone


class MobileNetV2(BasicBackbone):

    def _expand_depthwise_linear(self, x, filters, expand_ratio=6,
                                 strides=(2, 2), train=True):
        """(mobilenet_v2.py:19-38)"""
        depthwise_filters = expand_ratio * x.shape[-1]
        net = self.conv_bn(x, depthwise_filters, train=train,
                           kernel_size=(1, 1))
        net = self.activation(net)
        net = self.depthwise_conv_bn(net, train=train, strides=strides)
        net = self.activation(net)
        # linear bottleneck: no activation
        net = self.conv_bn(net, filters, train=train, kernel_size=(1, 1))
        return net

    def _inverted_residual_module(self, x, filters, expand_ratio=6,
                                  strides=(2, 2), train=True):
        """(mobilenet_v2.py:13-16)"""
        net = self._expand_depthwise_linear(x, filters, expand_ratio, strides,
                                            train=train)
        return self.element_wise_add(x, net, is_nin=False, train=train)

    @nn.compact
    def __call__(self, x, train: bool = True):
        """(mobilenet_v2.py:41-76) -> (s8, s16, s32)."""
        net = self.conv_bn(x, 32, train=train, strides=(2, 2))
        net = self.activation(net)

        net = self._expand_depthwise_linear(net, 16, 1, (1, 1), train=train)

        net = self._expand_depthwise_linear(net, 24, 6, (2, 2), train=train)
        net = self._inverted_residual_module(net, 24, 6, (1, 1), train=train)

        net = self._expand_depthwise_linear(net, 32, 6, (2, 2), train=train)
        net = self._inverted_residual_module(net, 32, 6, (1, 1), train=train)
        net = self._inverted_residual_module(net, 32, 6, (1, 1), train=train)

        net = self._expand_depthwise_linear(net, 64, 6, (1, 1), train=train)
        net = self._inverted_residual_module(net, 64, 6, (1, 1), train=train)
        net = self._inverted_residual_module(net, 64, 6, (1, 1), train=train)
        s8 = self._inverted_residual_module(net, 64, 6, (1, 1), train=train)

        net = self._expand_depthwise_linear(s8, 96, 6, (2, 2), train=train)
        net = self._inverted_residual_module(net, 96, 6, (1, 1), train=train)
        s16 = self._inverted_residual_module(net, 96, 6, (1, 1), train=train)

        net = self._expand_depthwise_linear(s16, 160, 6, (2, 2), train=train)
        net = self._inverted_residual_module(net, 160, 6, (1, 1), train=train)
        net = self._inverted_residual_module(net, 160, 6, (1, 1), train=train)

        net = self._expand_depthwise_linear(net, 320, 6, (1, 1), train=train)
        net = self.conv_bn(net, 512, train=train, kernel_size=(1, 1))
        s32 = self.activation(net)
        return s8, s16, s32
