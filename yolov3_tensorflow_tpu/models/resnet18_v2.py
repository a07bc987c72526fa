"""ResNet-18-v2 backbone (reference: backbone/resnet18_v2.py:10-74).

Pre-activation variant: stem without BN/act; blocks are
bn+relu -> conv -> bn+relu -> conv -> add, with an extra bn_activation
applied to each of the three output taps.

TPU stem path: because the stem has no BN/relu, the flagship's fused
BN+pool+relu superkernel does not apply — the pool-only Pallas kernel
(ops/stem_pool.py max_pool_s2, -inf padding semantics, argmax-code
backward) replaces XLA's 2.8 ms select-and-scatter instead.  Its
[H,W,C,N] output threads into the first residual block via conv
dimension numbers (no transpose materializes), mirroring the flagship.
"""
from __future__ import annotations

from flax import linen as nn

from .layers import BasicBackbone, HwcnConv


class ResNet18V2(BasicBackbone):

    def _residual_v2_block(self, x, filters, is_nin=True, train=True,
                           strides=(1, 1), in_hwcn=False):
        """(resnet18_v2.py:14-37).  When is_nin, the NIN shortcut taps the
        PRE-ACTIVATED input; otherwise the raw input (identity).

        ``in_hwcn``: x arrives in the pool-only stem's [H,W,C,N] view;
        the pre-BN runs on channel_axis=2, conv1 and the NIN branch
        consume the view via conv dimension numbers (no transpose
        materializes) and the block continues in NHWC.  Param creation
        order (BN, Conv, BN, Conv, NIN Conv, BN) matches the classic
        path exactly — checkpoints stay backend-portable."""
        if in_hwcn:
            assert is_nin, "hwcn entry is the NIN-projected first block"
            pre = self.activation(
                self.batch_normalization(x, train, channel_axis=2))
            residual = HwcnConv(
                features=filters, kernel_size=(3, 3),
                strides=tuple(strides), in_hwcn=True, dtype=self.dtype,
                param_dtype=self.param_dtype)(pre)
            residual = self.bn_activation(residual, train=train)
            residual = self.conv(residual, filters)
            return self.element_wise_add(pre, residual, is_nin=True,
                                         train=train, in_hwcn=True)
        pre = self.bn_activation(x, train=train)
        residual = self.conv(pre, filters, strides=strides)
        residual = self.bn_activation(residual, train=train)
        residual = self.conv(residual, filters)
        if is_nin:
            return self.element_wise_add(pre, residual, is_nin=True,
                                         train=train)
        return self.element_wise_add(x, residual, is_nin=False, train=train)

    def _residual_v2_module(self, x, filters, train=True, strides=(1, 1),
                            in_hwcn=False):
        """(resnet18_v2.py:40-52)"""
        x = self._residual_v2_block(x, filters, is_nin=True, train=train,
                                    strides=strides, in_hwcn=in_hwcn)
        return self._residual_v2_block(x, filters, is_nin=False, train=train)

    @nn.compact
    def __call__(self, x, train: bool = True):
        """(resnet18_v2.py:55-74) -> (s8, s16, s32)."""
        if self.stem_pool_only_ok(x, train, filters=64):
            # conv -> pool-only superkernel (ops/stem_pool.py); the
            # pooled feature stays in the [H,W,C,N] view
            net = self.stem_conv_pool(x, 64, train)
            net = self._residual_v2_module(net, 64, train=train,
                                           in_hwcn=True)
        else:
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
