"""ResNet-18 backbone (reference: backbone/resnet18.py:14-69).

Modified ResNet-18: 3x3/2 conv_bn stem + 3x3/2 maxpool, then four residual
modules of two blocks each (first block NIN-projected), filters
64/128/256/512, emitting the stride-8/16/32 feature triple.
"""
from __future__ import annotations

from flax import linen as nn

from .layers import BasicBackbone, HwcnConv


class ResNet18(BasicBackbone):

    def _residual_block(self, x, filters, is_nin=True, train=True,
                        strides=(1, 1), in_hwcn=False):
        """input-> conv+bn->relu-> conv+bn-> add->relu
        (resnet18.py:18-35).

        ``in_hwcn``: x arrives in the fused stem's [H,W,C,N] view; conv1
        and the NIN branch consume it via conv dimension numbers (no
        transpose materializes) and the block continues in NHWC.

        Fused Winograd path (train, TPU, stride 1): both 3x3 convs run
        as single fused kernels — conv1 computes its BN statistics in
        the output epilogue, conv2 applies bn1+relu in its input read
        (no standalone apply pass) and computes bn2's statistics; only
        the block-boundary add+relu materializes an activation."""
        if in_hwcn:
            residual = HwcnConv(
                features=filters, kernel_size=(3, 3),
                strides=tuple(strides), in_hwcn=True, dtype=self.dtype,
                param_dtype=self.param_dtype)(x)
            residual = self.batch_normalization(residual, train)
            residual = self.activation(residual)
            residual = self.conv_bn(residual, filters, train=train)
            out = self.element_wise_add(x, residual, is_nin=is_nin,
                                        train=train, in_hwcn=True)
            return self.activation(out)
        if strides == (1, 1) and self.fused_ok(x, filters, train):
            y1, st1 = self.fused_conv_stats(x, filters)
            inv1, shift1 = self.bn_scalars(y1.shape, st1, train)
            y2, st2 = self.fused_conv_stats(y1, filters,
                                            prologue=(inv1, shift1))
            inv2, shift2 = self.bn_scalars(y2.shape, st2, train)
            residual = self.bn_apply(y2, inv2, shift2)
            out = self.element_wise_add(x, residual, is_nin=is_nin,
                                        train=train)
            return self.activation(out)
        residual = self.conv_bn(x, filters, train=train, strides=strides)
        residual = self.activation(residual)
        residual = self.conv_bn(residual, filters, train=train)
        out = self.element_wise_add(x, residual, is_nin=is_nin, train=train)
        return self.activation(out)

    def _residual_module(self, x, filters, train=True, strides=(1, 1),
                         in_hwcn=False):
        """Two blocks; only the first is NIN-projected (resnet18.py:38-50)."""
        x = self._residual_block(x, filters, is_nin=True, train=train,
                                 strides=strides, in_hwcn=in_hwcn)
        return self._residual_block(x, filters, is_nin=False, train=train)

    @nn.compact
    def __call__(self, x, train: bool = True):
        """(resnet18.py:53-69) -> (s8, s16, s32) NHWC features."""
        stem_fused = self.stem_fused_ok(x, train)
        if stem_fused:
            # conv -> BN+maxpool+relu superkernel (ops/stem_pool.py);
            # the pooled feature stays in the [H,W,C,N] view and module
            # 1's first block consumes it via conv dimension numbers
            net = self.stem_conv_bn_pool_relu(x, 64, train)
        else:
            net = self.conv_bn(x, 64, train=train, strides=(2, 2))
            net = self.max_pool(net)
            net = self.activation(net)

        net = self._residual_module(net, 64, train=train,
                                    in_hwcn=stem_fused)
        s8 = self._residual_module(net, 128, train=train, strides=(2, 2))
        s16 = self._residual_module(s8, 256, train=train, strides=(2, 2))
        s32 = self._residual_module(s16, 512, train=train, strides=(2, 2))
        return s8, s16, s32
