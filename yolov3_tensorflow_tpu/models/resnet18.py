"""ResNet-18 backbone (reference: backbone/resnet18.py:14-69).

Modified ResNet-18: 3x3/2 conv_bn stem + 3x3/2 maxpool, then four residual
modules of two blocks each (first block NIN-projected), filters
64/128/256/512, emitting the stride-8/16/32 feature triple.

Winograd chain (``conv_backend="winograd"``, train): the whole backbone
runs on the [H, W, C, N] view (the fused stem's native layout) as a
chain of fused Pallas convolutions with DEFERRED residual boundaries —
each block's trailing bn-apply + add + relu rides the NEXT block's
first conv as a 2-input prologue (ops/winograd.py PRO_BN_ADD), so no
XLA elementwise pass materializes between custom calls.  The chain
state between blocks is ``('def', y_raw, identity, inv, shift)``;
materialization happens only at module boundaries (stride-2 blocks and
the s8/s16/s32 taps).  Parameter creation order per block (Conv, BN,
Conv, BN, [NIN Conv, BN]) matches the classic path exactly, so
checkpoints are backend-portable.
"""
from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from .layers import BasicBackbone, HwcnConv


class ResNet18(BasicBackbone):

    # ------------------------------------------------- classic path ----
    def _residual_block(self, x, filters, is_nin=True, train=True,
                        strides=(1, 1), in_hwcn=False):
        """input-> conv+bn->relu-> conv+bn-> add->relu
        (resnet18.py:18-35).

        ``in_hwcn``: x arrives in the fused stem's [H,W,C,N] view; conv1
        and the NIN branch consume it via conv dimension numbers (no
        transpose materializes) and the block continues in NHWC."""
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

    # ----------------------------------------------- winograd chain ----
    def _materialize(self, state):
        """Chain state -> [H,W,C,N] tensor: the deferred boundary
        relu(bn(y) + ident) is evaluated as one XLA elementwise pass
        (only at module boundaries / taps)."""
        if state[0] == "mat":
            return state[1]
        _, y, ident, inv, shift = state
        return self.activation(
            self.bn_apply(y, inv, shift, channel_axis=2)
            + ident.astype(self.dtype))

    def _nin_hwcn(self, x, filters, train):
        """1x1 NIN projection + BN on the identity branch, [H,W,C,N]
        in and out (basic_backbone.py:102-125, stride 1 case)."""
        ident = HwcnConv(features=filters, kernel_size=(1, 1),
                         strides=(1, 1), in_hwcn=True, out_hwcn=True,
                         dtype=self.dtype,
                         param_dtype=self.param_dtype)(x)
        return self.batch_normalization(ident, train, channel_axis=2)

    def _chain_block_hwcn(self, x, filters, is_nin, train, strides):
        """Classic residual block entirely on the [H,W,C,N] view (used
        inside the winograd chain for blocks the fused kernel cannot
        take: stride-2 first blocks of modules 2-4)."""
        residual = HwcnConv(features=filters, kernel_size=(3, 3),
                            strides=tuple(strides), in_hwcn=True,
                            out_hwcn=True, dtype=self.dtype,
                            param_dtype=self.param_dtype)(x)
        residual = self.batch_normalization(residual, train,
                                            channel_axis=2)
        residual = self.activation(residual)
        residual = HwcnConv(features=filters, kernel_size=(3, 3),
                            strides=(1, 1), in_hwcn=True, out_hwcn=True,
                            dtype=self.dtype,
                            param_dtype=self.param_dtype)(residual)
        residual = self.batch_normalization(residual, train,
                                            channel_axis=2)
        if is_nin:
            sh = int(round(x.shape[0] / residual.shape[0]))
            sw = int(round(x.shape[1] / residual.shape[1]))
            ident = HwcnConv(features=filters, kernel_size=(1, 1),
                             strides=(sh, sw), in_hwcn=True,
                             out_hwcn=True, dtype=self.dtype,
                             param_dtype=self.param_dtype)(x)
            ident = self.batch_normalization(ident, train, channel_axis=2)
        else:
            ident = x
        return self.activation(ident.astype(self.dtype) + residual)

    def _chain_residual_block(self, state, filters, is_nin, train,
                              strides=(1, 1)):
        """One residual block as part of the fused winograd chain.
        Takes and returns a chain state ('mat', x) | ('def', ...)."""
        # y_raw ('def') and the materialized tensor ('mat') share the
        # flowing [H,W,C,N] shape
        shape = state[1].shape
        if strides != (1, 1) or not self.chain_ok(shape, filters, train):
            x = self._materialize(state)
            return ("mat", self._chain_block_hwcn(x, filters, is_nin,
                                                  train, strides))
        if state[0] == "mat":
            x = state[1]
            a_prev = x
            y1, st1 = self.fused_conv_stats(x, filters)
        else:
            _, y_prev, ident_prev, inv_p, shift_p = state
            y1, a_prev, st1 = self.fused_conv_stats(
                y_prev, filters, prologue=(inv_p, shift_p),
                ident=ident_prev)
        inv1, shift1 = self.bn_scalars(self.hwcn_count(y1.shape),
                                       st1, train)
        y2, st2 = self.fused_conv_stats(y1, filters,
                                        prologue=(inv1, shift1))
        inv2, shift2 = self.bn_scalars(self.hwcn_count(y2.shape),
                                       st2, train)
        ident = self._nin_hwcn(a_prev, filters, train) if is_nin \
            else a_prev
        return ("def", y2, ident, inv2, shift2)

    def _chain_module(self, state, filters, train, strides=(1, 1)):
        state = self._chain_residual_block(state, filters, True, train,
                                           strides=strides)
        return self._chain_residual_block(state, filters, False, train)

    # ------------------------------------------------------- entry ----
    @nn.compact
    def __call__(self, x, train: bool = True):
        """(resnet18.py:53-69) -> (s8, s16, s32) NHWC features."""
        stem_fused = self.stem_fused_ok(x, train, filters=64)
        n, h, w, _ = x.shape
        # per-shape chain engagement (the floor excludes module 1 by
        # default — at 64ch the winograd MAC cut cancels against MXU
        # underutilization, PERF.md round-3 per-shape table)
        chain_m1 = (self.conv_backend != "xla" and train
                    and self.chain_ok((h // 4, w // 4, 64, n), 64, train))
        chain_deep = (self.conv_backend != "xla" and train
                      and self.chain_ok((h // 8, w // 8, 128, n), 128,
                                        train))
        if stem_fused:
            # conv -> BN+maxpool+relu superkernel (ops/stem_pool.py);
            # the pooled feature stays in the [H,W,C,N] view
            net = self.stem_conv_bn_pool_relu(x, 64, train)
        else:
            net = self.conv_bn(x, 64, train=train, strides=(2, 2))
            net = self.max_pool(net)
            net = self.activation(net)
            if chain_m1:
                net = jnp.transpose(net.astype(self.dtype), (1, 2, 3, 0))

        to_nhwc = lambda t: jnp.transpose(t, (3, 0, 1, 2))  # noqa: E731
        if chain_m1 or chain_deep:
            if chain_m1:
                state = self._chain_module(("mat", net), 64, train)
            else:
                # module 1 on the classic NHWC path (XLA's fastest
                # layout for the 64ch convs), then enter the chain
                net = self._residual_module(net, 64, train=train,
                                            in_hwcn=stem_fused)
                state = ("mat",
                         jnp.transpose(net.astype(self.dtype),
                                       (1, 2, 3, 0)))
            state = self._chain_module(state, 128, train, strides=(2, 2))
            s8h = self._materialize(state)
            state = self._chain_module(("mat", s8h), 256, train,
                                       strides=(2, 2))
            s16h = self._materialize(state)
            state = self._chain_module(("mat", s16h), 512, train,
                                       strides=(2, 2))
            s32h = self._materialize(state)
            return to_nhwc(s8h), to_nhwc(s16h), to_nhwc(s32h)

        net = self._residual_module(net, 64, train=train,
                                    in_hwcn=stem_fused)
        s8 = self._residual_module(net, 128, train=train, strides=(2, 2))
        s16 = self._residual_module(s8, 256, train=train, strides=(2, 2))
        s32 = self._residual_module(s16, 512, train=train, strides=(2, 2))
        return s8, s16, s32
