"""Backbone op vocabulary — TPU-native (flax) re-design of the reference's
``BasicBackbone`` (reference: backbone/basic_backbone.py:9-163).

Semantics preserved:
  * conv: 3x3 same, he_normal init, no bias, L2(5e-4) weight decay
    (basic_backbone.py:20-43) — here the L2 terms are computed explicitly by
    :func:`l2_regularization` and added to the loss (Keras puts them in
    ``model.losses``; optax decoupled weight-decay would change numbers).
  * depthwise conv: same regularization (basic_backbone.py:45-66).
  * batch norm: momentum 0.9, eps 1e-5, channel axis, gamma L2(1e-5)
    (basic_backbone.py:68-78).
  * element_wise_add: residual merge with optional 1x1 NIN + BN projection,
    stride inferred from the spatial-shape ratio (basic_backbone.py:102-125).
  * fused conv_bn / depthwise_conv_bn / bn_activation helpers
    (basic_backbone.py:127-163).

TPU-native deltas: convolutions run in bfloat16 on the MXU (fp32 master
params); BN and activations run in fp32.  Layout is NHWC throughout, which is
XLA's preferred TPU conv layout.
"""
from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

L2_CONV_DECAY = 5.0e-4  # conv kernel weight decay (basic_backbone.py:11)
BN_L2_GAMMA_DECAY = 1.0e-5  # BN gamma weight decay (basic_backbone.py:12)
BN_MOMENTUM = 0.9  # (basic_backbone.py:13)
BN_EPSILON = 1e-5  # (basic_backbone.py:14)

# Param-tree name marker for the three detection-head output convs: the
# reference creates them as plain keras Conv2D with bias and NO kernel
# regularizer (yolov3_detector.py:98-100), so l2_regularization must skip
# them.  Any module whose name contains this marker is excluded.
HEAD_OUT_MARKER = "head_out"


class FusedBatchNorm(nn.Module):
    """BatchNorm with fp32 statistics but compute-dtype (bf16) tensor I/O.

    flax's nn.BatchNorm promotes the whole activation to its ``dtype``;
    running it in fp32 doubles HBM traffic on the bf16 conv path, while
    running it fully in bf16 degrades the mean/var accumulation.  This
    variant casts only inside the reductions: stats and running averages are
    fp32, the normalized output is ``dtype``.
    """

    use_running_average: bool = False
    momentum: float = 0.9
    epsilon: float = 1e-5
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32
    channel_axis: int = -1  # -1 for NHWC, 2 for the [H,W,C,N] stem view
    features: int | None = None  # required only for stats="running"
    @nn.compact
    def __call__(self, x=None, stats=None):
        """Classic mode (``x``): normalize the tensor.  Stats mode
        (``stats=(sum, sumsq, count)``, fused Winograd path): the
        statistics were already accumulated in a conv epilogue — update
        the running averages and return the fp32 ``(inv, shift)`` apply
        scalars; the apply itself rides the consumer's input read.
        ``stats="running"`` (inference, needs ``features``): return the
        ``(inv, shift)`` scalars from the running averages without
        touching any activation — the fused eval stem applies them
        inside its kernel."""
        ax = self.channel_axis
        if x is not None:
            features = x.shape[ax]
        elif stats == "running":
            assert self.features is not None, \
                "stats='running' needs the features field"
            features = self.features
        else:
            features = stats[0].shape[-1]
        scale = self.param("scale", nn.initializers.ones, (features,),
                           self.param_dtype)
        bias = self.param("bias", nn.initializers.zeros, (features,),
                          self.param_dtype)
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((features,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((features,), jnp.float32))
        if self.use_running_average:
            assert stats is None or stats == "running", \
                "batch-stats mode is train-only"
            mean, var = ra_mean.value, ra_var.value
        else:
            assert stats != "running", "stats='running' is eval-only"
            if stats is not None:
                s, q, count = stats
                mean = s / count
                mean2 = q / count
            else:
                x32 = x.astype(jnp.float32)
                axes = tuple(a for a in range(x32.ndim)
                             if a != ax % x32.ndim)
                mean = jnp.mean(x32, axis=axes)
                mean2 = jnp.mean(jnp.square(x32), axis=axes)
            var = jnp.maximum(mean2 - jnp.square(mean), 0.0)
            if not self.is_initializing():
                m = self.momentum
                ra_mean.value = m * ra_mean.value \
                    + (1 - m) * jax.lax.stop_gradient(mean)
                ra_var.value = m * ra_var.value \
                    + (1 - m) * jax.lax.stop_gradient(var)
        inv = jax.lax.rsqrt(var + self.epsilon) * scale.astype(jnp.float32)
        shift = bias.astype(jnp.float32) - mean * inv
        if stats is not None:
            return inv, shift
        bshape = [1] * x.ndim
        bshape[ax % x.ndim] = features
        y = x.astype(self.dtype) \
            * inv.reshape(bshape).astype(self.dtype) \
            + shift.reshape(bshape).astype(self.dtype)
        return y


class WinogradConv3x3(nn.Module):
    """3x3/s1/SAME conv on the fused Winograd Pallas kernel
    (ops/winograd.py), operating on the [H, W, C, N] view.  Param
    subtree ({kernel}) and the auto-name "Conv_N" match nn.Conv exactly
    (shared flax name counter), so checkpoints and the parity weight
    mapping are backend-independent.

    Called with ``prologue=(inv, shift)`` the previous BatchNorm's
    apply + relu ride the conv's input read; with ``ident`` as well,
    the previous RESIDUAL BOUNDARY (add + relu) rides the read and the
    boundary activation is returned as a second output.  The return
    always ends with ``(sum, sumsq)`` — this conv's output statistics,
    accumulated in the kernel epilogue for the NEXT BatchNorm."""

    features: int
    kernel_init: Any = nn.initializers.he_normal()
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, prologue=None, ident=None):
        from ..ops.winograd import (hconv_bn_act_stats,
                                    hconv_bn_add_act_stats, hconv_stats)
        kernel = self.param(
            "kernel", self.kernel_init,
            (3, 3, x.shape[2], self.features), self.param_dtype)
        k = kernel.astype(self.dtype)
        x = x.astype(self.dtype)
        if ident is not None:
            y, a, s, q = hconv_bn_add_act_stats(
                x, ident.astype(self.dtype), k, *prologue)
            return y, a, (s, q)
        if prologue is not None:
            y, s, q = hconv_bn_act_stats(x, k, *prologue)
        else:
            y, s, q = hconv_stats(x, k)
        return y, (s, q)


WinogradConv3x3.__name__ = "Conv"  # share flax's Conv_N name counter


class HwcnConv(nn.Module):
    """XLA convolution that speaks the [H, W, C, N] activation view via
    conv dimension numbers — used around the fused stem kernel so the
    HWCN tensors flow conv-to-conv without any transpose materializing.
    Param subtree ({kernel}, HWIO) and auto-name "Conv_N" match nn.Conv
    exactly (shared name counter): checkpoints are layout-agnostic."""

    features: int
    kernel_size: Tuple[int, int] = (3, 3)
    strides: Tuple[int, int] = (1, 1)
    in_hwcn: bool = False
    out_hwcn: bool = False
    kernel_init: Any = nn.initializers.he_normal()
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        cin = x.shape[2] if self.in_hwcn else x.shape[3]
        kernel = self.param(
            "kernel", self.kernel_init,
            (*self.kernel_size, cin, self.features), self.param_dtype)
        dn = (("HWCN" if self.in_hwcn else "NHWC"), "HWIO",
              ("HWCN" if self.out_hwcn else "NHWC"))
        return jax.lax.conv_general_dilated(
            x.astype(self.dtype), kernel.astype(self.dtype),
            window_strides=tuple(self.strides), padding="SAME",
            dimension_numbers=dn, preferred_element_type=self.dtype)


HwcnConv.__name__ = "Conv"  # share flax's Conv_N name counter


class QuantConv(nn.Module):
    """Post-training-quantized int8 inference conv (ops/quantize.py).

    Drop-in replacement for the eligible nn.Conv instances when the
    backbone runs with ``quant != "none"``: the param subtree
    ({kernel}, HWIO) and the auto-name "Conv_N" match nn.Conv exactly
    (shared flax name counter), so the SAME checkpoint params load on
    either path.  Adds one scalar per conv in the "quant" collection:

      * ``mode="calibrate"``: runs the ordinary bf16 conv and records
        the running abs-max of its INPUT into ``quant/act_absmax``
        (mutable apply); call over a calibration set.
      * ``mode="int8"``: quantizes the input with the calibrated scale,
        the kernel per-output-channel, and runs the int8 MXU conv.
    """

    features: int
    kernel_size: Tuple[int, int] = (3, 3)
    strides: Tuple[int, int] = (1, 1)
    padding: str = "SAME"
    mode: str = "int8"  # int8 | calibrate
    kernel_init: Any = nn.initializers.he_normal()
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        from ..ops.quantize import quantized_conv
        kernel = self.param(
            "kernel", self.kernel_init,
            (*self.kernel_size, x.shape[-1], self.features),
            self.param_dtype)
        amax = self.variable("quant", "act_absmax",
                             lambda: jnp.zeros((), jnp.float32))
        if self.mode == "calibrate":
            if not self.is_initializing():
                amax.value = jnp.maximum(
                    amax.value, jnp.max(jnp.abs(x.astype(jnp.float32))))
            return jax.lax.conv_general_dilated(
                x.astype(self.dtype), kernel.astype(self.dtype),
                window_strides=tuple(self.strides), padding=self.padding,
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=self.dtype)
        assert self.mode == "int8", f"unknown quant mode {self.mode!r}"
        return quantized_conv(x, kernel, amax.value,
                              strides=tuple(self.strides),
                              padding=self.padding, out_dtype=self.dtype)


QuantConv.__name__ = "Conv"  # share flax's Conv_N name counter


class BlockDiagConv(nn.Module):
    """Grouped conv run as ONE dense conv over a block-diagonal kernel.

    Pure-XLA reformulation of ``feature_group_count=G`` convolution for
    ResNeXt's grouped buckets (reference backbone/resnext.py:52-62): on
    this backend XLA's grouped-conv fusions measure at 2-4% of their own
    roofline bounds (PERF.md round-4 five-backbone audit), while dense
    convs run near peak.  The dense form pays G× the MACs but escapes the
    utilization hole when G× < the measured slack.

    Parameters are IDENTICAL to the grouped nn.Conv — kernel shape
    ``(kh, kw, cin//G, cout)``, auto-name "Conv_N" (shared flax counter) —
    so the same checkpoints load on either path, and he_normal sees the
    same fan-in.  The dense ``(kh, kw, cin, cout)`` kernel is materialized
    per step by an outer product with ``eye(G)``: output channel
    ``g*og + o`` reads input channels ``g*cg .. (g+1)*cg`` and zeros
    elsewhere — exactly the grouped-conv contraction (0·x adds exactly 0,
    so values match the grouped path up to reduction order).  Autodiff
    through the eye-product slices the dense wgrad back onto the
    block-diagonal for free.
    """

    features: int
    kernel_size: Tuple[int, int] = (3, 3)
    strides: Tuple[int, int] = (1, 1)
    padding: str = "SAME"
    feature_group_count: int = 1
    kernel_init: Any = nn.initializers.he_normal()
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        g = self.feature_group_count
        cin = x.shape[-1]
        if cin % g or self.features % g:
            raise ValueError(f"channels ({cin}->{self.features}) must "
                             f"divide the group count {g}")
        cg, og = cin // g, self.features // g
        kernel = self.param(
            "kernel", self.kernel_init,
            (*self.kernel_size, cg, self.features), self.param_dtype)
        k = kernel.astype(self.dtype).reshape(
            *self.kernel_size, cg, g, og)
        eye = jnp.eye(g, dtype=self.dtype)
        # dense[h, w, (d, c), (g, o)] = k[h, w, c, g, o] * eye[d, g]
        dense = jnp.einsum("hwcgo,dg->hwdcgo", k, eye).reshape(
            *self.kernel_size, cin, self.features)
        return jax.lax.conv_general_dilated(
            x.astype(self.dtype), dense,
            window_strides=tuple(self.strides), padding=self.padding,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=self.dtype)


BlockDiagConv.__name__ = "Conv"  # share flax's Conv_N name counter


class BasicBackbone(nn.Module):
    """Base module giving all backbones the shared op vocabulary."""

    dtype: Any = jnp.bfloat16  # conv compute dtype (MXU)
    param_dtype: Any = jnp.float32
    conv_backend: str = "auto"  # auto | winograd | xla
    stem_backend: str = "auto"  # auto | fused | xla
    # grouped (1 < G < channels) convs: "grouped" = XLA
    # feature_group_count; "dense" = one dense conv over a materialized
    # block-diagonal kernel (BlockDiagConv).  Depthwise convs (G ==
    # channels) always stay grouped — the dense form there is C× the
    # MACs against a 1/C-dense mask.  "auto": see _use_dense_grouped.
    grouped_backend: str = "auto"  # auto | grouped | dense
    # channel floor for the fused winograd chain (see Config)
    winograd_min_channels: int = 128
    # post-training int8 inference (ops/quantize.py): "none" for
    # training and plain eval; "calibrate" records activation abs-max
    # into the "quant" collection; "int8" runs the eligible convs on
    # the int8 path with the calibrated scales.  Eval-only modes.
    quant: str = "none"  # none | calibrate | int8

    def _use_winograd(self, x, filters, kernel_size, strides, padding,
                      feature_group_count) -> bool:
        from ..ops.winograd import eligible
        if self.conv_backend == "xla":
            return False
        shape = x if isinstance(x, tuple) else x.shape  # NHWC order
        min_c = self.winograd_min_channels
        if min_c and (shape[3] < min_c or filters < min_c):
            # at 64 channels the F(2,3) MAC cut is exactly cancelled by
            # halved MXU utilization (contraction fills half the
            # systolic rows) — measured per-shape, PERF.md round 3
            return False
        if not eligible(shape, filters, kernel_size, strides, padding,
                        feature_group_count):
            return False
        if self.conv_backend == "winograd":
            return True
        # "auto" currently resolves to direct convolution: on this
        # backend XLA's conv<->BN fusion clusters outrun the fused
        # Winograd chain end-to-end at every measured granularity
        # (PERF.md round-2/3 measurement series)
        return False

    def _use_dense_grouped(self, x, filters, feature_group_count) -> bool:
        """Route a grouped (non-depthwise) conv onto the block-diagonal
        dense formulation?  "auto" resolves per measurement (PERF.md
        round-5 resnext A/B)."""
        g = feature_group_count
        if g <= 1 or g >= x.shape[-1]:
            return False  # dense 1x1 groups == depthwise: never
        if self.grouped_backend == "dense":
            return True
        if self.grouped_backend == "grouped":
            return False
        # "auto" = dense, from the round-5 same-session TPU A/B
        # (PERF.md round-5): resnext-18 b128 train 91.3 ms (dense) vs
        # 94.1 (mixed G>=8) vs 97.2 (grouped) — device 84.55 vs 89.30
        # traced; infer is a 2% wash (4,535/4,636/4,550 img/s).  Dense
        # pays G× the MACs but escapes the grouped fusions' 2-4%-of-
        # bound utilization hole (per-group MXU lane fill 4-8/128).
        # Caveat: the dense TRAIN program's remote compile took ~25 min
        # vs ~8 grouped (first compile per shape; cached after).
        return True

    # ------------------------------------------------------------- ops --
    def conv(self, x, filters, kernel_size=(3, 3), strides=(1, 1),
             padding="SAME", use_bias=False, feature_group_count=1):
        """Conv with he_normal init, default 3x3/1 same, no bias
        (basic_backbone.py:20-43).  Always direct XLA convolution — the
        Winograd kernel only enters through the FUSED helpers below
        (a bare conv swap measured net-negative: it breaks XLA's
        conv<->BN fusion clusters).  With ``quant != "none"`` the
        measured-eligible shapes (ops/quantize.py gate) run on the
        int8 PTQ path instead."""
        if self.quant != "none":
            from ..ops.quantize import quant_eligible
            if quant_eligible(x.shape, filters, kernel_size, strides,
                              feature_group_count, use_bias, padding):
                return QuantConv(
                    features=filters,
                    kernel_size=tuple(kernel_size),
                    strides=tuple(strides),
                    padding=padding,
                    mode=self.quant,
                    kernel_init=nn.initializers.he_normal(),
                    dtype=self.dtype,
                    param_dtype=self.param_dtype,
                )(x)
        if self._use_dense_grouped(x, filters, feature_group_count):
            assert not use_bias, "dense grouped path is bias-free"
            return BlockDiagConv(
                features=filters,
                kernel_size=tuple(kernel_size),
                strides=tuple(strides),
                padding=padding,
                feature_group_count=feature_group_count,
                kernel_init=nn.initializers.he_normal(),
                dtype=self.dtype,
                param_dtype=self.param_dtype,
            )(x)
        return nn.Conv(
            features=filters,
            kernel_size=tuple(kernel_size),
            strides=tuple(strides),
            padding=padding,
            use_bias=use_bias,
            feature_group_count=feature_group_count,
            kernel_init=nn.initializers.he_normal(),
            dtype=self.dtype,
            param_dtype=self.param_dtype,
        )(x)

    def depthwise_conv(self, x, kernel_size=(3, 3), strides=(1, 1)):
        """Depthwise conv (basic_backbone.py:45-66): one filter per input
        channel, expressed as a grouped conv with group_count == channels
        (XLA lowers this to a TPU depthwise conv)."""
        channels = x.shape[-1]
        return self.conv(x, channels, kernel_size=kernel_size, strides=strides,
                         feature_group_count=channels)

    def batch_normalization(self, x, train: bool, channel_axis: int = -1):
        """BN with momentum .9 / eps 1e-5 (basic_backbone.py:68-78).

        TPU note: statistics accumulate in fp32 (cast fused into the
        reduction) but the normalized tensor I/O stays in the compute dtype,
        so the conv->bn->relu chain never materializes fp32 activations in
        HBM — the training step is bandwidth-bound otherwise.
        ``channel_axis=2`` normalizes the [H,W,C,N] view in place."""
        return FusedBatchNorm(
            use_running_average=not train,
            momentum=BN_MOMENTUM,
            epsilon=BN_EPSILON,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            channel_axis=channel_axis,
        )(x)

    @staticmethod
    def activation(x, activation: str = "relu"):
        """(basic_backbone.py:80-90) plus the custom h_swish
        (basic_backbone.py:92-100)."""
        if activation == "relu":
            return nn.relu(x)
        if activation == "h_swish":
            return x * jnp.clip(x + 3.0, 0.0, 6.0) / 6.0
        raise ValueError(f"unknown activation {activation!r}")

    def element_wise_add(self, identity, residual, is_nin: bool = False,
                         train: bool = True, in_hwcn: bool = False):
        """Residual merge; optional 1x1 NIN conv + BN on the identity branch
        with stride inferred from the spatial-shape ratio
        (basic_backbone.py:102-125).  ``in_hwcn``: identity arrives in the
        [H,W,C,N] stem view — the NIN conv consumes it via dimension
        numbers and emits NHWC (is_nin is mandatory then)."""
        if is_nin:
            if in_hwcn:
                stride_h = int(round(identity.shape[0] / residual.shape[1]))
                stride_w = int(round(identity.shape[1] / residual.shape[2]))
                identity = HwcnConv(
                    features=residual.shape[-1], kernel_size=(1, 1),
                    strides=(stride_h, stride_w), in_hwcn=True,
                    dtype=self.dtype, param_dtype=self.param_dtype)(identity)
            else:
                stride_h = int(round(identity.shape[1] / residual.shape[1]))
                stride_w = int(round(identity.shape[2] / residual.shape[2]))
                identity = self.conv(identity, residual.shape[-1],
                                     kernel_size=(1, 1),
                                     strides=(stride_h, stride_w),
                                     padding="VALID")
            identity = self.batch_normalization(identity, train)
        else:
            assert not in_hwcn, "hwcn identity requires the NIN branch"
        return identity + residual  # native dtype promotion (bf16 path)

    # --------------------------------------------------------- fused ----
    def conv_bn(self, x, filters, train: bool = True, **conv_params):
        """(basic_backbone.py:127-138)"""
        return self.batch_normalization(
            self.conv(x, filters, **conv_params), train)

    # ------------------------------------------- winograd fused chain --
    def fused_ok(self, x, filters, train: bool) -> bool:
        """Can a conv_bn->relu link run on the fused Winograd path?
        ``x`` in NHWC."""
        return bool(train) and self._use_winograd(
            x, filters, (3, 3), (1, 1), "SAME", 1)

    def chain_ok(self, shape_hwcn, filters, train: bool) -> bool:
        """Can a residual block at this [H,W,C,N] shape run on the fused
        Winograd chain?"""
        h, w, c, n = shape_hwcn
        return bool(train) and self._use_winograd(
            (n, h, w, c), filters, (3, 3), (1, 1), "SAME", 1)

    def fused_conv_stats(self, x, filters, prologue=None, ident=None):
        """Winograd conv on the [H,W,C,N] view returning
        (y_raw, [a,] (sum, sumsq)); with ``prologue=(inv, shift)`` the
        previous BN apply+relu is fused into the input read; with
        ``ident`` too, the previous residual boundary is fused and its
        activation ``a`` returned (see WinogradConv3x3)."""
        return WinogradConv3x3(
            features=filters,
            kernel_init=nn.initializers.he_normal(),
            dtype=self.dtype,
            param_dtype=self.param_dtype,
        )(x, prologue=prologue, ident=ident)

    def bn_scalars(self, count, stats, train: bool):
        """BatchNorm in stats mode: consumes epilogue-accumulated
        (sum, sumsq) of the conv output and returns (inv, shift); the
        module is the SAME FusedBatchNorm_k (params/averages) the classic
        path would create.  ``count`` = reduced element count per
        channel (H*W*N on the [H,W,C,N] view)."""
        assert train, "fused path is train-only"
        s, q = stats
        return FusedBatchNorm(
            use_running_average=False,
            momentum=BN_MOMENTUM,
            epsilon=BN_EPSILON,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
        )(stats=(s, q, float(count)))

    def hwcn_count(self, y_shape):
        return float(np.prod([y_shape[0], y_shape[1], y_shape[3]]))

    def bn_apply(self, x, inv, shift, channel_axis: int = -1):
        """The classic BN apply arithmetic (compute-dtype mul+add), for
        materializing an activation at a fused-chain boundary."""
        bshape = [1] * x.ndim
        bshape[channel_axis % x.ndim] = x.shape[channel_axis]
        return x.astype(self.dtype) \
            * inv.reshape(bshape).astype(self.dtype) \
            + shift.reshape(bshape).astype(self.dtype)

    # ------------------------------------------------ fused stem -------
    def stem_fused_ok(self, x, train: bool, filters: int = 64) -> bool:
        """Gate for the fused stem (conv -> BN+maxpool+relu superkernel,
        ops/stem_pool.py): TPU-like backend, bf16, and the post-conv
        shape supported by the kernel.  ``auto`` engages it for TRAIN
        only: in inference the classic path wins — XLA fuses the eval
        BN-apply+relu into single passes and its reduce_window forward
        is cheap, so the code-free eval kernel measured BEHIND xla at
        both bench batches (4197 vs 4382 img/s at b64, 5824 vs 5947 at
        b128, experiments/ab_infer_stem.py).  Explicit
        ``stem_backend="fused"`` engages the (correct, tested,
        mesh-partitioned) eval kernel anyway."""
        from ..ops.stem_pool import supported
        if self.stem_backend == "xla":
            return False
        # ``filters`` must match the stem_conv_bn_pool_relu call this
        # gate guards (the gate checks the POST-conv shape the kernel
        # will see); keep them in lockstep.
        h, w = x.shape[1], x.shape[2]
        shape = (h // 2, w // 2, filters, x.shape[0])
        if self.stem_backend == "fused":
            return supported(shape)
        return (train and jax.default_backend() != "cpu"
                and jnp.dtype(self.dtype) == jnp.bfloat16
                and x.shape[0] >= 32 and supported(shape))

    def stem_conv_bn_pool_relu(self, x, filters, train: bool):
        """The reference stem chain (conv_bn -> max_pool -> relu,
        resnet18.py:53-58) as: XLA conv emitting the [H,W,C,N] view +
        jnp statistics + the fused BN-apply+pool+relu Pallas kernel.
        Inference uses the running-average BN scalars and the code-free
        kernel.  Returns the pooled feature in HWCN view."""
        from ..ops.stem_pool import bn_pool_relu, bn_pool_relu_eval
        y = HwcnConv(features=filters, kernel_size=(3, 3), strides=(2, 2),
                     out_hwcn=True, dtype=self.dtype,
                     param_dtype=self.param_dtype)(x)  # [H,W,C,N]
        if not train:
            inv, shift = FusedBatchNorm(
                use_running_average=True, momentum=BN_MOMENTUM,
                epsilon=BN_EPSILON, dtype=self.dtype,
                param_dtype=self.param_dtype,
                features=filters)(stats="running")
            return bn_pool_relu_eval(y, inv, shift)
        y32 = y.astype(jnp.float32)
        s = jnp.sum(y32, axis=(0, 1, 3))
        q = jnp.sum(jnp.square(y32), axis=(0, 1, 3))
        count = float(np.prod([y.shape[0], y.shape[1], y.shape[3]]))
        inv, shift = FusedBatchNorm(
            use_running_average=False, momentum=BN_MOMENTUM,
            epsilon=BN_EPSILON, dtype=self.dtype,
            param_dtype=self.param_dtype)(stats=(s, q, count))
        return bn_pool_relu(y, inv, shift)

    def stem_pooled_nhwc(self, x, filters, train: bool):
        """The reference stem chain (conv_bn -> max_pool -> relu) with
        the fused Pallas superkernel when eligible, returned in NHWC
        for backbones whose blocks are NHWC-native (mixnet-18,
        resnext-18 — same stem as resnet-18, mixnet18.py:66-69 /
        resnext.py:83-86).  The kernel's [H,W,C,N] output pays one
        transpose here; the flagship instead threads the view into its
        first residual module (resnet18.py)."""
        if self.stem_fused_ok(x, train, filters=filters):
            y = self.stem_conv_bn_pool_relu(x, filters, train)
            return jnp.transpose(y, (3, 0, 1, 2))
        net = self.conv_bn(x, filters, train=train, strides=(2, 2))
        net = self.max_pool(net)
        return self.activation(net)

    def stem_pool_only_ok(self, x, train: bool, filters: int = 64) -> bool:
        """Gate for the POOL-ONLY fused stem (resnet-18-v2: conv with no
        BN/act before the pool, reference backbone/resnet18_v2.py:61-62,
        so the BN+relu superkernel does not apply — ops/stem_pool.py
        max_pool_s2 carries -inf padding semantics instead).  Same
        engagement envelope as :meth:`stem_fused_ok`."""
        from ..ops.stem_pool import supported
        if self.stem_backend == "xla":
            return False
        h, w = x.shape[1], x.shape[2]
        shape = (h // 2, w // 2, filters, x.shape[0])
        if self.stem_backend == "fused":
            return supported(shape)
        return (train and jax.default_backend() != "cpu"
                and jnp.dtype(self.dtype) == jnp.bfloat16
                and x.shape[0] >= 32 and supported(shape))

    def stem_conv_pool(self, x, filters, train: bool):
        """The v2 stem chain (conv -> max_pool, resnet18_v2.py:61-62) as:
        XLA conv emitting the [H,W,C,N] view + the pool-only Pallas
        kernel.  Returns the pooled feature in the HWCN view."""
        from ..ops.stem_pool import max_pool_s2, max_pool_s2_eval
        y = HwcnConv(features=filters, kernel_size=(3, 3), strides=(2, 2),
                     out_hwcn=True, dtype=self.dtype,
                     param_dtype=self.param_dtype)(x)
        if train:
            return max_pool_s2(y)
        return max_pool_s2_eval(y)

    def conv_bn_relu(self, x, filters, train: bool = True):
        """conv_bn -> relu (NHWC), on the fused Winograd path when
        eligible (conv with stats epilogue + one materializing apply
        pass, via the [H,W,C,N] kernel view), otherwise the classic
        composition."""
        if self.fused_ok(x, filters, train):
            xt = jnp.transpose(x.astype(self.dtype), (1, 2, 3, 0))
            y, st = self.fused_conv_stats(xt, filters)
            inv, shift = self.bn_scalars(self.hwcn_count(y.shape),
                                         st, train)
            a = self.activation(self.bn_apply(y, inv, shift,
                                              channel_axis=2))
            return jnp.transpose(a, (3, 0, 1, 2))
        return self.activation(self.conv_bn(x, filters, train=train))

    def depthwise_conv_bn(self, x, train: bool = True, **conv_params):
        """(basic_backbone.py:140-150)"""
        return self.batch_normalization(
            self.depthwise_conv(x, **conv_params), train)

    def bn_activation(self, x, train: bool = True, activation: str = "relu"):
        """(basic_backbone.py:152-163)"""
        return self.activation(
            self.batch_normalization(x, train), activation)

    @staticmethod
    def max_pool(x, window=(3, 3), strides=(2, 2)):
        return nn.max_pool(x, window_shape=tuple(window),
                           strides=tuple(strides), padding="SAME")


def upsample2x_nearest(x):
    """2x nearest-neighbour upsample, NHWC (reference uses
    keras UpSampling2D(interpolation='nearest'), yolov3_detector.py:115)."""
    return jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)


def l2_regularization(params) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Explicit L2 weight-decay terms, replacing Keras ``model.losses``.

    Returns ``(kernel_reg, gamma_reg)`` where
      * kernel_reg = 5e-4 * sum(w^2) over every conv kernel EXCEPT the three
        head output convs (which the reference creates without a regularizer,
        yolov3_detector.py:98-100);
      * gamma_reg = 1e-5 * sum(gamma^2) over every BN scale
        (basic_backbone.py:75-77).

    Keras ``l2(l)`` is ``l * sum(square(w))`` — no 1/2 factor.
    """
    kernel_sq = []
    gamma_sq = []
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    for path, leaf in flat:
        keys = [getattr(p, "key", str(p)) for p in path]
        name = "/".join(str(k) for k in keys)
        if keys and keys[-1] == "kernel" and HEAD_OUT_MARKER not in name:
            kernel_sq.append(jnp.sum(jnp.square(leaf.astype(jnp.float32))))
        elif keys and keys[-1] == "scale":
            gamma_sq.append(jnp.sum(jnp.square(leaf.astype(jnp.float32))))
    zero = jnp.zeros((), jnp.float32)
    kernel_reg = L2_CONV_DECAY * (sum(kernel_sq) if kernel_sq else zero)
    gamma_reg = BN_L2_GAMMA_DECAY * (sum(gamma_sq) if gamma_sq else zero)
    return kernel_reg, gamma_reg
