"""Post-training int8 quantization for the inference path.

The reference is fp32-only (no quantization anywhere); this is a
TPU-native serving feature layered on the same checkpoints.  The design
is standard symmetric PTQ: per-output-channel weight scales, one
calibrated per-tensor activation scale per conv (abs-max over a
calibration set), int8 x int8 -> int32 convolution on device, dequant
folded into the consumer's elementwise chain by XLA.

Measured basis (experiments/probe_int8_conv.py + probe_int8_dot2.py on
v5e): XLA does NOT expose the 2x int8 MXU rate (int8 matmuls run 0.86x
bf16), so int8 is a BANDWIDTH lever only — it wins exactly on the
bandwidth-bound early-module conv shapes (m1 64ch@104^2: 1.30x, m2
128ch@52^2: 1.18x) and loses or breaks even on the compute-bound deep
ones (m3 256ch: 0.94x, m4 512ch: 1.06x).  :func:`quant_eligible` below
is that measurement turned into a gate: int8 engages only where it won.

Numerics: activations quantize symmetrically to [-127, 127] in fp32
arithmetic (all eligible conv inputs in the ResNet/ResNeXt/MixNet
families are post-relu and use only the upper half; MobileNet-v2's
linear-bottleneck outputs are signed).  Accuracy is gated end-to-end:
the real-sample mAP with quant="int8" must stay within +/-0.5 of the
bf16 number (BASELINE.md's parity band, applied to quantization).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

# Per-shape eligibility, from the measured speedup table
# (experiments/probe_int8_conv.py): int8 wins only on bandwidth-bound
# shapes — both channel counts <= 128 AND spatial area >= 52^2.  Only
# the measured configuration (3x3, stride 1, ungrouped, no bias) is
# gated in; everything else stays bf16.
QUANT_MAX_CHANNELS = 128
QUANT_MIN_PIXELS = 52 * 52


def quant_eligible(in_shape, filters, kernel_size=(3, 3), strides=(1, 1),
                   feature_group_count=1, use_bias=False,
                   padding="SAME") -> bool:
    """Should this conv run int8 in quantized inference?  ``in_shape``
    is the NHWC input shape."""
    _, h, w, c = in_shape
    return (tuple(kernel_size) == (3, 3)
            and tuple(strides) == (1, 1)
            and feature_group_count == 1
            and not use_bias
            and isinstance(padding, str) and padding.upper() == "SAME"
            and c <= QUANT_MAX_CHANNELS
            and filters <= QUANT_MAX_CHANNELS
            and h * w >= QUANT_MIN_PIXELS)


def quantize_weights(kernel):
    """Per-output-channel symmetric int8 weight quantization.

    kernel: [kh, kw, cin, cout] float.  Returns (wq int8, s_w f32[cout])
    with kernel ~= wq * s_w.
    """
    k32 = kernel.astype(jnp.float32)
    amax = jnp.max(jnp.abs(k32), axis=(0, 1, 2))
    s_w = jnp.maximum(amax, 1e-12) / 127.0
    wq = jnp.clip(jnp.round(k32 / s_w), -127, 127).astype(jnp.int8)
    return wq, s_w


def act_scale(amax):
    """Per-tensor activation scale from a calibrated abs-max."""
    return jnp.maximum(amax.astype(jnp.float32), 1e-12) / 127.0


def quantize_acts(x, s_x):
    """Symmetric per-tensor int8 activation quantization (fp32 math)."""
    xq = jnp.round(x.astype(jnp.float32) / s_x)
    return jnp.clip(xq, -127, 127).astype(jnp.int8)


def int8_conv(xq, wq, strides=(1, 1), padding="SAME"):
    """int8 x int8 -> int32 convolution (NHWC/HWIO)."""
    return lax.conv_general_dilated(
        xq, wq, window_strides=tuple(strides), padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32)


def quantized_conv(x, kernel, amax, strides=(1, 1), padding="SAME",
                   out_dtype=jnp.bfloat16):
    """The full PTQ conv: quantize input with the calibrated ``amax``,
    quantize weights per-channel, int8 conv, dequantize.  Matches the
    bf16 conv up to quantization error."""
    s_x = act_scale(amax)
    xq = quantize_acts(x, s_x)
    wq, s_w = quantize_weights(kernel)
    y = int8_conv(xq, wq, strides=strides, padding=padding)
    scale = (s_x * s_w).astype(jnp.float32)
    return (y.astype(jnp.float32) * scale).astype(out_dtype)
