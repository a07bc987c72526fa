"""Pallas TPU kernel: channel-major implicit-GEMM 3x3 convolution.

Motivation (measured on v5e, see README "Benchmarks"): the backbone's early
64-channel 3x3 convs at 104x104/208x208 dominate the train step.  XLA's
NHWC conv emitter computes [positions, 9C] x [9C, C_out] with C_out on the
128-wide lane axis — at C_out = 64 the MXU is at most half full, and the
achieved rate is ~20-32% of peak.

This kernel computes the SAME convolution in channel-major (NCHW) form,

    forward : y[c_out, p]      = W[c_out, 9C] . patches[9C, p]
    dgrad   : dx[c_in, p]      = W_rot[c_in, 9C] . patches(dy)[9C, p]
    wgrad   : dW[c_out, 9C]    = dy[c_out, p] . patches[9C, p]^T

so the 128-lane axis always carries positions (p = 8 rows x 128 lanes per
tile) or 9C — never the narrow channel count.  Patches are built entirely
in VMEM from an aligned 16-row slab of the per-image input block using
static sublane (ky) and lane (kx) shifts, and never touch HBM.

Memory layout ("padded domain"):
  input : (N, C, H + 16, W + 26)  rows: [halo, data x H, zeros]
          cols: [halo, data x W, zeros]; W <= 126 so kx+128 windows fit.
  output: (N, C, H, W + 26)       rows unpadded (top halo re-added by the
          caller between chained convs), cols same padded layout with the
          pad columns exactly zero (the kernel masks them), so the array
          can be re-fed after a row-pad only.

Mosaic constraints that shaped this (each was hit in development):
  * block last-two dims must be (8k, 128k) or the full array dim;
  * dynamic sublane offsets must be provably 8-aligned -> aligned slab
    reads + static value-level shifts instead of per-row ref reads;
  * reshapes cannot merge an unaligned minor dim -> windows are sliced to
    exactly 128 lanes before the (8,128)->(1024,) merge.

Cross-references: reference conv semantics backbone/basic_backbone.py:20-43.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

RT = 8  # output rows per program
SLAB = 16  # aligned input rows read per program
LANES = 128


def _wp(w: int) -> int:
    """Padded width: 1 (left halo) + w + right zeros so that col windows
    [kx, kx+128) fit for kx in {0,1,2}: wp >= 130; round to 8 for tidiness."""
    assert w <= LANES - 2, f"width {w} > {LANES - 2} unsupported (v1)"
    return LANES + 8


# --------------------------------------------------------------------- #
# forward / dgrad kernel
# --------------------------------------------------------------------- #
def _conv_fwd_kernel(x_ref, w_ref, out_ref, patches, *, cin, cout, w, wp):
    t = pl.program_id(1)
    row0 = pl.multiple_of(t * RT, RT)
    slab = x_ref[0, :, pl.ds(row0, SLAB), :]  # (cin, 16, wp)
    for ky in range(3):
        sub = slab[:, ky:ky + RT, :]  # static sublane shift
        for kx in range(3):
            win = sub[:, :, kx:kx + LANES]  # static lane shift
            patches[pl.ds((ky * 3 + kx) * cin, cin), :] = win.reshape(
                cin, RT * LANES)
    acc = jnp.dot(w_ref[:], patches[:],
                  preferred_element_type=jnp.float32)  # (cout, 8*128)
    acc = acc.reshape(cout, RT, LANES)
    col = jax.lax.broadcasted_iota(jnp.int32, (cout, RT, LANES), 2)
    acc = jnp.where(col < w, acc, 0.0)  # lane j = data col j+1
    out = jnp.concatenate(
        [jnp.zeros((cout, RT, 1), acc.dtype), acc,
         jnp.zeros((cout, RT, wp - LANES - 1), acc.dtype)], axis=2)
    out_ref[0, :, :, :] = out.astype(out_ref.dtype)


def _conv_cmajor_raw(x_padded, w_packed, cin, cout, h, w, wp):
    n = x_padded.shape[0]
    kernel = functools.partial(_conv_fwd_kernel, cin=cin, cout=cout,
                               w=w, wp=wp)
    return pl.pallas_call(
        kernel,
        grid=(n, h // RT),
        in_specs=[
            pl.BlockSpec((1, cin, h + SLAB, wp), lambda i, t: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cout, 9 * cin), lambda i, t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, cout, RT, wp), lambda i, t: (i, 0, t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, cout, h, wp), x_padded.dtype),
        scratch_shapes=[pltpu.VMEM((9 * cin, RT * LANES), x_padded.dtype)],
    )(x_padded, w_packed)


# --------------------------------------------------------------------- #
# wgrad kernel
# --------------------------------------------------------------------- #
def _wgrad_kernel(x_ref, dy_ref, out_ref, patches, acc, *, cin, cout, w, wp):
    """dW[c_out, 9C] accumulated over every (image, row-tile) program.
    dy is in output layout (rows unpadded, cols padded: data at 1..w)."""
    i = pl.program_id(0)
    t = pl.program_id(1)
    row0 = pl.multiple_of(t * RT, RT)
    slab = x_ref[0, :, pl.ds(row0, SLAB), :]
    for ky in range(3):
        sub = slab[:, ky:ky + RT, :]
        for kx in range(3):
            win = sub[:, :, kx:kx + LANES]
            patches[pl.ds((ky * 3 + kx) * cin, cin), :] = win.reshape(
                cin, RT * LANES)
    dy = dy_ref[0, :, :, 1:1 + LANES]  # lanes j = data col j+1; pads are 0
    dy_flat = dy.reshape(cout, RT * LANES)
    part = jax.lax.dot_general(
        dy_flat, patches[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)  # (cout, 9*cin)

    @pl.when(jnp.logical_and(i == 0, t == 0))
    def _():
        acc[:] = jnp.zeros_like(acc)

    acc[:] = acc[:] + part

    @pl.when(jnp.logical_and(i == pl.num_programs(0) - 1,
                             t == pl.num_programs(1) - 1))
    def _():
        out_ref[:] = acc[:]


def _wgrad_cmajor_raw(x_padded, dy, cin, cout, h, w, wp):
    n = x_padded.shape[0]
    kernel = functools.partial(_wgrad_kernel, cin=cin, cout=cout, w=w, wp=wp)
    return pl.pallas_call(
        kernel,
        grid=(n, h // RT),
        in_specs=[
            pl.BlockSpec((1, cin, h + SLAB, wp), lambda i, t: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cout, RT, wp), lambda i, t: (i, 0, t, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((cout, 9 * cin), lambda i, t: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((cout, 9 * cin), jnp.float32),
        scratch_shapes=[pltpu.VMEM((9 * cin, RT * LANES), x_padded.dtype),
                        pltpu.VMEM((cout, 9 * cin), jnp.float32)],
    )(x_padded, dy)


# --------------------------------------------------------------------- #
# padded-domain helpers
# --------------------------------------------------------------------- #
def pad_input(x_nchw):
    """(N, C, H, W) -> padded domain (N, C, H+16, wp)."""
    n, c, h, w = x_nchw.shape
    wp = _wp(w)
    return jnp.pad(x_nchw, ((0, 0), (0, 0), (1, SLAB - 1),
                            (1, wp - w - 1)))


def repad_rows(y_padded_cols):
    """Conv output (rows unpadded, cols padded) -> next conv's input."""
    return jnp.pad(y_padded_cols, ((0, 0), (0, 0), (1, SLAB - 1), (0, 0)))


def unpad_output(y, w):
    """(N, C, H, wp) -> (N, C, H, W)."""
    return y[:, :, :, 1:1 + w]


# --------------------------------------------------------------------- #
# public op with custom VJP
# --------------------------------------------------------------------- #
def _pack_weights(w_oihw):
    """(C_out, C_in, 3, 3) -> (C_out, 9*C_in), k-order (ky, kx, c_in)."""
    cout, cin = w_oihw.shape[0], w_oihw.shape[1]
    return jnp.transpose(w_oihw, (0, 2, 3, 1)).reshape(cout, 9 * cin)


def _rot_weights(w_oihw):
    """Weights for the data gradient: 180-degree spatial flip + in/out
    channel transpose."""
    return jnp.transpose(w_oihw[:, :, ::-1, ::-1], (1, 0, 2, 3))


@jax.custom_vjp
def conv3x3_cmajor(x, w_oihw):
    """3x3 stride-1 SAME conv, channel-major.

    x: (N, C_in, H, W) bf16/f32, H % 8 == 0, W <= 126;
    w_oihw: (C_out, C_in, 3, 3).  Returns (N, C_out, H, W) in x.dtype.
    """
    return _conv_fwd_impl(x, w_oihw)


def _conv_fwd_impl(x, w_oihw):
    n, cin, h, w = x.shape
    cout = w_oihw.shape[0]
    wp = _wp(w)
    xp = pad_input(x)
    wpk = _pack_weights(w_oihw).astype(x.dtype)
    y = _conv_cmajor_raw(xp, wpk, cin, cout, h, w, wp)
    return unpad_output(y, w)


def _conv_fwd_rule(x, w_oihw):
    return _conv_fwd_impl(x, w_oihw), (x, w_oihw)


def _conv_bwd_rule(res, dy):
    x, w_oihw = res
    n, cin, h, w = x.shape
    cout = w_oihw.shape[0]
    wp = _wp(w)
    dx = _conv_fwd_impl(dy, _rot_weights(w_oihw).astype(dy.dtype))
    xp = pad_input(x)
    dyp = jnp.pad(dy, ((0, 0), (0, 0), (0, 0), (1, wp - w - 1)))
    dw_packed = _wgrad_cmajor_raw(xp, dyp, cin, cout, h, w, wp)
    dw = jnp.transpose(
        dw_packed.reshape(cout, 3, 3, cin), (0, 3, 1, 2)).astype(
            w_oihw.dtype)
    return dx, dw


conv3x3_cmajor.defvjp(_conv_fwd_rule, _conv_bwd_rule)


def conv3x3_nhwc_via_cmajor(x_nhwc, w_hwio):
    """Drop-in NHWC wrapper: transpose in, run channel-major, transpose out.
    w_hwio: (3, 3, C_in, C_out) (flax layout)."""
    x = jnp.transpose(x_nhwc, (0, 3, 1, 2))
    w = jnp.transpose(w_hwio, (3, 2, 0, 1))
    y = conv3x3_cmajor(x, w)
    return jnp.transpose(y, (0, 2, 3, 1))
