"""Fused Winograd F(2x2, 3x3) convolution — Pallas TPU kernel.

The train step's compute-bound 3x3/s1/SAME convolutions run at ~95% of
the v5e MXU bf16 peak under XLA (r2 trace), so the only way to go faster
is algorithmic: F(2,3) computes the same convolution with 16/36 = 0.44x
the MACs.  The kernel keeps the 4x-expanded Winograd tile tensors
entirely in VMEM (an XLA-level Winograd would quadruple HBM traffic).

Reference behavior: this is a numerical drop-in for the reference's 3x3
Keras Conv2D layers (reference: backbone/basic_backbone.py:20-43); the
Winograd algorithm is bit-different from direct convolution at the bf16
level (~0.5% relative), the same situation as cuDNN's autotuned Winograd
on the reference's own GPU path.  ``conv_backend="xla"`` (the default on
CPU and under the parity suite) restores direct convolution.

Kernel layout: operates on the [H, W, C, N] transpose-view of NHWC so
the minor dims (C, N) form full (sublane, lane) vector tiles; spatial
addressing (tile taps, inverse-transform placement) is then free
indexing along untiled dims.  W is viewed as (T, 2) to express stride-2
column taps as static indexing (Mosaic lowers no strided gathers).
Grid = (W-chunks, row-pairs + 1), one input row-pair streamed per step
into a shift-register VMEM store; 1-column halo specs provide the
cross-chunk taps.

Backward: dx is itself a 3x3/s1 convolution of dy with the
spatially-rotated, io-transposed kernel — the same Pallas kernel; dw
falls back to XLA's weight-grad convolution (its wgrad shapes are
MXU-efficient already).
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# 1D transform matrices for F(2,3)
BT = np.array([[1, 0, -1, 0],
               [0, 1, 1, 0],
               [0, -1, 1, 0],
               [0, 1, 0, -1]], np.float32)
G = np.array([[1, 0, 0],
              [0.5, 0.5, 0.5],
              [0.5, -0.5, 0.5],
              [0, 0, 1]], np.float32)
AT = np.array([[1, 1, 1, 0],
               [0, 1, -1, -1]], np.float32)

# VMEM budget for eligibility (v5e scoped-vmem headroom; shapes whose
# padded-tile estimate exceeds this fall back to XLA).  Mosaic's real
# stack allocation runs ~1.5x the block-level estimate (observed), so
# the budget leaves that headroom against the 100M compile limit.
_VMEM_BUDGET = 45e6
_VMEM_LIMIT = 100 * 1024 * 1024


def _pad(v, m):
    return -(-v // m) * m


def transform_weights(w):
    """w: [3,3,C,Co] -> U [16,C,Co] = G @ g @ G^T applied per (C,Co)."""
    w = w.astype(jnp.float32)
    u = jnp.einsum("ia,abcd->ibcd", jnp.asarray(G), w)
    u = jnp.einsum("ibcd,jb->ijcd", u, jnp.asarray(G))
    return u.reshape(16, *w.shape[2:])


def _vmem_estimate(wb, C, Co, N):
    """Padded-tile VMEM footprint: lanes pad to 128, bf16 sublanes to 16,
    f32 sublanes to 8; streamed blocks are double-buffered."""
    n = _pad(N, 128)
    cb = _pad(C, 16)
    cob = _pad(Co, 16)
    tw = wb // 2
    xs = 2 * 2 * tw * 2 * cb * n * 2
    oacc = 2 * tw * 2 * _pad(Co, 8) * n * 4
    xin = 2 * 2 * wb * cb * n * 2          # double-buffered stream
    out = 2 * 2 * wb * cob * n * 2
    halo = 4 * 2 * 2 * cb * n * 2
    u = 2 * 16 * _pad(C, 16) * _pad(Co, 128) * 2
    return xs + oacc + xin + out + halo + u


def pick_wchunk(W, C, Co, N):
    """Largest even chunk fitting the VMEM budget (chunks need not divide
    W — ragged final chunks are masked in-kernel), or None."""
    full = _pad(W, 2)
    for wb in range(full, 5, -2):
        if _vmem_estimate(wb, C, Co, N) <= _VMEM_BUDGET:
            return wb
    return None


def eligible(shape_nhwc, co, kernel_size, strides, padding,
             feature_group_count):
    """Static check: can this conv run on the Winograd kernel?"""
    if tuple(kernel_size) != (3, 3) or tuple(strides) != (1, 1):
        return False
    if isinstance(padding, str):
        if padding.upper() != "SAME":
            return False
    else:
        return False
    if feature_group_count != 1:
        return False
    n, h, w, c = shape_nhwc
    if h < 2 or w < 2 or c % 8 != 0 or co % 8 != 0:
        return False
    if n < 32 and jax.default_backend() != "cpu":
        # init/predict mini-batches: lanes pad to 128 anyway; direct conv
        # avoids compiling extra kernel variants for tiny-N shapes
        return False
    return pick_wchunk(w, c, co, n) is not None


def _kernel(x_ref, lh_ref, rh_ref, u_ref, out_ref, xs, lhs, rhs, oacc,
            *, H, W, C, Co, N, WB):
    """Grid step (w, r): row-pair r of W-chunk w arrives; emits output
    tile-row r-1 (rows 2(r-1), 2(r-1)+1)."""
    w = pl.program_id(0)
    r = pl.program_id(1)
    nw = pl.num_programs(0)
    npairs = (H + 1) // 2
    TW = WB // 2

    lcol = jnp.where(w > 0, lh_ref[...], jnp.zeros_like(lh_ref))
    rcol = jnp.where(
        jnp.logical_and(w < nw - 1, (w + 1) * WB < W),
        rh_ref[...], jnp.zeros_like(rh_ref))
    xin = x_ref[...]
    if W % WB != 0:  # padded final chunk: zero the out-of-range columns
        col = jax.lax.broadcasted_iota(jnp.int32, (WB, 1, 1), 0)
        mask = (w * WB + col) < W
        xin = jnp.where(mask[None], xin, jnp.zeros_like(xin))

    @pl.when(r >= 1)
    def _():
        tr = r - 1
        # rows 2tr-1..2tr+2 live at xs[0]=pair tr-1, xs[1]=pair tr,
        # x_ref=pair tr+1 (static indices via the shift-register below)
        srcs = [(1, 0, 1), (1, 1, 0), (1, 1, 1), (0, None, 0)]

        def in_rows(a):
            h = 2 * tr - 1 + a
            from_store, slot, off = srcs[a]
            if from_store:
                body, lc, rc = xs[slot, off], lhs[slot, off], rhs[slot, off]
            else:
                body = xin[off].reshape(TW, 2, C, N)
                lc, rc = lcol[off], rcol[off]
            ok = jnp.logical_and(h >= 0, h < H)
            return (jnp.where(ok, body, jnp.zeros_like(body)),
                    jnp.where(ok, lc, jnp.zeros_like(lc)),
                    jnp.where(ok, rc, jnp.zeros_like(rc)))

        rows = [in_rows(a) for a in range(4)]

        def tap(a, b):
            """[TW, C, N]: column (2t - 1 + b) of every tile t, row a."""
            body, lc, rc = rows[a]
            if b == 0:
                return jnp.concatenate([lc, body[:-1, 1]], axis=0)
            if b == 1:
                return body[:, 0]
            if b == 2:
                return body[:, 1]
            return jnp.concatenate([body[1:, 0], rc], axis=0)

        d = [[tap(a, b) for b in range(4)] for a in range(4)]

        first = True
        for ki in range(4):
            for kj in range(4):
                vk = None
                for a in range(4):
                    ca = BT[ki, a]
                    if ca == 0:
                        continue
                    for b in range(4):
                        cb = BT[kj, b]
                        if cb == 0:
                            continue
                        term = d[a][b] if ca * cb > 0 else -d[a][b]
                        vk = term if vk is None else vk + term
                uk = u_ref[ki * 4 + kj]  # [C, Co]
                ukb = jnp.broadcast_to(uk, (TW, C, Co))
                mk = jax.lax.dot_general(
                    ukb, vk,
                    dimension_numbers=(((1,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32)  # [TW, Co, N]
                for oi in range(2):
                    ci = AT[oi, ki]
                    if ci == 0:
                        continue
                    for oj in range(2):
                        cj = AT[oj, kj]
                        if cj == 0:
                            continue
                        upd = mk if ci * cj > 0 else -mk
                        if first:
                            oacc[oi, :, oj] = upd
                        else:
                            oacc[oi, :, oj] += upd
                if first:  # slots tap (0,0) does not touch
                    z = jnp.zeros((TW, Co, N), jnp.float32)
                    oacc[0, :, 1] = z
                    oacc[1, :, 0] = z
                    oacc[1, :, 1] = z
                    first = False
        out_ref[...] = oacc[...].astype(out_ref.dtype).reshape(
            2, WB, Co, N)

    # shift register: xs[0] <- xs[1] <- incoming pair
    @pl.when(r < npairs)
    def _():
        xs[0] = xs[1]
        xs[1] = xin.reshape(2, TW, 2, C, N)
        lhs[0] = lhs[1]
        lhs[1] = lcol
        rhs[0] = rhs[1]
        rhs[1] = rcol


def winograd_hwcn(xt, u, interpret=None):
    """Core kernel on the [H,W,C,N] view; returns [H,W,Co,N] bf16."""
    H, W, C, N = xt.shape
    Co = u.shape[-1]
    wb = pick_wchunk(W, C, Co, N)
    assert wb is not None, (H, W, C, Co, N)
    npairs = (H + 1) // 2
    nw = -(-W // wb)
    grid = (nw, npairs + 1)
    if interpret is None:
        interpret = jax.default_backend() == "cpu"

    out = pl.pallas_call(
        functools.partial(_kernel, H=H, W=W, C=C, Co=Co, N=N, WB=wb),
        grid=grid,
        in_specs=[
            pl.BlockSpec((2, wb, C, N),
                         lambda wi, r: (jnp.minimum(r, npairs - 1), wi,
                                        0, 0),
                         memory_space=pltpu.VMEM),
            # halo columns (left: last col of prev chunk; right: first of
            # next), clipped at edges and masked in-kernel
            pl.BlockSpec((2, 1, C, N),
                         lambda wi, r: (jnp.minimum(r, npairs - 1),
                                        jnp.maximum(wi * wb - 1, 0), 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, 1, C, N),
                         lambda wi, r: (jnp.minimum(r, npairs - 1),
                                        jnp.minimum((wi + 1) * wb, W - 1),
                                        0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((16, C, Co), lambda wi, r: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (2, wb, Co, N),
            lambda wi, r: (jnp.maximum(r - 1, 0), wi, 0, 0),
            memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((H, W, Co, N), jnp.bfloat16),
        scratch_shapes=[
            pltpu.VMEM((2, 2, wb // 2, 2, C, N), jnp.bfloat16),
            pltpu.VMEM((2, 2, 1, C, N), jnp.bfloat16),
            pltpu.VMEM((2, 2, 1, C, N), jnp.bfloat16),
            pltpu.VMEM((2, wb // 2, 2, Co, N), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(xt, xt, xt, u)
    return out


def _win_nhwc(x, w):
    """[N,H,W,C] bf16 x [3,3,C,Co] -> [N,H,W,Co] bf16 via the kernel."""
    u = transform_weights(w).astype(jnp.bfloat16)
    xt = jnp.transpose(x.astype(jnp.bfloat16), (1, 2, 3, 0))
    out = winograd_hwcn(xt, u)
    return jnp.transpose(out, (3, 0, 1, 2))


@jax.custom_vjp
def conv3x3(x, w):
    """3x3/s1/SAME convolution, NHWC/HWIO, bf16 in/out.

    Forward and input-gradient run on the fused Winograd kernel; the
    weight gradient uses XLA's native wgrad convolution."""
    return _win_nhwc(x, w)


def _conv3x3_fwd(x, w):
    return _win_nhwc(x, w), (x, w)


def _conv3x3_bwd(res, dy):
    x, w = res
    # dx = conv(dy, rot180(w) io-transposed) — also 3x3/s1/SAME
    wr = jnp.transpose(w[::-1, ::-1], (0, 1, 3, 2))  # [3,3,Co,C]
    dx = _win_nhwc(dy, wr).astype(x.dtype)
    # dw via XLA's own conv weight-grad (its wgrad shapes are already
    # MXU-efficient; only fwd/igrad benefit from Winograd)
    _, wgrad = jax.vjp(
        lambda w_: jax.lax.conv_general_dilated(
            x.astype(jnp.bfloat16), w_, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.bfloat16), w.astype(jnp.bfloat16))
    dw, = wgrad(dy.astype(jnp.bfloat16))
    return dx, dw.astype(w.dtype)


conv3x3.defvjp(_conv3x3_fwd, _conv3x3_bwd)
