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


def _vmem_estimate(wb, C, Co, N, gmask=False):
    """Padded-tile VMEM footprint of the RB-row-pair step structure:
    lanes pad to 128, bf16 sublanes to 16, f32 sublanes to 8; streamed
    blocks are double-buffered."""
    n = _pad(N, 128)
    cb = _pad(C, 16)
    cob = _pad(Co, 16)
    tw = wb // 2
    rows_in = 2 * 4 + 4                    # RB=4 main pairs + 2 halo pairs
    xin = 2 * rows_in * wb * cb * n * 2    # double-buffered streams
    out = 2 * (2 * 4) * wb * cob * n * 2
    oacc = 2 * tw * 2 * _pad(Co, 8) * n * 4
    halo = 2 * 2 * rows_in * cb * n * 2
    u = 2 * 16 * _pad(C, 16) * _pad(Co, 128) * 2
    cstream = out if gmask else 0          # fwd-x stream for the grad mask
    return xin + out + oacc + halo + u + cstream


def pick_wchunk(W, C, Co, N, gmask=False):
    """Largest even chunk fitting the VMEM budget (chunks need not divide
    W — ragged final chunks are masked in-kernel), or None."""
    full = _pad(W, 2)
    for wb in range(full, 5, -2):
        if _vmem_estimate(wb, C, Co, N, gmask) <= _VMEM_BUDGET:
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
    # fwd and the (C<->Co-swapped, mask-epilogue) input-grad kernel must
    # both fit VMEM
    return (pick_wchunk(w, c, co, n) is not None
            and pick_wchunk(w, co, c, n, gmask=True) is not None)


RB = 4  # output tile-rows per grid step


def _kernel(*refs, H, W, C, Co, N, WB, act, stats, gmask):
    """Grid step (w, s): computes output tile-rows s*RB .. s*RB+RB-1 of
    W-chunk w.  Input rows arrive via three aligned streams — the
    previous pair (top halo), RB main pairs, and the next pair (bottom
    halo) — so each step is self-contained: no rolling scratch, no
    dynamic indexing, and (2RB+4)/(2RB) input-read amplification.

    Modes (compile-time flags):
      act:   prologue — input is pre-activation BN-raw; apply
             relu(x*inv + shift) on load (scal rows 0/1 = inv/shift [C]).
      stats: epilogue — accumulate per-channel (sum, sum^2) of the raw
             output into out2 [2, Co, N] (BN statistics of y).
      gmask: gradient epilogue — g = out * ((c*minv + mshift) > 0);
             write g*minv; accumulate (sum g, sum g*c) into out2.
    """
    it = iter(refs)
    xt_ref, xm_ref, xb_ref = next(it), next(it), next(it)
    lt_ref, lm_ref, lb_ref = next(it), next(it), next(it)
    rt_ref, rm_ref, rb_ref = next(it), next(it), next(it)
    c_ref = next(it) if gmask else None
    u_ref = next(it)
    scal_ref = next(it) if (act or gmask) else None
    out_ref = next(it)
    out2_ref = next(it) if (stats or gmask) else None
    oacc = next(it)

    w = pl.program_id(0)
    s = pl.program_id(1)
    nw = pl.num_programs(0)
    TR = (H + 1) // 2  # output tile-rows
    TW = WB // 2

    @pl.when(jnp.logical_and(w == 0, s == 0))
    def _():
        if out2_ref is not None:
            out2_ref[...] = jnp.zeros_like(out2_ref)

    if act:
        inv_b = scal_ref[0].reshape(1, 1, C, 1).astype(jnp.bfloat16)
        shift_b = scal_ref[1].reshape(1, 1, C, 1).astype(jnp.bfloat16)

        def pre(t):  # relu(bn(x)), bf16 ops like the classic apply pass
            return jnp.maximum(t * inv_b + shift_b, jnp.bfloat16(0))
    else:
        def pre(t):
            return t

    if W % WB != 0:
        col = jax.lax.broadcasted_iota(jnp.int32, (WB, 1, 1), 0)
        colmask = ((w * WB + col) < W)[None]
    else:
        colmask = None

    def load(ref):
        t = pre(ref[...])
        return jnp.where(colmask, t, jnp.zeros_like(t)) \
            if colmask is not None else t

    xtop, xmain, xbot = load(xt_ref), load(xm_ref), load(xb_ref)
    ltop = jnp.where(w > 0, pre(lt_ref[...]), jnp.zeros_like(lt_ref))
    lmain = jnp.where(w > 0, pre(lm_ref[...]), jnp.zeros_like(lm_ref))
    lbot = jnp.where(w > 0, pre(lb_ref[...]), jnp.zeros_like(lb_ref))
    r_ok = jnp.logical_and(w < nw - 1, (w + 1) * WB < W)
    rtop = jnp.where(r_ok, pre(rt_ref[...]), jnp.zeros_like(rt_ref))
    rmain = jnp.where(r_ok, pre(rm_ref[...]), jnp.zeros_like(rm_ref))
    rbot = jnp.where(r_ok, pre(rb_ref[...]), jnp.zeros_like(rb_ref))

    def row(j):
        """Row (2*s*RB - 2 + j) of the step's 2RB+4 row space as
        ([TW, 2, C, N], left [1,C,N], right [1,C,N]); j static."""
        if j < 2:
            body, lc, rc = xtop[j], ltop[j], rtop[j]
            habs_off = j - 2
        elif j < 2 + 2 * RB:
            body, lc, rc = xmain[j - 2], lmain[j - 2], rmain[j - 2]
            habs_off = j - 2
        else:
            body, lc, rc = xbot[j - 2 - 2 * RB], lbot[j - 2 - 2 * RB], \
                rbot[j - 2 - 2 * RB]
            habs_off = j - 2
        h = 2 * s * RB + habs_off
        ok = jnp.logical_and(h >= 0, h < H)
        return (jnp.where(ok, body.reshape(TW, 2, C, N),
                          jnp.zeros((TW, 2, C, N), jnp.bfloat16)),
                jnp.where(ok, lc, jnp.zeros_like(lc)),
                jnp.where(ok, rc, jnp.zeros_like(rc)))

    if stats or gmask:
        acc0 = jnp.zeros((Co, N), jnp.float32)
        acc1 = jnp.zeros((Co, N), jnp.float32)

    for k in range(RB):
        tr_off = s * RB + k  # absolute tile-row
        # rows 2*tr-1 .. 2*tr+2 = step rows 2k+1 .. 2k+4
        rows = [row(2 * k + 1 + a) for a in range(4)]

        def tap(a, b):
            body, lc, rc = rows[a]
            if b == 0:
                return jnp.concatenate([lc, body[:-1, 1]], axis=0)
            if b == 1:
                return body[:, 0]
            if b == 2:
                return body[:, 1]
            return jnp.concatenate([body[1:, 0], rc], axis=0)

        # separable tap build: row-combos first (2-sparse BT rows), then
        # column combos — 1/3 fewer VPU adds than the naive 4-term form
        dcol = [[tap(a, b) for b in range(4)] for a in range(4)]
        rowc = {}
        for ki in range(4):
            for b in range(4):
                terms = [(BT[ki, a], dcol[a][b]) for a in range(4)
                         if BT[ki, a] != 0]
                v = terms[0][1] if terms[0][0] > 0 else -terms[0][1]
                for coef, t in terms[1:]:
                    v = v + t if coef > 0 else v - t
                rowc[(ki, b)] = v

        first = True
        for ki in range(4):
            for kj in range(4):
                terms = [(BT[kj, b], rowc[(ki, b)]) for b in range(4)
                         if BT[kj, b] != 0]
                vk = terms[0][1] if terms[0][0] > 0 else -terms[0][1]
                for coef, t in terms[1:]:
                    vk = vk + t if coef > 0 else vk - t
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
                if first:
                    z = jnp.zeros((TW, Co, N), jnp.float32)
                    oacc[0, :, 1] = z
                    oacc[1, :, 0] = z
                    oacc[1, :, 1] = z
                    first = False

        o = oacc[...].reshape(2, WB, Co, N)
        row0_ok = (2 * tr_off) < H
        row1_ok = (2 * tr_off + 1) < H

        def masked_rowsum(f):
            """Sum a [WB, Co, N] row image over columns, excluding
            phantom output columns past W on a ragged final chunk (the
            conv of the zero-padded edge is nonzero there, and in gmask
            mode c_ref's out-of-bounds block region is undefined —
            jnp.where SELECTS, so garbage/NaN never reaches the sum)
            and phantom output rows past H."""
            def one(i):
                t = f(i)
                if colmask is not None:
                    t = jnp.where(colmask[0], t, jnp.zeros_like(t))
                return jnp.sum(t, axis=0)
            s0, s1 = one(0), one(1)
            z = jnp.zeros_like(s0)
            return (jnp.where(row0_ok, s0, z)
                    + jnp.where(row1_ok, s1, z))

        if gmask:
            minv = scal_ref[0].reshape(1, 1, Co, 1)
            mshift = scal_ref[1].reshape(1, 1, Co, 1)
            cvals = c_ref[2 * k:2 * k + 2]  # fwd x rows, bf16
            if colmask is not None:
                # ragged chunk: the block region past W is undefined
                cvals = jnp.where(colmask, cvals, jnp.zeros_like(cvals))
            bn_c = (cvals * minv.astype(jnp.bfloat16)
                    + mshift.astype(jnp.bfloat16))
            # compare in f32 (exact; target VPU lacks bf16 predicates)
            g = jnp.where(bn_c.astype(jnp.float32) > 0, o, 0.0)
            cf = cvals.astype(jnp.float32)
            acc0 += masked_rowsum(lambda i: g[i])
            acc1 += masked_rowsum(lambda i: g[i] * cf[i])
            o = g * minv
        elif stats:
            acc0 += masked_rowsum(lambda i: o[i])
            acc1 += masked_rowsum(lambda i: o[i] * o[i])
        out_ref[2 * k:2 * k + 2] = o.astype(out_ref.dtype)

    if stats or gmask:
        out2_ref[0] += acc0
        out2_ref[1] += acc1


def winograd_hwcn(xt, u, scal=None, cmask=None, act=False, stats=False,
                  interpret=None):
    """Core kernel on the [H,W,C,N] view.

    Returns [H,W,Co,N] bf16, or (out, out2 [2,Co,N] f32) when a stats
    or gradient-mask epilogue is active (see _kernel modes)."""
    H, W, C, N = xt.shape
    Co = u.shape[-1]
    gmask = cmask is not None
    wb = pick_wchunk(W, C, Co, N, gmask=gmask)
    assert wb is not None, (H, W, C, Co, N)
    TR = (H + 1) // 2
    npairs = TR
    ns = -(-TR // RB)
    nw = -(-W // wb)
    grid = (nw, ns)
    if interpret is None:
        interpret = jax.default_backend() == "cpu"

    def clip_pair(p):
        return jnp.clip(p, 0, npairs - 1)

    def main_idx(wi, si):
        return (si, wi, 0, 0)  # block units of 2*RB rows

    row_specs = [
        # top halo pair (rows 2sRB-2 .. 2sRB-1)
        ((2, wb, C, N), lambda wi, si: (clip_pair(si * RB - 1), wi, 0, 0)),
        # RB main pairs
        ((2 * RB, wb, C, N), main_idx),
        # bottom halo pair (rows 2sRB+2RB .. +1)
        ((2, wb, C, N), lambda wi, si: (clip_pair(si * RB + RB), wi, 0, 0)),
    ]
    in_specs = []
    args = []
    for shape, idx in row_specs:
        in_specs.append(pl.BlockSpec(shape, idx, memory_space=pltpu.VMEM))
        args.append(xt)
    for shape, idx in row_specs:  # left halo columns
        hshape = (shape[0], 1, C, N)
        in_specs.append(pl.BlockSpec(
            hshape,
            (lambda idx: lambda wi, si: (idx(wi, si)[0],
                                         jnp.maximum(wi * wb - 1, 0),
                                         0, 0))(idx),
            memory_space=pltpu.VMEM))
        args.append(xt)
    for shape, idx in row_specs:  # right halo columns
        hshape = (shape[0], 1, C, N)
        in_specs.append(pl.BlockSpec(
            hshape,
            (lambda idx: lambda wi, si: (idx(wi, si)[0],
                                         jnp.minimum((wi + 1) * wb, W - 1),
                                         0, 0))(idx),
            memory_space=pltpu.VMEM))
        args.append(xt)
    if gmask:
        in_specs.append(pl.BlockSpec(
            (2 * RB, wb, Co, N), lambda wi, si: (si, wi, 0, 0),
            memory_space=pltpu.VMEM))
        args.append(cmask)
    in_specs.append(pl.BlockSpec((16, C, Co), lambda wi, si: (0, 0, 0),
                                 memory_space=pltpu.VMEM))
    args.append(u)
    if act or gmask:
        in_specs.append(pl.BlockSpec((2, scal.shape[1], 1),
                                     lambda wi, si: (0, 0, 0),
                                     memory_space=pltpu.VMEM))
        args.append(scal)

    out_shapes = [jax.ShapeDtypeStruct((H, W, Co, N), jnp.bfloat16)]
    out_specs = [pl.BlockSpec((2 * RB, wb, Co, N),
                              lambda wi, si: (si, wi, 0, 0),
                              memory_space=pltpu.VMEM)]
    if stats or gmask:
        out_shapes.append(jax.ShapeDtypeStruct((2, Co, N), jnp.float32))
        out_specs.append(pl.BlockSpec((2, Co, N),
                                      lambda wi, si: (0, 0, 0),
                                      memory_space=pltpu.VMEM))

    res = pl.pallas_call(
        functools.partial(_kernel, H=H, W=W, C=C, Co=Co, N=N, WB=wb,
                          act=act, stats=stats, gmask=gmask),
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs if len(out_specs) > 1 else out_specs[0],
        out_shape=(tuple(out_shapes) if len(out_shapes) > 1
                   else out_shapes[0]),
        scratch_shapes=[
            pltpu.VMEM((2, wb // 2, 2, Co, N), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(*args)
    return res


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


# --------------------------------------------------------------------- #
# Fused conv + BN ops: the payoff path.
#
# Per layer the classic schedule is  conv -> (stats) -> apply+relu pass
# -> next conv; these ops collapse it to a single kernel invocation per
# conv: the BN apply + relu of the PREVIOUS BatchNorm rides the conv's
# input read (prologue) and the NEXT BatchNorm's statistics ride the
# output write (epilogue).  The BN backward's dense correction terms
# need no hand-derivation: the statistics are explicit (sum, sumsq)
# tensors, so their cotangents flow through the (differentiable) scalar
# math in FusedBatchNorm and arrive here as ds/dq, folded into the
# upstream gradient as dy_eff = dy + ds + 2*q_ct*y.


def _rot_u(w):
    """Transformed weights of the input-grad conv: rot180, io-swap."""
    return transform_weights(
        jnp.transpose(w[::-1, ::-1], (0, 1, 3, 2))).astype(jnp.bfloat16)


def _hwcn(x):
    return jnp.transpose(x.astype(jnp.bfloat16), (1, 2, 3, 0))


def _nhwc(x):
    return jnp.transpose(x, (3, 0, 1, 2))


def _finish_stats(s2):
    """[2, Co, N] lane-partials -> (sum [Co], sumsq/dot [Co]) f32."""
    return s2[0].sum(-1), s2[1].sum(-1)


def _dy_eff(dy, y, ds, dq):
    """Fold the stats-output cotangents into the upstream gradient:
    d/dy of (y, sum(y), sum(y^2)) contracted with (dy, ds, dq)."""
    return (dy.astype(jnp.float32) + ds[None, None, None, :]
            + 2.0 * dq[None, None, None, :] * y.astype(jnp.float32)
            ).astype(jnp.bfloat16)


def _xla_wgrad(z, w, dy):
    _, wgrad = jax.vjp(
        lambda w_: jax.lax.conv_general_dilated(
            z.astype(jnp.bfloat16), w_, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.bfloat16), w.astype(jnp.bfloat16))
    dw, = wgrad(dy.astype(jnp.bfloat16))
    return dw


@jax.custom_vjp
def conv3x3_stats(x, w):
    """y = conv3x3(x, w); also returns (sum, sumsq) of y per channel —
    the BN statistics of y, computed in the conv's output epilogue."""
    u = transform_weights(w).astype(jnp.bfloat16)
    out, s2 = winograd_hwcn(_hwcn(x), u, stats=True)
    s, q = _finish_stats(s2)
    return _nhwc(out), s, q


def _conv3x3_stats_fwd(x, w):
    y, s, q = conv3x3_stats(x, w)
    return (y, s, q), (x, w, y)


def _conv3x3_stats_bwd(res, cts):
    x, w, y = res
    dy, ds, dq = cts
    dye = _dy_eff(dy, y, ds, dq)
    dx = _nhwc(winograd_hwcn(_hwcn(dye), _rot_u(w))).astype(x.dtype)
    dw = _xla_wgrad(x, w, dye).astype(w.dtype)
    return dx, dw


conv3x3_stats.defvjp(_conv3x3_stats_fwd, _conv3x3_stats_bwd)


@jax.custom_vjp
def conv3x3_bn_act_stats(x, w, inv, shift):
    """y = conv3x3(relu(x*inv + shift), w) plus (sum, sumsq) of y.

    x is the PREVIOUS conv's raw output; (inv, shift) are that layer's
    BatchNorm apply scalars — the whole apply+relu pass rides the conv's
    input read instead of a dedicated HBM round-trip."""
    u = transform_weights(w).astype(jnp.bfloat16)
    scal = jnp.stack([inv, shift]).astype(jnp.float32)[:, :, None]
    out, s2 = winograd_hwcn(_hwcn(x), u, scal=scal, act=True, stats=True)
    s, q = _finish_stats(s2)
    return _nhwc(out), s, q


def _cba_fwd(x, w, inv, shift):
    y, s, q = conv3x3_bn_act_stats(x, w, inv, shift)
    return (y, s, q), (x, w, inv, shift, y)


def _cba_bwd(res, cts):
    x, w, inv, shift, y = res
    dy, ds, dq = cts
    dye = _dy_eff(dy, y, ds, dq)
    scal = jnp.stack([inv, shift]).astype(jnp.float32)[:, :, None]
    # input-grad conv with the relu/BN mask epilogue: writes
    # g*inv (= dx) and accumulates (sum g, sum g*x) for d_shift/d_inv
    dxt, g2 = winograd_hwcn(_hwcn(dye), _rot_u(w), scal=scal,
                            cmask=_hwcn(x))
    dx = _nhwc(dxt).astype(x.dtype)
    dshift, dinv = _finish_stats(g2)
    # weight grad on the recomputed activated input (XLA wgrad)
    z = jnp.maximum(
        x.astype(jnp.bfloat16) * inv.astype(jnp.bfloat16)
        + shift.astype(jnp.bfloat16), jnp.bfloat16(0))
    dw = _xla_wgrad(z, w, dye).astype(w.dtype)
    return dx, dw, dinv.astype(inv.dtype), dshift.astype(shift.dtype)


conv3x3_bn_act_stats.defvjp(_cba_fwd, _cba_bwd)
