"""Fused Winograd F(2x2, 3x3) convolution — Pallas TPU kernel (v4).

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

v4 design (round 3): ONE kernel serves forward and input-gradient convs
with composable prologue/epilogue modes, so a whole residual module runs
as a chain of custom calls with NO XLA elementwise pass in between
(the r2 measurement showed the fused path lost end-to-end exactly
because every custom-call boundary re-materialized elementwise work):

  prologue (applied on the input read, in VMEM):
    PRO_BN_ACT   z = relu(x*inv + shift)            (fwd: prev BN+relu)
    PRO_BN_ADD   z = relu(id + x*inv + shift)       (fwd: residual
                 boundary — the add+relu of the PREVIOUS block rides
                 this conv's read; z is also this block's identity)
    PRO_DYEFF    dye = dy + ds + 2*dq*y             (bwd: the BN-stats
                 cotangent correction rides the gradient conv's read)
  aux output: the prologue result for the main rows is optionally
    WRITTEN (z for the XLA weight-grad / the next boundary's identity;
    dye for the XLA weight-grad) — one write replaces a separate
    read+read+write XLA pass.
  epilogue (applied on the output write):
    EPI_STATS    accumulate per-channel (sum, sumsq) of the raw output
                 (the NEXT BatchNorm's statistics)
    EPI_BN_ACT   bwd of PRO_BN_ACT: g = o * (bn(c) > 0); write g*inv;
                 accumulate (sum g, sum g*c) -> (dshift, dinv)
    EPI_BN_ADD   bwd of PRO_BN_ADD: g = (o + da_ext) * (a > 0); write
                 g*inv (the conv-input cotangent) AND g (the identity
                 cotangent); accumulate (sum g, sum g*c)

Kernel layout: operates on the [H, W, C, N] transpose-view of NHWC so
the minor dims (C, N) form full (sublane, lane) vector tiles; spatial
addressing (tile taps, inverse-transform placement) is then free
indexing along untiled dims.  W is viewed as (T, 2) to express stride-2
column taps as static indexing (Mosaic lowers no strided gathers).
Grid = (W-chunks, row-pair groups); each step streams its rows via
three aligned streams (top halo pair, RB main pairs, bottom halo pair)
per input tensor, plus 1-column halo specs for the cross-chunk taps.

The inverse transform is a VALUE-based two-stage reduction (BT-row
combos -> per-kj products -> AT row-stage -> AT col-stage): the r2
kernel scatter-accumulated every product into a VMEM scratch
(read-modify-write), which made the kernel VMEM-traffic-bound at ~40%
MXU utilization; the value form lets Mosaic keep partials in registers
or schedule spills as streams.

The weight gradient stays on XLA's wgrad convolution (its big-
contraction shapes run at ~86% MXU peak there; an in-kernel transform-
domain wgrad needs a lane-dim contraction that Mosaic lowers at ~1% of
peak — measured, experiments/probe_wgrad_dot.py), but reads the
kernel-materialized z / dye instead of re-materializing them.
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

RB = 4  # output tile-rows per grid step

# prologue modes
PRO_NONE, PRO_BN_ACT, PRO_BN_ADD, PRO_DYEFF = 0, 1, 2, 3
# epilogue modes
EPI_NONE, EPI_STATS, EPI_BN_ACT, EPI_BN_ADD = 0, 1, 2, 3


def _pad(v, m):
    return -(-v // m) * m


def transform_weights(w):
    """w: [3,3,C,Co] -> U [16,C,Co] = G @ g @ G^T applied per (C,Co)."""
    w = w.astype(jnp.float32)
    u = jnp.einsum("ia,abcd->ibcd", jnp.asarray(G), w)
    u = jnp.einsum("ibcd,jb->ijcd", u, jnp.asarray(G))
    return u.reshape(16, *w.shape[2:])


def _vmem_estimate(wb, C, Co, N, full_streams=1, main_streams=0, aux=0):
    """Padded-tile VMEM footprint of the RB-row-pair step structure:
    lanes pad to 128, bf16 sublanes to 16, f32 sublanes to 8; streamed
    blocks are double-buffered.

    full_streams: tensors streamed with the full 9-spec halo structure
    (input-domain, C channels); main_streams: output-domain main-row
    streams (Co channels); aux: main-row input-domain writes."""
    n = _pad(N, 128)
    cb = _pad(C, 16)
    cob = _pad(Co, 16)
    rows_in = 2 * RB + 4                   # RB main pairs + 2 halo pairs
    xin = 2 * rows_in * wb * cb * n * 2    # double-buffered streams
    halo = 2 * 2 * rows_in * cb * n * 2
    out = 2 * (2 * RB) * wb * cob * n * 2
    cmain = 2 * (2 * RB) * wb * cob * n * 2
    auxw = 2 * (2 * RB) * wb * cb * n * 2
    # live r/m values of the two-stage inverse transform (f32)
    vals = 10 * (wb // 2) * _pad(Co, 8) * n * 4
    u = 2 * 16 * cb * _pad(Co, 128) * 2
    return (full_streams * (xin + halo) + main_streams * cmain
            + aux * auxw + out + vals + u)


def pick_wchunk(W, C, Co, N, gmask=False, full_streams=None,
                main_streams=0, aux=0):
    """Largest even chunk fitting the VMEM budget (chunks need not divide
    W — ragged final chunks are masked in-kernel), or None."""
    if full_streams is None:
        full_streams = 1
        if gmask:          # legacy alias: r2 gradient-mask config
            main_streams = max(main_streams, 1)
    full = _pad(W, 2)
    for wb in range(full, 5, -2):
        if _vmem_estimate(wb, C, Co, N, full_streams, main_streams,
                          aux) <= _VMEM_BUDGET:
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
    # the worst-case fwd (2-input boundary prologue + aux write) and bwd
    # (dy + y streams, 3 main-row epilogue streams, dye write) kernels
    # must both fit VMEM
    fwd_ok = pick_wchunk(w, c, co, n, full_streams=2, aux=1) is not None
    # bwd: 3 main-row epilogue streams + the EPI_BN_ADD identity-
    # cotangent output (cmain-sized) = 4
    bwd_ok = pick_wchunk(w, co, c, n, full_streams=2, main_streams=4,
                         aux=1) is not None
    return fwd_ok and bwd_ok


def _kernel(*refs, H, W, C, Co, N, WB, pro, epi, aux):
    """Grid step (w, s): computes output tile-rows s*RB .. s*RB+RB-1 of
    W-chunk w.  Input rows arrive via three aligned streams — the
    previous pair (top halo), RB main pairs, and the next pair (bottom
    halo) — per streamed tensor, so each step is self-contained: no
    rolling scratch, no dynamic indexing, (2RB+4)/(2RB) amplification.

    refs order (inputs): x streams (9: top/main/bot bodies, then left
    halos, then right halos), [partner streams (9), pro in {BN_ADD,
    DYEFF}], [c stream (main rows), epi in {BN_ACT, BN_ADD}],
    [a + da_ext streams (main rows), epi == BN_ADD], u, [scal, pro in
    {BN_ACT, BN_ADD} or epi in {BN_ACT, BN_ADD}], [scal2, pro ==
    DYEFF].  Outputs: out, [out2 (stats/acc)], [aux write], [out3
    (identity cotangent), epi == BN_ADD].
    """
    it = iter(refs)
    x9 = [next(it) for _ in range(9)]
    p9 = [next(it) for _ in range(9)] if pro in (PRO_BN_ADD,
                                                 PRO_DYEFF) else None
    c_ref = next(it) if epi in (EPI_BN_ACT, EPI_BN_ADD) else None
    a_ref = next(it) if epi == EPI_BN_ADD else None
    d_ref = next(it) if epi == EPI_BN_ADD else None
    u_ref = next(it)
    need_scal = (pro in (PRO_BN_ACT, PRO_BN_ADD)
                 or epi in (EPI_BN_ACT, EPI_BN_ADD))
    scal_ref = next(it) if need_scal else None
    scal2_ref = next(it) if pro == PRO_DYEFF else None
    out_ref = next(it)
    out2_ref = next(it) if epi != EPI_NONE else None
    aux_ref = next(it) if aux else None
    out3_ref = next(it) if epi == EPI_BN_ADD else None

    w = pl.program_id(0)
    s = pl.program_id(1)
    nw = pl.num_programs(0)
    TW = WB // 2

    @pl.when(jnp.logical_and(w == 0, s == 0))
    def _():
        if out2_ref is not None:
            out2_ref[...] = jnp.zeros_like(out2_ref)

    # ---- prologue: elementwise transform applied on the input read ----
    if pro == PRO_BN_ACT:
        inv_b = scal_ref[0].reshape(1, 1, C, 1).astype(jnp.bfloat16)
        shift_b = scal_ref[1].reshape(1, 1, C, 1).astype(jnp.bfloat16)

        def pre(t):  # relu(bn(x)), bf16 ops like the classic apply pass
            return jnp.maximum(t * inv_b + shift_b, jnp.bfloat16(0))
    elif pro == PRO_BN_ADD:
        inv_b = scal_ref[0].reshape(1, 1, C, 1).astype(jnp.bfloat16)
        shift_b = scal_ref[1].reshape(1, 1, C, 1).astype(jnp.bfloat16)

        def pre(t, idt):  # relu(id + bn(x)): the residual boundary
            return jnp.maximum(t * inv_b + shift_b + idt, jnp.bfloat16(0))
    elif pro == PRO_DYEFF:
        ds_b = scal2_ref[0].reshape(1, 1, C, 1)
        dq_b = scal2_ref[1].reshape(1, 1, C, 1)

        def pre(t, yt):  # dy + ds + 2*dq*y, f32 math -> bf16
            return (t.astype(jnp.float32) + ds_b
                    + 2.0 * dq_b * yt.astype(jnp.float32)
                    ).astype(jnp.bfloat16)
    else:
        def pre(t):
            return t

    if W % WB != 0:
        col = jax.lax.broadcasted_iota(jnp.int32, (WB, 1, 1), 0)
        colmask = ((w * WB + col) < W)[None]
    else:
        colmask = None

    def loadi(i):
        """Masked prologue'd block i of the 9-spec structure: 0-2 bodies
        (top/main/bot), 3-5 left halos, 6-8 right halos.  Masks apply
        AFTER the prologue: the conv consumes the zero-padded PROLOGUE
        OUTPUT, and jnp.where SELECTS so undefined block regions never
        leak through."""
        args = [x9[i][...]]
        if p9 is not None:
            args.append(p9[i][...])
        t = pre(*args)
        if i < 3:
            return (jnp.where(colmask, t, jnp.zeros_like(t))
                    if colmask is not None else t)
        if i < 6:
            return jnp.where(w > 0, t, jnp.zeros_like(t))
        r_ok = jnp.logical_and(w < nw - 1, (w + 1) * WB < W)
        return jnp.where(r_ok, t, jnp.zeros_like(t))

    xtop, xmain, xbot = loadi(0), loadi(1), loadi(2)
    ltop, lmain, lbot = loadi(3), loadi(4), loadi(5)
    rtop, rmain, rbot = loadi(6), loadi(7), loadi(8)

    if aux_ref is not None:
        # the prologue result for the main rows IS the tensor the XLA
        # weight-grad (and the next residual boundary) needs: write it
        # once here instead of a dedicated XLA pass
        aux_ref[...] = xmain.astype(aux_ref.dtype)

    def row(j):
        """Row (2*s*RB - 2 + j) of the step's 2RB+4 row space as
        ([TW, 2, C, N], left [1,C,N], right [1,C,N]); j static."""
        if j < 2:
            body, lc, rc = xtop[j], ltop[j], rtop[j]
        elif j < 2 + 2 * RB:
            body, lc, rc = xmain[j - 2], lmain[j - 2], rmain[j - 2]
        else:
            body, lc, rc = xbot[j - 2 - 2 * RB], lbot[j - 2 - 2 * RB], \
                rbot[j - 2 - 2 * RB]
        h = 2 * s * RB + j - 2
        ok = jnp.logical_and(h >= 0, h < H)
        return (jnp.where(ok, body.reshape(TW, 2, C, N),
                          jnp.zeros((TW, 2, C, N), jnp.bfloat16)),
                jnp.where(ok, lc, jnp.zeros_like(lc)),
                jnp.where(ok, rc, jnp.zeros_like(rc)))

    if epi != EPI_NONE:
        acc0 = jnp.zeros((Co, N), jnp.float32)
        acc1 = jnp.zeros((Co, N), jnp.float32)
    if epi in (EPI_BN_ACT, EPI_BN_ADD):
        minv = scal_ref[0].reshape(1, 1, Co, 1)
        mshift = scal_ref[1].reshape(1, 1, Co, 1)

    def mask_cols(t):
        return (jnp.where(colmask, t, jnp.zeros_like(t))
                if colmask is not None else t)

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

        # products in kj-major order; AT row-stage folds each kj's four
        # products into two running values (value form — no scratch
        # read-modify-write; Mosaic register-allocates / streams spills)
        r0 = [None] * 4
        r1 = [None] * 4
        for kj in range(4):
            ms = []
            for ki in range(4):
                terms = [(BT[kj, b], rowc[(ki, b)]) for b in range(4)
                         if BT[kj, b] != 0]
                vk = terms[0][1] if terms[0][0] > 0 else -terms[0][1]
                for coef, t in terms[1:]:
                    vk = vk + t if coef > 0 else vk - t
                uk = u_ref[ki * 4 + kj]  # [C, Co]
                # NOTE r3: a weight-stationary single-matmul form
                # (dot(uk, vk) -> [Co, TW, N] + one store transpose per
                # row-pair) was tried to amortize MXU weight loads
                # across tile-rows; Mosaic could not compile the
                # required major<->sublane transpose (remote compiler
                # OOM-killed).  The batched-over-TW form stays.
                ukb = jnp.broadcast_to(uk, (TW, C, Co))
                ms.append(jax.lax.dot_general(
                    ukb, vk,
                    dimension_numbers=(((1,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32))  # [TW, Co, N]
            # AT row 0 = [1,1,1,0]; AT row 1 = [0,1,-1,-1]
            r0[kj] = ms[0] + ms[1] + ms[2]
            r1[kj] = ms[1] - ms[2] - ms[3]
        # AT col-stage: output cols 2t (+0) and 2t+1 (+1)
        o = jnp.stack(
            [jnp.stack([r0[0] + r0[1] + r0[2],
                        r0[1] - r0[2] - r0[3]], axis=1),
             jnp.stack([r1[0] + r1[1] + r1[2],
                        r1[1] - r1[2] - r1[3]], axis=1)],
            axis=0).reshape(2, WB, Co, N)

        row0_ok = (2 * tr_off) < H
        row1_ok = (2 * tr_off + 1) < H

        def masked_rowsum(f):
            """Sum a [WB, Co, N] row image over columns, excluding
            phantom output columns past W on a ragged final chunk (the
            conv of the zero-padded edge is nonzero there, and the
            main-row epilogue streams' out-of-bounds block regions are
            undefined — jnp.where SELECTS, so garbage/NaN never reaches
            the sum) and phantom output rows past H."""
            def one(i):
                t = f(i)
                if colmask is not None:
                    t = jnp.where(colmask[0], t, jnp.zeros_like(t))
                return jnp.sum(t, axis=0)
            s0, s1 = one(0), one(1)
            z = jnp.zeros_like(s0)
            return (jnp.where(row0_ok, s0, z)
                    + jnp.where(row1_ok, s1, z))

        if epi == EPI_BN_ACT:
            cvals = mask_cols(c_ref[2 * k:2 * k + 2])  # fwd x rows, bf16
            bn_c = (cvals * minv.astype(jnp.bfloat16)
                    + mshift.astype(jnp.bfloat16))
            # compare in f32 (exact; target VPU lacks bf16 predicates)
            g = jnp.where(bn_c.astype(jnp.float32) > 0, o, 0.0)
            cf = cvals.astype(jnp.float32)
            acc0 += masked_rowsum(lambda i: g[i])
            acc1 += masked_rowsum(lambda i: g[i] * cf[i])
            o = g * minv
        elif epi == EPI_BN_ADD:
            avals = mask_cols(a_ref[2 * k:2 * k + 2])   # boundary act
            dvals = mask_cols(d_ref[2 * k:2 * k + 2])   # da_ext
            cvals = mask_cols(c_ref[2 * k:2 * k + 2])   # fwd x raw
            # a = relu(pre) was computed and WRITTEN by the fwd kernel,
            # so a > 0 <=> pre-activation > 0 bit-exactly
            g = jnp.where(avals.astype(jnp.float32) > 0,
                          o + dvals.astype(jnp.float32), 0.0)
            cf = cvals.astype(jnp.float32)
            acc0 += masked_rowsum(lambda i: g[i])
            acc1 += masked_rowsum(lambda i: g[i] * cf[i])
            out3_ref[2 * k:2 * k + 2] = g.astype(out3_ref.dtype)
            o = g * minv
        elif epi == EPI_STATS:
            acc0 += masked_rowsum(lambda i: o[i])
            acc1 += masked_rowsum(lambda i: o[i] * o[i])
        out_ref[2 * k:2 * k + 2] = o.astype(out_ref.dtype)

    if epi != EPI_NONE:
        out2_ref[0] += acc0
        out2_ref[1] += acc1


def winograd_call(xt, u, partner=None, cvals=None, avals=None,
                  dvals=None, scal=None, scal2=None,
                  pro=PRO_NONE, epi=EPI_NONE, aux=False,
                  interpret=None, _local=False):
    """Invoke the kernel on the [H,W,C,N] view.

    xt: main input [H,W,C,N]; partner: second full-halo stream (id for
    PRO_BN_ADD, y for PRO_DYEFF); cvals/avals/dvals: main-row epilogue
    streams [H,W,Co,N]; scal: [2, Cx] (inv, shift); scal2: [2, C]
    (ds, dq).  Returns (out, [out2], [aux], [out3]) — a tuple in that
    order containing only the requested outputs.

    Under a registered op mesh (ops/partition.py) the call runs inside
    shard_map over the data axis: every activation/gradient stream and
    every output shards its last (N/lane) dim; weights and BN scalars
    replicate.  This function is then invoked with LOCAL shapes."""
    from .partition import get_op_mesh, lane_sharded_call
    ms = None if _local else get_op_mesh()
    if ms is not None:
        flat = [t for t in (xt, partner, cvals, avals, dvals, u, scal,
                            scal2) if t is not None]
        shardable = ([True]
                     + [True] * sum(t is not None
                                    for t in (partner, cvals, avals,
                                              dvals))
                     + [False]
                     + [False] * sum(t is not None for t in (scal, scal2)))
        out_ranks = [4] + ([3] if epi != EPI_NONE else []) \
            + ([4] if aux else []) + ([4] if epi == EPI_BN_ADD else [])

        def invoke(*local):
            it = iter(local)
            lxt = next(it)
            lpartner = next(it) if partner is not None else None
            lcvals = next(it) if cvals is not None else None
            lavals = next(it) if avals is not None else None
            ldvals = next(it) if dvals is not None else None
            lu = next(it)
            lscal = next(it) if scal is not None else None
            lscal2 = next(it) if scal2 is not None else None
            return winograd_call(lxt, lu, partner=lpartner,
                                 cvals=lcvals, avals=lavals,
                                 dvals=ldvals, scal=lscal, scal2=lscal2,
                                 pro=pro, epi=epi, aux=aux,
                                 interpret=interpret, _local=True)

        return lane_sharded_call(invoke, flat, shardable, out_ranks)
    H, W, C, N = xt.shape
    Co = u.shape[-1]
    n_full = 1 + (1 if partner is not None else 0)
    n_main = ((1 if cvals is not None else 0)
              + (1 if avals is not None else 0)
              + (1 if dvals is not None else 0))
    # EPI_BN_ADD appends a second full-size output-domain stream (out3,
    # the identity cotangent) with cmain's exact footprint formula —
    # count it or the budget gate under-estimates by ~one output stream
    wb = pick_wchunk(W, C, Co, N, full_streams=n_full,
                     main_streams=n_main + (1 if epi == EPI_BN_ADD else 0),
                     aux=1 if aux else 0)
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

    def full_stream_specs():
        specs = []
        for shape, idx in row_specs:
            specs.append(pl.BlockSpec(shape, idx, memory_space=pltpu.VMEM))
        for shape, idx in row_specs:  # left halo columns
            specs.append(pl.BlockSpec(
                (shape[0], 1, C, N),
                (lambda f: lambda wi, si: (f(wi, si)[0],
                                           jnp.maximum(wi * wb - 1, 0),
                                           0, 0))(idx),
                memory_space=pltpu.VMEM))
        for shape, idx in row_specs:  # right halo columns
            specs.append(pl.BlockSpec(
                (shape[0], 1, C, N),
                (lambda f: lambda wi, si: (f(wi, si)[0],
                                           jnp.minimum((wi + 1) * wb,
                                                       W - 1), 0, 0))(idx),
                memory_space=pltpu.VMEM))
        return specs

    main_spec = pl.BlockSpec((2 * RB, wb, Co, N),
                             lambda wi, si: (si, wi, 0, 0),
                             memory_space=pltpu.VMEM)
    in_specs = []
    args = []
    specs9 = full_stream_specs()
    in_specs += specs9
    args += [xt] * 9
    if partner is not None:
        in_specs += specs9
        args += [partner] * 9
    for t in (cvals, avals, dvals):
        if t is not None:
            in_specs.append(main_spec)
            args.append(t)
    in_specs.append(pl.BlockSpec((16, C, Co), lambda wi, si: (0, 0, 0),
                                 memory_space=pltpu.VMEM))
    args.append(u)
    if scal is not None:
        in_specs.append(pl.BlockSpec((2, scal.shape[1], 1),
                                     lambda wi, si: (0, 0, 0),
                                     memory_space=pltpu.VMEM))
        args.append(scal)
    if scal2 is not None:
        in_specs.append(pl.BlockSpec((2, scal2.shape[1], 1),
                                     lambda wi, si: (0, 0, 0),
                                     memory_space=pltpu.VMEM))
        args.append(scal2)

    out_shapes = [jax.ShapeDtypeStruct((H, W, Co, N), jnp.bfloat16)]
    out_specs = [pl.BlockSpec((2 * RB, wb, Co, N),
                              lambda wi, si: (si, wi, 0, 0),
                              memory_space=pltpu.VMEM)]
    if epi != EPI_NONE:
        out_shapes.append(jax.ShapeDtypeStruct((2, Co, N), jnp.float32))
        out_specs.append(pl.BlockSpec((2, Co, N),
                                      lambda wi, si: (0, 0, 0),
                                      memory_space=pltpu.VMEM))
    if aux:
        out_shapes.append(jax.ShapeDtypeStruct((H, W, C, N), jnp.bfloat16))
        out_specs.append(pl.BlockSpec((2 * RB, wb, C, N),
                                      lambda wi, si: (si, wi, 0, 0),
                                      memory_space=pltpu.VMEM))
    if epi == EPI_BN_ADD:
        out_shapes.append(jax.ShapeDtypeStruct((H, W, Co, N),
                                               jnp.bfloat16))
        out_specs.append(pl.BlockSpec((2 * RB, wb, Co, N),
                                      lambda wi, si: (si, wi, 0, 0),
                                      memory_space=pltpu.VMEM))

    res = pl.pallas_call(
        functools.partial(_kernel, H=H, W=W, C=C, Co=Co, N=N, WB=wb,
                          pro=pro, epi=epi, aux=aux),
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs if len(out_specs) > 1 else out_specs[0],
        out_shape=(tuple(out_shapes) if len(out_shapes) > 1
                   else out_shapes[0]),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(*args)
    return res if isinstance(res, (tuple, list)) else (res,)


def winograd_hwcn(xt, u, scal=None, cmask=None, act=False, stats=False,
                  interpret=None):
    """Legacy r2 entry point (kept for experiments/): act -> PRO_BN_ACT,
    stats -> EPI_STATS, cmask -> EPI_BN_ACT with c stream."""
    if cmask is not None:
        out = winograd_call(xt, u, cvals=cmask, scal=scal,
                            pro=PRO_NONE, epi=EPI_BN_ACT,
                            interpret=interpret)
        return out[0], out[1]
    pro = PRO_BN_ACT if act else PRO_NONE
    epi = EPI_STATS if stats else EPI_NONE
    out = winograd_call(xt, u, scal=scal, pro=pro, epi=epi,
                        interpret=interpret)
    if stats:
        return out[0], out[1]
    return out[0]


# --------------------------------------------------------------------- #
# HWCN-native fused ops (custom VJPs).  The whole fused chain — and the
# backbone around it — speaks the [H, W, C, N] view (the fused stem
# already emits it; XLA convs read/write it via conv dimension numbers,
# models/layers.py HwcnConv), so no transpose ever materializes between
# custom calls.


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


def _scal(a, b):
    return jnp.stack([a, b]).astype(jnp.float32)[:, :, None]


def _xla_wgrad_hwcn(z, w, dye):
    """Weight gradient via XLA's wgrad convolution on the HWCN view (its
    big-contraction shapes run at ~86% MXU peak; see module docstring).
    z and dye are the kernel-materialized activated input / effective
    output gradient — nothing is re-materialized here."""
    _, wgrad = jax.vjp(
        lambda w_: jax.lax.conv_general_dilated(
            z.astype(jnp.bfloat16), w_, (1, 1), "SAME",
            dimension_numbers=("HWCN", "HWIO", "HWCN"),
            preferred_element_type=jnp.bfloat16), w.astype(jnp.bfloat16))
    dw, = wgrad(dye.astype(jnp.bfloat16))
    return dw


@jax.custom_vjp
def hconv_stats(x, w):
    """y = conv3x3(x, w) on the [H,W,C,N] view; also returns the
    per-channel (sum, sumsq) of y — the BN statistics of y, computed in
    the conv's output epilogue."""
    u = transform_weights(w).astype(jnp.bfloat16)
    out, s2 = winograd_call(x, u, epi=EPI_STATS)
    s, q = _finish_stats(s2)
    return out, s, q


def _hconv_stats_fwd(x, w):
    y, s, q = hconv_stats(x, w)
    return (y, s, q), (x, w, y)


def _hconv_stats_bwd(res, cts):
    x, w, y = res
    dy, ds, dq = cts
    # input-grad conv with the dy_eff prologue (stats cotangents ride
    # the read); dye is materialized in the aux write for the wgrad
    dx, dye = winograd_call(dy, _rot_u(w), partner=y,
                            scal2=_scal(ds, dq),
                            pro=PRO_DYEFF, epi=EPI_NONE, aux=True)
    dw = _xla_wgrad_hwcn(x, w, dye)
    return dx.astype(x.dtype), dw.astype(w.dtype)


hconv_stats.defvjp(_hconv_stats_fwd, _hconv_stats_bwd)


@jax.custom_vjp
def hconv_bn_act_stats(x, w, inv, shift):
    """y = conv3x3(relu(x*inv + shift), w) plus (sum, sumsq) of y,
    HWCN view.

    x is the PREVIOUS conv's raw output; (inv, shift) are that layer's
    BatchNorm apply scalars — the whole apply+relu pass rides the conv's
    input read instead of a dedicated HBM round-trip."""
    u = transform_weights(w).astype(jnp.bfloat16)
    out, s2 = winograd_call(x, u, scal=_scal(inv, shift),
                            pro=PRO_BN_ACT, epi=EPI_STATS)
    s, q = _finish_stats(s2)
    return out, s, q


def _hcba_fwd(x, w, inv, shift):
    u = transform_weights(w).astype(jnp.bfloat16)
    # aux=True materializes z = relu(bn(x)) for the weight grad — one
    # write here replaces the separate z-recompute pass in backward
    out, s2, z = winograd_call(x, u, scal=_scal(inv, shift),
                               pro=PRO_BN_ACT, epi=EPI_STATS, aux=True)
    s, q = _finish_stats(s2)
    return (out, s, q), (x, w, inv, shift, out, z)


def _hcba_bwd(res, cts):
    x, w, inv, shift, y, z = res
    dy, ds, dq = cts
    scal = _scal(inv, shift)
    # one kernel: dy_eff prologue (reads dy, y), input-grad conv, relu/
    # BN-mask epilogue (reads x raw: mask = bn(x) > 0, acc -> dshift/
    # dinv, output scaled by inv), dye materialized for the wgrad
    dx, g2, dye = winograd_call(dy, _rot_u(w), partner=y, cvals=x,
                                scal=scal, scal2=_scal(ds, dq),
                                pro=PRO_DYEFF, epi=EPI_BN_ACT, aux=True)
    dshift, dinv = _finish_stats(g2)
    dw = _xla_wgrad_hwcn(z, w, dye)
    return (dx.astype(x.dtype), dw.astype(w.dtype),
            dinv.astype(inv.dtype), dshift.astype(shift.dtype))


hconv_bn_act_stats.defvjp(_hcba_fwd, _hcba_bwd)


@jax.custom_vjp
def hconv_bn_add_act_stats(x, ident, w, inv, shift):
    """a = relu(ident + x*inv + shift);  y = conv3x3(a, w);  returns
    (y, a, sum(y), sumsq(y)) — the residual-boundary add+relu of the
    PREVIOUS block rides this conv's input read, and the boundary
    activation a (this block's identity, the wgrad input) is
    materialized in the aux write.  HWCN view.

    Reference behavior: this one call covers the reference's
    element_wise_add + activation + next conv_bn sequence
    (basic_backbone.py:102-125 + 127-138)."""
    u = transform_weights(w).astype(jnp.bfloat16)
    out, s2, a = winograd_call(x, u, partner=ident,
                               scal=_scal(inv, shift),
                               pro=PRO_BN_ADD, epi=EPI_STATS, aux=True)
    s, q = _finish_stats(s2)
    return out, a, s, q


def _hcbaa_fwd(x, ident, w, inv, shift):
    y, a, s, q = hconv_bn_add_act_stats(x, ident, w, inv, shift)
    return (y, a, s, q), (x, w, inv, shift, y, a)


def _hcbaa_bwd(res, cts):
    x, w, inv, shift, y, a = res
    dy, da_ext, ds, dq = cts
    scal = _scal(inv, shift)
    # one kernel: dy_eff prologue, input-grad conv, boundary epilogue:
    # g = (conv + da_ext) * (a > 0); outputs g*inv (x cotangent) and g
    # (identity cotangent); acc (sum g, sum g*x) -> (dshift, dinv)
    dx, g2, dye, dident = winograd_call(
        dy, _rot_u(w), partner=y, cvals=x, avals=a,
        dvals=da_ext.astype(jnp.bfloat16),
        scal=scal, scal2=_scal(ds, dq),
        pro=PRO_DYEFF, epi=EPI_BN_ADD, aux=True)
    dshift, dinv = _finish_stats(g2)
    dw = _xla_wgrad_hwcn(a, w, dye)
    return (dx.astype(x.dtype), dident.astype(x.dtype),
            dw.astype(w.dtype), dinv.astype(inv.dtype),
            dshift.astype(shift.dtype))


hconv_bn_add_act_stats.defvjp(_hcbaa_fwd, _hcbaa_bwd)


# --------------------------------------------------------------------- #
# NHWC wrappers (checkpoint-/test-compatible API; thin transposes)


def _win_nhwc(x, w):
    """[N,H,W,C] bf16 x [3,3,C,Co] -> [N,H,W,Co] bf16 via the kernel."""
    u = transform_weights(w).astype(jnp.bfloat16)
    out, = winograd_call(_hwcn(x), u)
    return _nhwc(out)


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
    dw = _nhwc_wgrad(x, w, dy)
    return dx, dw.astype(w.dtype)


def _nhwc_wgrad(x, w, dy):
    _, wgrad = jax.vjp(
        lambda w_: jax.lax.conv_general_dilated(
            x.astype(jnp.bfloat16), w_, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.bfloat16), w.astype(jnp.bfloat16))
    dw, = wgrad(dy.astype(jnp.bfloat16))
    return dw


conv3x3.defvjp(_conv3x3_fwd, _conv3x3_bwd)


def conv3x3_stats(x, w):
    """NHWC wrapper of :func:`hconv_stats`."""
    y, s, q = hconv_stats(_hwcn(x), w.astype(jnp.bfloat16))
    return _nhwc(y), s, q


def conv3x3_bn_act_stats(x, w, inv, shift):
    """NHWC wrapper of :func:`hconv_bn_act_stats`."""
    y, s, q = hconv_bn_act_stats(_hwcn(x), w.astype(jnp.bfloat16),
                                 inv, shift)
    return _nhwc(y), s, q
