"""Fused stem: BatchNorm-apply + 3x3/s2 max-pool + relu — Pallas TPU.

The reference stem is ``conv_bn -> max_pool(3x3/2) -> relu``
(reference: backbone/resnet18.py:53-58).  Classically that chain costs
four HBM passes over the conv output (apply write+read, pool read, +
stats read) and its backward runs XLA's slow ``select-and-scatter``
(2.8 ms/step at b128).  This op fuses:

  forward:  p = relu(maxpool(y*inv + shift)) in ONE read of y, writing
            p plus a quarter-resolution ARGMAX CODE per window (which
            of the 9 taps won, or 9 = inactive/relu-clamped).
  backward: routes dp through the stored codes — it never re-reads y,
            never recomputes the BN, and does no tie counting:
            reads (dp, idx, p) at quarter resolution, writes dy, and
            accumulates (dshift, dinv*inv) from the pooled values
            (the winner's raw input is (p - shift)/inv, so the BN
            reductions need only quarter-res data).

The r2 backward streamed the full-res y (plus halos) and recomputed
bn + 9-tap equality masks + tie counts per element: 5.7 ms/step at
b128 against a ~2.5 ms floor (~1.4 GB of reads).  This design reads
~0.45 GB and does ~4 compares/element instead of ~9.

Pooling geometry matches XLA SAME for window 3 / stride 2 on even
sizes: pad_lo=0, pad_hi=1, i.e. window r covers rows 2r..2r+2 (the
nn.max_pool the classic path uses — pinned by tests/test_parity.py).
Padding uses 0 instead of -inf, exact here because the trailing relu
clamps negative maxima to 0 anyway.

Tie semantics: FIRST-IN-SCAN — the first window tap (row-major over
the 3x3 window) equal to the maximum receives the whole gradient,
exactly XLA select-and-scatter's convention (the r2 kernel split ties
equally; both are valid subgradients, and first-match needs no tie
counting in the backward).

Layout: operates on the [H, W, C, N] view; the stem conv emits it and
the consuming convs read it directly via conv dimension numbers, so no
transpose ever materializes (see models/layers.py HwcnConv).

Constraints: H % (2*OB) == 0, W % WB == 0 (true for the 416/208 stem).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

OB = 4   # pooled output rows per forward grid step
IB = 8   # input rows per backward grid step
_VMEM_LIMIT = 100 * 1024 * 1024
# -inf stand-in for the pool-only (no-relu) padding: the compare chain
# runs in f32 (bf16 predicates don't lower, CLAUDE.md), so any finite
# bf16 tap beats this.  The fused BN+relu kernel instead 0-pads — exact
# there ONLY because the trailing relu clamps negative maxima.
_NEG = -3.0e38


def _pick_wb(W, C, N, budget=24e6):
    """Full width if it fits, else the largest even divisor chunk."""
    for wb in (W, W // 2, W // 4, W // 8):
        if wb and wb % 2 == 0 and W % wb == 0 \
                and 14 * wb * C * max(N, 128) * 2 <= budget:
            return wb
    return None


def supported(y_shape):
    H, W, C, N = y_shape
    return (H % (2 * OB) == 0 and H % IB == 0 and W % 2 == 0
            and _pick_wb(W, C, N) is not None)


def _ev_od(row, TWo, C, N):
    r2 = row.reshape(TWo, 2, C, N)
    return r2[:, 0], r2[:, 1]  # even cols, odd cols


def _fwd_kernel(ym_ref, yb_ref, rm_ref, rb_ref, scal_ref, out_ref,
                *maybe_idx, H, W, C, N, WB, EMIT=True):
    """Step (w, s): pooled output rows s*OB .. s*OB+OB-1 of chunk w.
    Window r covers input rows 2r..2r+2 and cols 2t..2t+2.  With EMIT
    (train) also emits the winning tap code (row*3 + col of the first
    maximum in scan order, or 9 when the window is inactive: max <= 0);
    inference (bn_pool_relu_eval) skips the code tracking — the compare
    chain is the kernel's VPU cost (PERF.md: +1.6 ms/step at b128)."""
    idx_ref = maybe_idx[0] if EMIT else None
    w = pl.program_id(0)
    s = pl.program_id(1)
    nw = pl.num_programs(0)
    ns = pl.num_programs(1)
    TWo = WB // 2

    inv_b = scal_ref[0].reshape(1, C, 1).astype(jnp.bfloat16)
    shift_b = scal_ref[1].reshape(1, C, 1).astype(jnp.bfloat16)

    def bn(t):
        return t * inv_b + shift_b

    def yrow(j):
        """BN'd input row 2*s*OB + j for j in [0, 2OB]; the j == 2OB row
        comes from the bottom pair; out-of-range rows -> zeros."""
        if j < 2 * OB:
            body, rc = ym_ref[j], rm_ref[j]
            ok = True
        else:
            body, rc = yb_ref[0], rb_ref[0]
            ok = s < ns - 1  # row H at the last step -> 0-pad
        body = jnp.where(ok, bn(body), jnp.zeros_like(body))
        rc = jnp.where(jnp.logical_and(ok, w < nw - 1), bn(rc),
                       jnp.zeros_like(rc))
        # f32 ONCE per row: the argmax compares must run in f32 (the
        # target VPU lacks bf16 predicates) and casting per tap would
        # triple the cast passes; the bn expression stays bf16 so the
        # codes are bit-consistent with the classic apply
        return body.astype(jnp.float32), rc.astype(jnp.float32)

    for k in range(OB):
        # pooled row r = s*OB + k <- input rows 2r..2r+2 = j 2k..2k+2
        cur = None
        code = None
        for a in range(3):
            body, rc = yrow(2 * k + a)
            E, O = _ev_od(body, TWo, C, N)
            Enext = jnp.concatenate([E[1:], rc], axis=0)  # cols 2t+2
            for b, tap in ((0, E), (1, O), (2, Enext)):
                if cur is None:
                    cur = tap
                    if EMIT:
                        code = jnp.zeros((TWo, C, N), jnp.float32)
                else:
                    if EMIT:
                        # strict > keeps the FIRST tap on ties
                        better = tap > cur
                        code = jnp.where(better, float(a * 3 + b), code)
                    cur = jnp.maximum(cur, tap)
        out_ref[k] = jnp.maximum(cur, 0.0).astype(jnp.bfloat16)  # relu
        if EMIT:
            active = cur > 0
            idx_ref[k] = jnp.where(active, code, 9.0).astype(jnp.bfloat16)


def _pool_fwd_kernel(ym_ref, yb_ref, rm_ref, rb_ref, out_ref,
                     *maybe_idx, H, W, C, N, WB, EMIT=True):
    """Pool-only forward (resnet-18-v2 stem, reference
    backbone/resnet18_v2.py:61-62: conv WITHOUT BN/act before the
    pool): p = maxpool_3x3_s2(y).  No BN prologue, no relu epilogue —
    padding must therefore carry -inf semantics (_NEG) instead of the
    fused kernel's 0s, and every window is active (codes 0..8, never
    the 9 = relu-clamped sentinel)."""
    idx_ref = maybe_idx[0] if EMIT else None
    w = pl.program_id(0)
    s = pl.program_id(1)
    nw = pl.num_programs(0)
    ns = pl.num_programs(1)
    TWo = WB // 2

    def yrow(j):
        """Input row 2*s*OB + j f32; out-of-range rows/cols -> _NEG so
        padding taps never win the max."""
        if j < 2 * OB:
            body, rc = ym_ref[j], rm_ref[j]
            ok = True
        else:
            body, rc = yb_ref[0], rb_ref[0]
            ok = s < ns - 1  # row H at the last step -> padding
        body = body.astype(jnp.float32)
        rc = rc.astype(jnp.float32)
        body = jnp.where(ok, body, jnp.full_like(body, _NEG))
        rc = jnp.where(jnp.logical_and(ok, w < nw - 1), rc,
                       jnp.full_like(rc, _NEG))
        return body, rc

    for k in range(OB):
        # pooled row r = s*OB + k <- input rows 2r..2r+2 = j 2k..2k+2
        cur = None
        code = None
        for a in range(3):
            body, rc = yrow(2 * k + a)
            E, O = _ev_od(body, TWo, C, N)
            Enext = jnp.concatenate([E[1:], rc], axis=0)  # cols 2t+2
            for b, tap in ((0, E), (1, O), (2, Enext)):
                if cur is None:
                    # tap (0,0) is always in-range: row 2r <= H-2,
                    # col 2t <= W-2 — the code never lands on padding
                    cur = tap
                    if EMIT:
                        code = jnp.zeros((TWo, C, N), jnp.float32)
                else:
                    if EMIT:
                        # strict > keeps the FIRST tap on ties
                        better = tap > cur
                        code = jnp.where(better, float(a * 3 + b), code)
                    cur = jnp.maximum(cur, tap)
        out_ref[k] = cur.astype(jnp.bfloat16)
        if EMIT:
            idx_ref[k] = code.astype(jnp.bfloat16)


def _load_pooled(m, s, w, dpm_ref, dpt_ref, ixm_ref, ixt_ref,
                 dpl_ref, dplt_ref, ixl_ref, ixlt_ref):
    """(dp, idx) f32 for window row r = s*half - 1 + m, m in
    [0, half], extended with the left-neighbor window col:
    [TWo+1, C, N].  Invalid rows/cols -> dp 0 / idx 9 (matches no
    code)."""
    if m == 0:
        dp, ix = dpt_ref[0], ixt_ref[0]
        dpl, ixl = dplt_ref[0], ixlt_ref[0]
        ok = s > 0
    else:
        dp, ix = dpm_ref[m - 1], ixm_ref[m - 1]
        dpl, ixl = dpl_ref[m - 1], ixl_ref[m - 1]
        ok = True
    edge = w > 0
    dpe = jnp.concatenate(
        [jnp.where(edge, dpl, jnp.zeros_like(dpl)), dp],
        axis=0).astype(jnp.float32)
    ixe = jnp.concatenate(
        [jnp.where(edge, ixl, jnp.full_like(ixl, 9.0)), ix],
        axis=0).astype(jnp.float32)
    return (jnp.where(ok, dpe, jnp.zeros_like(dpe)),
            jnp.where(ok, ixe, jnp.full_like(ixe, 9.0)))


def _route_row(pool, k, TWo, C, N, WB):
    """dy input row s*IB + k from the pooled (dp, idx) rows: the window
    rows containing input row i = s*IB + k, with tap row-offset
    a = i - 2r: i even -> (m = k/2, a = 2) and (m = k/2 + 1, a = 0);
    i odd -> (m = (k-1)/2 + 1, a = 1)."""
    if k % 2 == 0:
        ms = ((k // 2, 2), (k // 2 + 1, 0))
    else:
        ms = (((k - 1) // 2 + 1, 1),)
    we = jnp.zeros((TWo, C, N), jnp.float32)
    wo = jnp.zeros((TWo, C, N), jnp.float32)
    for m, a in ms:
        dp, ix = pool[m]
        # even col 2t: tap b=0 of window col t (ix[1:]) and tap
        # b=2 of window col t-1 (ix[:TWo]); odd col 2t+1: tap b=1
        we += jnp.where(ix[1:] == float(a * 3 + 0), dp[1:], 0.0)
        we += jnp.where(ix[:TWo] == float(a * 3 + 2), dp[:TWo], 0.0)
        wo += jnp.where(ix[1:] == float(a * 3 + 1), dp[1:], 0.0)
    return jnp.stack([we, wo], axis=1).reshape(WB, C, N)


def _bwd_kernel(dpm_ref, dpt_ref, ixm_ref, ixt_ref, pm_ref,
                dpl_ref, dplt_ref, ixl_ref, ixlt_ref,
                scal_ref, out_ref, out2_ref, *, H, W, C, N, WB):
    """Step (w, s): dy for input rows s*IB .. s*IB+IB-1 of chunk w by
    routing dp through the stored argmax codes, plus the BN reductions
    (sum dp_active, sum dp_active*(p - shift)) over this step's main
    window rows (each window counted exactly once across the grid)."""
    w = pl.program_id(0)
    s = pl.program_id(1)
    half = IB // 2
    TWo = WB // 2

    @pl.when(jnp.logical_and(w == 0, s == 0))
    def _():
        out2_ref[...] = jnp.zeros_like(out2_ref)

    inv32 = scal_ref[0].reshape(1, C, 1)
    shift32 = scal_ref[1].reshape(1, C, 1)

    pool = [_load_pooled(m, s, w, dpm_ref, dpt_ref, ixm_ref, ixt_ref,
                         dpl_ref, dplt_ref, ixl_ref, ixlt_ref)
            for m in range(half + 1)]

    # BN reductions over this step's MAIN window rows, main cols only
    # (the left-halo col belongs to the previous chunk); dinv = acc1 /
    # inv is finished by the caller's per-channel scalar math
    acc0 = jnp.zeros((C, N), jnp.float32)
    acc1 = jnp.zeros((C, N), jnp.float32)
    for m in range(1, half + 1):
        dp, ix = pool[m]
        active = ix[1:] <= 8.5
        dpa = jnp.where(active, dp[1:], 0.0)
        pv = pm_ref[m - 1].astype(jnp.float32)  # [TWo, C, N]
        acc0 += jnp.sum(dpa, axis=0)
        acc1 += jnp.sum(dpa * (pv - shift32), axis=0)

    for k in range(IB):
        wrow = _route_row(pool, k, TWo, C, N, WB)
        out_ref[k] = (wrow * inv32).astype(out_ref.dtype)
    out2_ref[0] += acc0
    out2_ref[1] += acc1


def _fwd(y, inv, shift, interpret=None, emit_codes=True):
    """Forward; under a registered op mesh (ops/partition.py) the
    pallas_call runs inside shard_map over the data axis (batch N is
    the last dim of the [H,W,C,N] view).  Returns (p, idx), or just p
    when ``emit_codes=False`` (inference)."""
    from .partition import get_op_mesh, lane_sharded_call
    if get_op_mesh() is not None:
        scal_packed = jnp.stack([inv, shift]).astype(jnp.float32)

        def invoke(ly, lscal):
            return _fwd_local(ly, lscal[0], lscal[1], interpret=interpret,
                              emit_codes=emit_codes)

        return lane_sharded_call(invoke, [y, scal_packed], [True, False],
                                 [4, 4] if emit_codes else [4])
    return _fwd_local(y, inv, shift, interpret=interpret,
                      emit_codes=emit_codes)


def _fwd_local(y, inv, shift, interpret=None, emit_codes=True):
    H, W, C, N = y.shape
    wb = _pick_wb(W, C, N)
    nw = W // wb
    ns = (H // 2) // OB
    scal = jnp.stack([inv, shift]).astype(jnp.float32)[:, :, None]
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    p_spec = pl.BlockSpec((OB, wb // 2, C, N),
                          lambda wi, si: (si, wi, 0, 0),
                          memory_space=pltpu.VMEM)
    p_shape = jax.ShapeDtypeStruct((H // 2, W // 2, C, N), jnp.bfloat16)
    return pl.pallas_call(
        functools.partial(_fwd_kernel, H=H, W=W, C=C, N=N, WB=wb,
                          EMIT=emit_codes),
        grid=(nw, ns),
        in_specs=[
            pl.BlockSpec((2 * OB, wb, C, N),
                         lambda wi, si: (si, wi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, wb, C, N),
                         lambda wi, si: (jnp.minimum(si * OB + OB,
                                                     H // 2 - 1),
                                         wi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * OB, 1, C, N),
                         lambda wi, si: (si, jnp.minimum((wi + 1) * wb,
                                                         W - 1), 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, 1, C, N),
                         lambda wi, si: (jnp.minimum(si * OB + OB,
                                                     H // 2 - 1),
                                         jnp.minimum((wi + 1) * wb,
                                                     W - 1), 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, C, 1), lambda wi, si: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(p_spec, p_spec) if emit_codes else p_spec,
        out_shape=(p_shape, p_shape) if emit_codes else p_shape,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(y, y, y, y, scal)


def _bwd(idx, dp, p, inv, shift, interpret=None):
    from .partition import get_op_mesh, lane_sharded_call
    if get_op_mesh() is not None:
        scal_packed = jnp.stack([inv, shift]).astype(jnp.float32)

        def invoke(lix, ldp, lp, lscal):
            return _bwd_local(lix, ldp, lp, lscal[0], lscal[1],
                              interpret=interpret)

        return lane_sharded_call(invoke, [idx, dp, p, scal_packed],
                                 [True, True, True, False], [4, 3])
    return _bwd_local(idx, dp, p, inv, shift, interpret=interpret)


def _bwd_local(idx, dp, p, inv, shift, interpret=None):
    Ho, Wo, C, N = dp.shape
    H, W = 2 * Ho, 2 * Wo
    wb = _pick_wb(W, C, N)
    nw = W // wb
    ns = H // IB
    wbo = wb // 2
    half = IB // 2
    scal = jnp.stack([inv, shift]).astype(jnp.float32)[:, :, None]
    if interpret is None:
        interpret = jax.default_backend() == "cpu"

    VM = pltpu.VMEM
    pool_main = pl.BlockSpec((half, wbo, C, N),
                             lambda wi, si: (si, wi, 0, 0),
                             memory_space=VM)
    pool_top = pl.BlockSpec((1, wbo, C, N),
                            lambda wi, si: (jnp.maximum(si * half - 1, 0),
                                            wi, 0, 0), memory_space=VM)
    pool_lc = pl.BlockSpec((half, 1, C, N),
                           lambda wi, si: (si,
                                           jnp.maximum(wi * wbo - 1, 0),
                                           0, 0), memory_space=VM)
    pool_lct = pl.BlockSpec((1, 1, C, N),
                            lambda wi, si: (jnp.maximum(si * half - 1, 0),
                                            jnp.maximum(wi * wbo - 1, 0),
                                            0, 0), memory_space=VM)

    dy, s2 = pl.pallas_call(
        functools.partial(_bwd_kernel, H=H, W=W, C=C, N=N, WB=wb),
        grid=(nw, ns),
        in_specs=[pool_main, pool_top,      # dp
                  pool_main, pool_top,      # idx
                  pool_main,                # p (main rows only)
                  pool_lc, pool_lct,        # dp left halo
                  pool_lc, pool_lct,        # idx left halo
                  pl.BlockSpec((2, C, 1), lambda wi, si: (0, 0, 0),
                               memory_space=VM)],
        out_specs=(pl.BlockSpec((IB, wb, C, N),
                                lambda wi, si: (si, wi, 0, 0),
                                memory_space=VM),
                   pl.BlockSpec((2, C, N), lambda wi, si: (0, 0, 0),
                                memory_space=VM)),
        out_shape=(jax.ShapeDtypeStruct((H, W, C, N), jnp.bfloat16),
                   jax.ShapeDtypeStruct((2, C, N), jnp.float32)),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(dp, dp, idx, idx, p, dp, dp, idx, idx, scal)
    return dy, s2


def _pool_bwd_kernel(dpm_ref, dpt_ref, ixm_ref, ixt_ref,
                     dpl_ref, dplt_ref, ixl_ref, ixlt_ref,
                     out_ref, *, H, W, C, N, WB):
    """Pool-only backward: dy by routing dp through the stored argmax
    codes — no BN scalars, no (dshift, dinv) reductions."""
    w = pl.program_id(0)
    s = pl.program_id(1)
    half = IB // 2
    TWo = WB // 2
    pool = [_load_pooled(m, s, w, dpm_ref, dpt_ref, ixm_ref, ixt_ref,
                         dpl_ref, dplt_ref, ixl_ref, ixlt_ref)
            for m in range(half + 1)]
    for k in range(IB):
        out_ref[k] = _route_row(pool, k, TWo, C, N, WB).astype(
            out_ref.dtype)


def _pool_fwd(y, interpret=None, emit_codes=True):
    from .partition import get_op_mesh, lane_sharded_call
    if get_op_mesh() is not None:
        def invoke(ly):
            return _pool_fwd_local(ly, interpret=interpret,
                                   emit_codes=emit_codes)

        return lane_sharded_call(invoke, [y], [True],
                                 [4, 4] if emit_codes else [4])
    return _pool_fwd_local(y, interpret=interpret, emit_codes=emit_codes)


def _pool_fwd_local(y, interpret=None, emit_codes=True):
    H, W, C, N = y.shape
    wb = _pick_wb(W, C, N)
    nw = W // wb
    ns = (H // 2) // OB
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    p_spec = pl.BlockSpec((OB, wb // 2, C, N),
                          lambda wi, si: (si, wi, 0, 0),
                          memory_space=pltpu.VMEM)
    p_shape = jax.ShapeDtypeStruct((H // 2, W // 2, C, N), jnp.bfloat16)
    return pl.pallas_call(
        functools.partial(_pool_fwd_kernel, H=H, W=W, C=C, N=N, WB=wb,
                          EMIT=emit_codes),
        grid=(nw, ns),
        in_specs=[
            pl.BlockSpec((2 * OB, wb, C, N),
                         lambda wi, si: (si, wi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, wb, C, N),
                         lambda wi, si: (jnp.minimum(si * OB + OB,
                                                     H // 2 - 1),
                                         wi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * OB, 1, C, N),
                         lambda wi, si: (si, jnp.minimum((wi + 1) * wb,
                                                         W - 1), 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, 1, C, N),
                         lambda wi, si: (jnp.minimum(si * OB + OB,
                                                     H // 2 - 1),
                                         jnp.minimum((wi + 1) * wb,
                                                     W - 1), 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(p_spec, p_spec) if emit_codes else p_spec,
        out_shape=(p_shape, p_shape) if emit_codes else p_shape,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(y, y, y, y)


def _pool_bwd(idx, dp, interpret=None):
    from .partition import get_op_mesh, lane_sharded_call
    if get_op_mesh() is not None:
        def invoke(lix, ldp):
            return _pool_bwd_local(lix, ldp, interpret=interpret)

        return lane_sharded_call(invoke, [idx, dp], [True, True], [4])
    return _pool_bwd_local(idx, dp, interpret=interpret)


def _pool_bwd_local(idx, dp, interpret=None):
    Ho, Wo, C, N = dp.shape
    H, W = 2 * Ho, 2 * Wo
    wb = _pick_wb(W, C, N)
    nw = W // wb
    ns = H // IB
    wbo = wb // 2
    half = IB // 2
    if interpret is None:
        interpret = jax.default_backend() == "cpu"

    VM = pltpu.VMEM
    pool_main = pl.BlockSpec((half, wbo, C, N),
                             lambda wi, si: (si, wi, 0, 0),
                             memory_space=VM)
    pool_top = pl.BlockSpec((1, wbo, C, N),
                            lambda wi, si: (jnp.maximum(si * half - 1, 0),
                                            wi, 0, 0), memory_space=VM)
    pool_lc = pl.BlockSpec((half, 1, C, N),
                           lambda wi, si: (si,
                                           jnp.maximum(wi * wbo - 1, 0),
                                           0, 0), memory_space=VM)
    pool_lct = pl.BlockSpec((1, 1, C, N),
                            lambda wi, si: (jnp.maximum(si * half - 1, 0),
                                            jnp.maximum(wi * wbo - 1, 0),
                                            0, 0), memory_space=VM)

    return pl.pallas_call(
        functools.partial(_pool_bwd_kernel, H=H, W=W, C=C, N=N, WB=wb),
        grid=(nw, ns),
        in_specs=[pool_main, pool_top,      # dp
                  pool_main, pool_top,      # idx
                  pool_lc, pool_lct,        # dp left halo
                  pool_lc, pool_lct],       # idx left halo
        out_specs=pl.BlockSpec((IB, wb, C, N),
                               lambda wi, si: (si, wi, 0, 0),
                               memory_space=VM),
        out_shape=jax.ShapeDtypeStruct((H, W, C, N), jnp.bfloat16),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(dp, dp, idx, idx, dp, dp, idx, idx)


def max_pool_s2_eval(y):
    """Inference-mode p = maxpool_3x3_s2(y) on the [H,W,C,N] view, no
    argmax-code tracking.  Bit-identical to :func:`max_pool_s2`."""
    return _pool_fwd(y.astype(jnp.bfloat16), emit_codes=False)


@jax.custom_vjp
def max_pool_s2(y):
    """p = maxpool_3x3_s2(y) on the [H,W,C,N] view (pool-only stem for
    resnet-18-v2, whose stem conv has no BN/act — reference
    backbone/resnet18_v2.py:61-62).  Backward routes dp through stored
    argmax codes: first-in-scan ties, XLA select-and-scatter's
    convention."""
    p, _ = _pool_fwd(y.astype(jnp.bfloat16))
    return p


def _pool_vjp_fwd(y):
    p, idx = _pool_fwd(y.astype(jnp.bfloat16))
    # y is NOT saved: the backward needs only the codes
    return p, (idx, jnp.zeros((), y.dtype))


def _pool_vjp_bwd(res, dp):
    idx, ymeta = res
    dy = _pool_bwd(idx, dp.astype(jnp.bfloat16))
    return (dy.astype(ymeta.dtype),)


max_pool_s2.defvjp(_pool_vjp_fwd, _pool_vjp_bwd)


def bn_pool_relu_eval(y, inv, shift):
    """Inference-mode p = relu(maxpool_3x3_s2(y*inv + shift)) on the
    [H,W,C,N] view: no argmax-code tracking (the code compare chain is
    the train forward's VPU cost; inference never needs a backward).
    Bit-identical to :func:`bn_pool_relu`'s primal output."""
    return _fwd(y.astype(jnp.bfloat16), inv, shift, emit_codes=False)


@jax.custom_vjp
def bn_pool_relu(y, inv, shift):
    """p = relu(maxpool_3x3_s2(y*inv + shift)) on the [H,W,C,N] view."""
    p, _ = _fwd(y.astype(jnp.bfloat16), inv, shift)
    return p


def _vjp_fwd(y, inv, shift):
    p, idx = _fwd(y.astype(jnp.bfloat16), inv, shift)
    # y is NOT saved: the backward routes gradients by the stored codes
    # and reconstructs the winners' raw inputs from (p - shift)/inv
    return p, (idx, p, inv, shift, jnp.zeros((), y.dtype))


def _vjp_bwd(res, dp):
    idx, p, inv, shift, ymeta = res
    dy, s2 = _bwd(idx, dp.astype(jnp.bfloat16), p, inv, shift)
    dshift = s2[0].sum(-1)
    # s2[1] = sum dp_active * (p - shift) = dinv * inv.  Guard the
    # exact-zero channel (gamma underflowed to 0): s2[1] is then 0 too
    # (y*0+shift is constant, so either p-shift == 0 or relu is
    # inactive) and the unguarded 0/0 would pump NaN into every param
    # on the next optimizer step — same guard class as the decode
    # sigmoid/exp clamps (CLAUDE.md stability invariants).
    safe_inv = jnp.where(inv == 0, jnp.ones_like(inv), inv)
    dinv = jnp.where(inv == 0, 0.0, s2[1].sum(-1) / safe_inv)
    return (dy.astype(ymeta.dtype), dinv.astype(inv.dtype),
            dshift.astype(shift.dtype))


bn_pool_relu.defvjp(_vjp_fwd, _vjp_bwd)
