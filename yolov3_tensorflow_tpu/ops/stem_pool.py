"""Fused stem: BatchNorm-apply + 3x3/s2 max-pool + relu — Pallas TPU.

The reference stem is ``conv_bn -> max_pool(3x3/2) -> relu``
(reference: backbone/resnet18.py:53-58).  Classically that chain costs
four HBM passes over the conv output (apply write+read, pool read, +
stats read) and its backward runs XLA's slow ``select-and-scatter``
(2.8 ms/step at b128).  This op fuses:

  forward:  p = relu(maxpool(y*inv + shift)) in ONE read of y and one
            write of p (the BN apply never materializes).
  backward: a scatter kernel recomputes the window maxima from y and
            routes dp through the max positions, emitting dy plus the
            (d_shift, d_inv) reductions in one pass — no
            select-and-scatter, no materialized bn tensor.

Pooling geometry matches XLA SAME for window 3 / stride 2 on even
sizes: pad_lo=0, pad_hi=1, i.e. window r covers rows 2r..2r+2 (the
nn.max_pool the classic path uses — pinned by tests/test_parity.py).
Padding uses 0 instead of -inf, exact here because the trailing relu
clamps negative maxima to 0 anyway.

Tie semantics: where several window elements equal the maximum (common
in bf16) the gradient is SPLIT EQUALLY among them — a valid subgradient
(XLA's select-and-scatter picks the first in scan order; either choice
is a measure-zero convention).  Selected-element identities use exact
equality against the pooled value, bit-consistent because the same
Mosaic-compiled BN expression produces both sides.

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
                *, H, W, C, N, WB):
    """Step (w, s): pooled output rows s*OB .. s*OB+OB-1 of chunk w.
    Window r covers input rows 2r..2r+2 and cols 2t..2t+2."""
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
        return body, rc

    for k in range(OB):
        # pooled row r = s*OB + k <- input rows 2r..2r+2 = j 2k..2k+2
        m = None
        for a in range(3):
            body, rc = yrow(2 * k + a)
            E, O = _ev_od(body, TWo, C, N)
            Enext = jnp.concatenate([E[1:], rc], axis=0)  # cols 2t+2
            rowmax = jnp.maximum(jnp.maximum(E, O), Enext)
            m = rowmax if m is None else jnp.maximum(m, rowmax)
        out_ref[k] = jnp.maximum(m, jnp.bfloat16(0))  # relu


def _bwd_kernel(ym_ref, yt_ref, yb_ref, lm_ref, lt_ref, lb_ref,
                rm_ref, rt_ref, rb_ref,
                dpm_ref, dpt_ref, pm_ref, pt_ref,
                dpl_ref, dplt_ref, pll_ref, plt_ref,
                scal_ref, out_ref, out2_ref,
                *, H, W, C, N, WB):
    """Step (w, s): dy for input rows s*IB .. s*IB+IB-1 of chunk w, plus
    (sum w, sum w*y) accumulation (d_shift / d_inv)."""
    w = pl.program_id(0)
    s = pl.program_id(1)
    nw = pl.num_programs(0)
    ns = pl.num_programs(1)
    TWo = WB // 2
    half = IB // 2

    @pl.when(jnp.logical_and(w == 0, s == 0))
    def _():
        out2_ref[...] = jnp.zeros_like(out2_ref)

    inv32 = scal_ref[0].reshape(1, C, 1)
    inv_b = inv32.astype(jnp.bfloat16)
    shift_b = scal_ref[1].reshape(1, C, 1).astype(jnp.bfloat16)

    def raw_row(j):
        """Raw y row at absolute i0-2+j, j in [0, IB+3]."""
        if j < 2:
            body, lc, rc = yt_ref[j], lt_ref[j], rt_ref[j]
            ok = s > 0
        elif j < IB + 2:
            body, lc, rc = ym_ref[j - 2], lm_ref[j - 2], rm_ref[j - 2]
            ok = True
        else:
            jj = j - IB - 2
            body, lc, rc = yb_ref[jj], lb_ref[jj], rb_ref[jj]
            ok = s < ns - 1
        z = jnp.zeros_like
        body = jnp.where(ok, body, z(body))
        lc = jnp.where(jnp.logical_and(ok, w > 0), lc, z(lc))
        rc = jnp.where(jnp.logical_and(ok, w < nw - 1), rc, z(rc))
        return body, lc, rc

    def bn_taps(j):
        """Window taps of BN'd row j over window cols s' = s+1 in
        [0, TWo] (s' = 0 is the previous chunk's last window):
        returns (T0, T1, T2) each [TWo+1, C, N] for window cols
        2s, 2s+1, 2s+2."""
        body, lc, rc = raw_row(j)
        # bn(0-padding) = shift, which could spuriously equal a pooled
        # max — re-zero bn for absent rows/cols with the same masks
        bnb = body * inv_b + shift_b
        bnl = lc * inv_b + shift_b
        bnr = rc * inv_b + shift_b
        if j < 2:
            ok = s > 0
        elif j < IB + 2:
            ok = True
        else:
            ok = s < ns - 1
        z = jnp.zeros_like
        bnb = jnp.where(ok, bnb, z(bnb))
        bnl = jnp.where(jnp.logical_and(ok, w > 0), bnl, z(bnl))
        bnr = jnp.where(jnp.logical_and(ok, w < nw - 1), bnr, z(bnr))
        E, O = _ev_od(bnb, TWo, C, N)
        T0 = jnp.concatenate([bnl[0:1], E], axis=0)   # cols -2,0,..WB-2
        T1 = jnp.concatenate([bnl[1:2], O], axis=0)   # cols -1,1,..WB-1
        T2 = jnp.concatenate([E, bnr], axis=0)        # cols 0,2,..WB
        return T0, T1, T2

    def pooled(m):
        """(dp, p) for window row index m in [0, half] of the step's
        range r = s*half - 1 + m, extended with the left-neighbor
        window col: [TWo+1, C, N]; invalid rows zeroed."""
        if m == 0:
            dp, p = dpt_ref[0], pt_ref[0]
            dpl, pl_ = dplt_ref[0], plt_ref[0]
            ok = s > 0
        else:
            dp, p = dpm_ref[m - 1], pm_ref[m - 1]
            dpl, pl_ = dpl_ref[m - 1], pll_ref[m - 1]
            ok = True
        edge = w > 0
        z = jnp.zeros_like
        dpe = jnp.concatenate([jnp.where(edge, dpl, z(dpl)), dp], axis=0)
        pe = jnp.concatenate([jnp.where(edge, pl_, z(pl_)), p], axis=0)
        return (jnp.where(ok, dpe, z(dpe)), jnp.where(ok, pe, z(pe)))

    # BN'd window taps per step row, computed once (rows are shared by
    # up to two window rows and by the dy loop below)
    taps = [bn_taps(j) for j in range(IB + 4)]

    # per window row m: tie counts and dp/cnt, [TWo+1, C, N]
    gdc = {}
    pvals = {}
    for m in range(half + 1):
        dpe, pe = pooled(m)
        p32 = pe.astype(jnp.float32)
        cnt = None
        for a in range(3):
            # window row r = s*half - 1 + m covers input rows 2r..2r+2
            # = step rows (2m - 2 + a) + 2 = 2m + a
            for tap in taps[2 * m + a]:
                eq = (tap.astype(jnp.float32) == p32).astype(jnp.float32)
                cnt = eq if cnt is None else cnt + eq
        active = jnp.logical_and(p32 > 0, cnt > 0)
        gdc[m] = jnp.where(
            active, dpe.astype(jnp.float32) / jnp.maximum(cnt, 1.0), 0.0)
        pvals[m] = p32

    acc_s = jnp.zeros((C, N), jnp.float32)
    acc_sy = jnp.zeros((C, N), jnp.float32)
    for k in range(IB):
        body, lc, rc = raw_row(k + 2)  # input row i = s*IB + k
        # taps[k+2] = (T0 [lcol,E...], T1 [lcol,O...], T2 [E...,rcol]):
        # recover this row's E/O tap views without recomputing bn
        T0, T1, T2 = taps[k + 2]
        E32 = T0[1:].astype(jnp.float32)
        O32 = T1[1:].astype(jnp.float32)
        # window rows containing i: i even -> r in {i/2-1, i/2}
        # (step m = k/2, k/2+1); i odd -> r = (i-1)/2 (m = (k-1)/2 + 1)
        ms = [k // 2, k // 2 + 1] if k % 2 == 0 else [(k - 1) // 2 + 1]
        we = jnp.zeros((TWo, C, N), jnp.float32)
        wo = jnp.zeros((TWo, C, N), jnp.float32)
        for m in ms:
            pv, gd = pvals[m], gdc[m]
            # even col 2t: window col s=t (tap T0, s'=t+1) and s=t-1
            # (tap T2, s'=t)
            we += jnp.where(E32 == pv[1:], gd[1:], 0.0)
            we += jnp.where(E32 == pv[:TWo], gd[:TWo], 0.0)
            # odd col 2t+1: window col s=t only (tap T1, s'=t+1)
            wo += jnp.where(O32 == pv[1:], gd[1:], 0.0)
        wrow = jnp.stack([we, wo], axis=1).reshape(WB, C, N)
        yraw = body.astype(jnp.float32).reshape(WB, C, N)
        acc_s += jnp.sum(wrow, axis=0)
        acc_sy += jnp.sum(wrow * yraw, axis=0)
        out_ref[k] = (wrow * inv32).astype(out_ref.dtype)
    out2_ref[0] += acc_s
    out2_ref[1] += acc_sy


def _fwd(y, inv, shift, interpret=None):
    """Fused BN-apply+maxpool+relu forward; under a registered op mesh
    (ops/partition.py) the pallas_call runs inside shard_map over the
    data axis (batch N is the last dim of the [H,W,C,N] view)."""
    from .partition import get_op_mesh, lane_sharded_call
    if get_op_mesh() is not None:
        scal_packed = jnp.stack([inv, shift]).astype(jnp.float32)
        def invoke(ly, lscal):
            return _fwd_local(ly, lscal[0], lscal[1],
                              interpret=interpret)
        return lane_sharded_call(lambda ly, ls: (invoke(ly, ls),),
                                 [y, scal_packed], [True, False],
                                 [4])[0]
    return _fwd_local(y, inv, shift, interpret=interpret)


def _fwd_local(y, inv, shift, interpret=None):
    H, W, C, N = y.shape
    wb = _pick_wb(W, C, N)
    nw = W // wb
    ns = (H // 2) // OB
    scal = jnp.stack([inv, shift]).astype(jnp.float32)[:, :, None]
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    return pl.pallas_call(
        functools.partial(_fwd_kernel, H=H, W=W, C=C, N=N, WB=wb),
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
        out_specs=pl.BlockSpec((OB, wb // 2, C, N),
                               lambda wi, si: (si, wi, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((H // 2, W // 2, C, N),
                                       jnp.bfloat16),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(y, y, y, y, scal)


def _bwd(y, dp, p, inv, shift, interpret=None):
    from .partition import get_op_mesh, lane_sharded_call
    if get_op_mesh() is not None:
        scal_packed = jnp.stack([inv, shift]).astype(jnp.float32)
        def invoke(ly, ldp, lp, lscal):
            return _bwd_local(ly, ldp, lp, lscal[0], lscal[1],
                              interpret=interpret)
        return lane_sharded_call(invoke, [y, dp, p, scal_packed],
                                 [True, True, True, False], [4, 3])
    return _bwd_local(y, dp, p, inv, shift, interpret=interpret)


def _bwd_local(y, dp, p, inv, shift, interpret=None):
    H, W, C, N = y.shape
    wb = _pick_wb(W, C, N, budget=12e6)
    nw = W // wb
    ns = H // IB
    wbo = wb // 2
    Wo = W // 2
    Ro = H // 2
    half = IB // 2
    scal = jnp.stack([inv, shift]).astype(jnp.float32)[:, :, None]
    if interpret is None:
        interpret = jax.default_backend() == "cpu"

    def mid(wi, si):
        return (si, wi, 0, 0)

    VM = pltpu.VMEM
    y_specs = [
        pl.BlockSpec((IB, wb, C, N), mid, memory_space=VM),
        pl.BlockSpec((2, wb, C, N),
                     lambda wi, si: (jnp.maximum(si * half - 1, 0),
                                     wi, 0, 0), memory_space=VM),
        pl.BlockSpec((2, wb, C, N),
                     lambda wi, si: (jnp.minimum(si * half + half,
                                                 Ro - 1), wi, 0, 0),
                     memory_space=VM),
    ]
    # left y halo: cols wi*wb-2, wi*wb-1 (2-col blocks)
    lidx = [mid,
            lambda wi, si: (jnp.maximum(si * half - 1, 0), wi, 0, 0),
            lambda wi, si: (jnp.minimum(si * half + half, Ro - 1),
                            wi, 0, 0)]
    lcol_specs = [
        pl.BlockSpec((rows, 2, C, N),
                     (lambda f: lambda wi, si: (f(wi, si)[0],
                                                jnp.maximum(wi * wbo - 1,
                                                            0), 0, 0))(f),
                     memory_space=VM)
        for rows, f in ((IB, lidx[0]), (2, lidx[1]), (2, lidx[2]))
    ]
    # right y halo: col (wi+1)*wb (1-col blocks)
    rcol_specs = [
        pl.BlockSpec((rows, 1, C, N),
                     (lambda f: lambda wi, si: (f(wi, si)[0],
                                                jnp.minimum((wi + 1) * wb,
                                                            W - 1), 0,
                                                0))(f),
                     memory_space=VM)
        for rows, f in ((IB, lidx[0]), (2, lidx[1]), (2, lidx[2]))
    ]
    pool_main = pl.BlockSpec((half, wbo, C, N), mid, memory_space=VM)
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
        in_specs=(y_specs + lcol_specs + rcol_specs
                  + [pool_main, pool_top, pool_main, pool_top,
                     pool_lc, pool_lct, pool_lc, pool_lct,
                     pl.BlockSpec((2, C, 1), lambda wi, si: (0, 0, 0),
                                  memory_space=VM)]),
        out_specs=(pl.BlockSpec((IB, wb, C, N), mid, memory_space=VM),
                   pl.BlockSpec((2, C, N), lambda wi, si: (0, 0, 0),
                                memory_space=VM)),
        out_shape=(jax.ShapeDtypeStruct((H, W, C, N), jnp.bfloat16),
                   jax.ShapeDtypeStruct((2, C, N), jnp.float32)),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(y, y, y, y, y, y, y, y, y, dp, dp, p, p, dp, dp, p, p, scal)
    return dy, s2


@jax.custom_vjp
def bn_pool_relu(y, inv, shift):
    """p = relu(maxpool_3x3_s2(y*inv + shift)) on the [H,W,C,N] view."""
    return _fwd(y.astype(jnp.bfloat16), inv, shift)


def _vjp_fwd(y, inv, shift):
    p = _fwd(y.astype(jnp.bfloat16), inv, shift)
    return p, (y, p, inv, shift)


def _vjp_bwd(res, dp):
    y, p, inv, shift = res
    dy, s2 = _bwd(y.astype(jnp.bfloat16), dp.astype(jnp.bfloat16), p,
                  inv, shift)
    dshift = s2[0].sum(-1)
    dinv = s2[1].sum(-1)
    return (dy.astype(y.dtype), dinv.astype(inv.dtype),
            dshift.astype(shift.dtype))


bn_pool_relu.defvjp(_vjp_fwd, _vjp_bwd)
