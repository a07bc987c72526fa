"""Prototype: fused Winograd F(2x2, 3x3) convolution in Pallas (TPU).

Targets the compute-bound 3x3/s1/SAME convs of the train step (28.5
ms/step at ~95% MXU peak per the r2 trace): F(2,3) cuts MACs 2.25x, and
the fused kernel keeps the 4x-expanded tile tensors in VMEM only.

Layout trick: operate on the [H, W, C, N] transpose-view of NHWC so the
minor two dims (C, N) form full (sublane, lane) tiles; all spatial
stencils (tile extraction, inverse transform placement) are then free
addressing along untiled dims. W is viewed as (T, 2) so stride-2 column
taps become static indexing + leading-dim shifts (Mosaic cannot lower
strided gathers).

Grid: (W-chunks, row-pairs+1), W outer. Each step streams one row-pair of
one W-chunk; a 2-pair rolling VMEM store provides the 4-row window; 1-col
halo specs provide the cross-chunk columns.

Usage: python experiments/winograd_proto.py [check|bench]
"""
import functools
import sys

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


def transform_weights(w):
    """w: [3,3,C,Co] -> U [4,4,C,Co] = G @ g @ G^T per (C,Co)."""
    w = w.astype(jnp.float32)
    u = jnp.einsum("ia,abcd->ibcd", jnp.asarray(G), w)
    u = jnp.einsum("ibcd,jb->ijcd", u, jnp.asarray(G))
    return u


def _kernel(x_ref, lh_ref, rh_ref, u_ref, out_ref, xs, lhs, rhs, oacc,
            *, H, W, C, Co, N, WB):
    """Step (w, r): row-pair r of W-chunk w arrives; emit tile-row r-1."""
    w = pl.program_id(0)
    r = pl.program_id(1)
    nw = pl.num_programs(0)
    npairs = (H + 1) // 2
    TW = WB // 2

    zc = jnp.zeros((1, C, N), jnp.bfloat16)
    lcol = jnp.where(w > 0, lh_ref[...], jnp.zeros_like(lh_ref))
    rcol = jnp.where(w < nw - 1, rh_ref[...], jnp.zeros_like(rh_ref))

    @pl.when(r >= 1)
    def _():
        tr = r - 1  # tile-row; output rows 2*tr, 2*tr+1
        # rows 2tr-1..2tr+2 live at: xs[0]=pair tr-1, xs[1]=pair tr,
        # x_ref=pair tr+1 (all indices static; see the shift-copy below)
        srcs = [(xs, 0, 1), (xs, 1, 0), (xs, 1, 1), (None, None, 0)]

        def in_rows(a):
            """Row 2*tr-1+a: ([TW,2,C,N], left [1,C,N], right [1,C,N])."""
            h = 2 * tr - 1 + a
            store, slot, off = srcs[a]
            if store is None:
                body = x_ref[off].reshape(TW, 2, C, N)
                lc, rc = lcol[off], rcol[off]
            else:
                body = store[slot, off]
                lc, rc = lhs[slot, off], rhs[slot, off]
            ok = jnp.logical_and(h >= 0, h < H)
            return (jnp.where(ok, body, jnp.zeros_like(body)),
                    jnp.where(ok, lc, jnp.zeros_like(lc)),
                    jnp.where(ok, rc, jnp.zeros_like(rc)))

        rows = [in_rows(a) for a in range(4)]

        def tap(a, b):
            """[TW, C, N]: column (2t - 1 + b) of each tile t in row a."""
            body, lc, rc = rows[a]
            if b == 0:
                return jnp.concatenate([lc[None] if lc.ndim == 2 else lc,
                                        body[:-1, 1]], axis=0)
            if b == 1:
                return body[:, 0]
            if b == 2:
                return body[:, 1]
            return jnp.concatenate([body[1:, 0],
                                    rc[None] if rc.ndim == 2 else rc],
                                   axis=0)

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
                # batched matmul over TW: [TW,C,N] x [C,Co] -> [TW,Co,N]
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
                if first:  # zero the slots tap (0,0) does not touch
                    z = jnp.zeros((TW, Co, N), jnp.float32)
                    oacc[0, :, 1] = z
                    oacc[1, :, 0] = z
                    oacc[1, :, 1] = z
                    first = False
        out_ref[...] = oacc[...].astype(out_ref.dtype).reshape(
            2, WB, Co, N)

    # shift the rolling store: xs[0] <- xs[1] <- incoming pair
    @pl.when(r < npairs)
    def _():
        xs[0] = xs[1]
        xs[1] = x_ref[...].reshape(2, TW, 2, C, N)
        lhs[0] = lhs[1]
        lhs[1] = lcol
        rhs[0] = rhs[1]
        rhs[1] = rcol


def winograd_conv(x, w, wb=None):
    """x: [N,H,W,C] bf16, w: [3,3,C,Co] -> [N,H,W,Co] (3x3/s1/SAME)."""
    N, H, W, C = x.shape
    Co = w.shape[-1]
    u = transform_weights(w).reshape(16, C, Co).astype(jnp.bfloat16)
    xt = jnp.transpose(x, (1, 2, 3, 0))  # [H,W,C,N]
    out = _winograd_hwcn(xt, u, wb=wb)
    return jnp.transpose(out, (3, 0, 1, 2))


def _winograd_hwcn(xt, u, wb=None):
    """Core kernel on the [H,W,C,N] view; returns [H,W,Co,N]."""
    H, W, C, N = xt.shape
    Co = u.shape[-1]
    if wb is None:
        # largest even chunk with an even number of tiles per chunk
        wb = W
        while (wb * (C + Co) * N * 2 * 6 > 24e6 and wb % 2 == 0
               and (wb // 2) % 2 == 0):
            wb //= 2
    assert W % wb == 0 and wb % 2 == 0, (W, wb)
    npairs = (H + 1) // 2
    nw = W // wb
    grid = (nw, npairs + 1)

    def xmap(wi, r):
        return (jnp.minimum(r, npairs - 1), wi, 0, 0)

    out = pl.pallas_call(
        functools.partial(_kernel, H=H, W=W, C=C, Co=Co, N=N, WB=wb),
        grid=grid,
        in_specs=[
            pl.BlockSpec((2, wb, C, N), xmap, memory_space=pltpu.VMEM),
            # halo columns: left = last col of prev chunk, right = first
            # col of next chunk (clipped; masked at the global edges)
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
        out_shape=jax.ShapeDtypeStruct((H, W, Co, N), xt.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, 2, wb // 2, 2, C, N), jnp.bfloat16),
            pltpu.VMEM((2, 2, 1, C, N), jnp.bfloat16),
            pltpu.VMEM((2, 2, 1, C, N), jnp.bfloat16),
            pltpu.VMEM((2, wb // 2, 2, Co, N), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=(jax.default_backend() == "cpu"),
    )(xt, xt, xt, u)
    return out


def check():
    shapes = [(8, 16, 16, 64, 64, None), (8, 16, 32, 64, 64, 16),
              (4, 10, 8, 64, 32, None)]
    for (N, H, W, C, Co, wb) in shapes:
        k1, k2 = jax.random.split(jax.random.PRNGKey(0))
        x = jax.random.normal(k1, (N, H, W, C), jnp.float32)
        w = jax.random.normal(k2, (3, 3, C, Co), jnp.float32) * 0.1
        xb, wbf = x.astype(jnp.bfloat16), w.astype(jnp.bfloat16)
        ref = jax.lax.conv_general_dilated(
            xb, wbf, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32)
        got = winograd_conv(xb, wbf, wb).astype(jnp.float32)
        err = jnp.max(jnp.abs(got - ref)) / (jnp.max(jnp.abs(ref)) + 1e-9)
        print(f"N{N} H{H} W{W} C{C}->{Co} wb={wb}: rel err {err:.4f}")


def bench():
    """Chain K invocations inside one jit so the ~3ms relay dispatch
    overhead amortizes away (C == Co shapes only)."""
    import time
    K = 20
    shapes = [(128, 104, 104, 64, 64), (128, 52, 52, 128, 128),
              (128, 26, 26, 256, 256), (128, 52, 52, 512, 512)]
    for (N, H, W, C, Co) in shapes:
        k1, k2 = jax.random.split(jax.random.PRNGKey(0))
        x = jax.random.normal(k1, (N, H, W, C)).astype(jnp.bfloat16)
        w = (jax.random.normal(k2, (3, 3, C, Co)) * 0.02).astype(
            jnp.bfloat16)

        @jax.jit
        def f_ref(x, w):
            def body(i, x):
                y = jax.lax.conv_general_dilated(
                    x, w, (1, 1), "SAME",
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                    preferred_element_type=jnp.bfloat16)
                return y * (1.0 / jnp.sqrt(jnp.bfloat16(C * 9.0)))
            return jax.lax.fori_loop(0, K, body, x)

        xt = jnp.transpose(x, (1, 2, 3, 0))
        u = transform_weights(w).reshape(16, C, Co).astype(jnp.bfloat16)

        @jax.jit
        def f_win(xt, u):
            def body(i, xt):
                y = _winograd_hwcn(xt, u)
                return y * (1.0 / jnp.sqrt(jnp.bfloat16(C * 9.0)))
            return jax.lax.fori_loop(0, K, body, xt)

        for name, f, args in (("xla", f_ref, (x, w)),
                              ("win", f_win, (xt, u))):
            try:
                y = f(*args)
                _ = float(jnp.sum(y.astype(jnp.float32)))
            except Exception as e:
                print(f"  {name} N{N} {H}x{W} C{C}->{Co}: FAIL "
                      f"{type(e).__name__} {str(e)[:200]}")
                continue
            n = 3
            t0 = time.perf_counter()
            for _ in range(n):
                y = f(*args)
            _ = float(jnp.sum(y.astype(jnp.float32)))
            dt = (time.perf_counter() - t0) / (n * K)
            gflops = 2 * N * H * W * C * Co * 9 / dt / 1e12
            print(f"  {name} N{N} {H}x{W} C{C}->{Co}: {dt*1e3:7.2f} ms "
                  f"({gflops:6.1f} TFLOP/s direct-equiv)")


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "check"
    if mode == "check":
        check()
    else:
        bench()
