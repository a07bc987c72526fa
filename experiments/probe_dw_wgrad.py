"""Probe: 9-tap multiply-reduce formulation of the depthwise WGRAD.

The round-4 roofline audit found mobilenet-v2's wall is the depthwise
weight-gradient fusions: 1.2-1.6 GB each at only 470-593 GB/s (57-72%
of HBM peak), ~20 ms of its 118 ms step — and probe_act8_mnv2.py
showed XLA additionally materializes a duplicate bf16 residual for
them.  A Pallas kernel is awkward here (vertical halo rows across
row-block boundaries triple the x reads), but there is a pure-XLA
reformulation: for a 3x3/s1 depthwise conv,

    dW[dh, dw, e] = sum_{n,h,w} xp[n, h+dh, w+dw, e] * dy[n, h, w, e]

over the padded input xp — nine multiply+reduce terms over nine
STATIC SLICES of one shared tensor.  If XLA fuses the nine into one
input fusion (it fuses BN's sum/sumsq the same way), the whole wgrad
reads x + dy exactly once: ~0.8 GB at streaming rate vs the emitter's
1.6 GB at 470 GB/s.

This probe A/Bs, on the production expansion shape (104^2 x 144):
  A: jax.grad through lax.conv_general_dilated (the XLA emitter path)
  B: the 9-slice multiply-reduce (values checked against A)

MEASURED (b128, E=144, 20 steps, v5e) — REJECTED:

  | formulation | ms | effective GB/s on the x+dy bytes |
  |---|---|---|
  | XLA wgrad emitter | 2.67 | 298 |
  | 9-slice multiply-reduce | 6.55 | 122 |

XLA does NOT fuse the nine shifted multiply-reduces into one input
fusion — the padded tensor materializes and the reductions run as
separate passes (values match the emitter at rel 3e-3, bf16
accumulation-order noise).  The depthwise-wgrad emitter therefore
stands as measured; the remaining hypothetical is a Pallas kernel,
which carries a structural handicap noted here for the record: the
vertical +/-1 taps need halo rows across row-block boundaries, and
Mosaic BlockSpecs cannot overlap — the workarounds (RB=1 grids,
triple-bound x refs, or a pre-pad pass) each cost more than the
~2x bandwidth deficit they would recover.  Round-4 verdict item 3 is
closed as "documented, mechanism understood" for this op.

Usage: python experiments/probe_dw_wgrad.py [batch] [E] [steps]
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    E = int(sys.argv[2]) if len(sys.argv) > 2 else 144
    steps = int(sys.argv[3]) if len(sys.argv) > 3 else 20
    H = W = 104

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(batch, H, W, E).astype(np.float32)
                    ).astype(jnp.bfloat16)
    dy = jnp.asarray(rng.rand(batch, H, W, E).astype(np.float32)
                     ).astype(jnp.bfloat16)
    w = jnp.asarray(rng.randn(3, 3, 1, E).astype(np.float32) * 0.1
                    ).astype(jnp.bfloat16)

    def conv(x, w):
        return jax.lax.conv_general_dilated(
            x, w, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=E)

    @jax.jit
    def wgrad_xla(x, dy, w):
        return jax.grad(
            lambda w: jnp.sum(conv(x, w).astype(jnp.float32)
                              * dy.astype(jnp.float32)))(w)

    @jax.jit
    def wgrad_slices(x, dy):
        xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
        taps = []
        for dh in range(3):
            for dw in range(3):
                prod = (xp[:, dh:dh + H, dw:dw + W, :]
                        .astype(jnp.float32)
                        * dy.astype(jnp.float32))
                taps.append(jnp.sum(prod, axis=(0, 1, 2)))
        return jnp.stack(taps).reshape(3, 3, 1, E)

    a = wgrad_xla(x, dy, w)
    b = wgrad_slices(x, dy)
    err = float(jnp.max(jnp.abs(a.astype(jnp.float32)
                                - b.astype(jnp.float32))))
    rel = err / float(jnp.max(jnp.abs(a.astype(jnp.float32))))
    print(f"max abs err {err:.4g} (rel {rel:.2e})")

    for name, fn in (("xla ", lambda: wgrad_xla(x, dy, w)),
                     ("9tap", lambda: wgrad_slices(x, dy))):
        r = fn()
        float(jnp.sum(r.astype(jnp.float32)))
        t0 = time.perf_counter()
        for _ in range(steps):
            r = fn()
        float(jnp.sum(r.astype(jnp.float32)))
        dt = (time.perf_counter() - t0) / steps * 1e3
        gb = 2 * batch * H * W * E * 2 / 1e9
        print(f"{name}: {dt:6.2f} ms  ({gb / (dt / 1e3):5.0f} GB/s "
              f"effective on the x+dy bytes)")


if __name__ == "__main__":
    main()
