"""8-bit activation storage, take 2: the genuinely bandwidth-bound case.

probe_act8.py falsified 8-bit STORAGE for the flagship's m1 chain —
those convs turned out compute-pinned at the Co=64 lane-fill ceiling.
The round-4 roofline audit then measured mobilenet-v2 as the OPPOSITE
regime: 73.9 GB/step, 13% MXU, 76% HBM, conv fusions at 78-96% of
their HBM bounds (tools/roofline.py, /tmp/roofline_mobilenet.json) —
the inverted-residual EXPANSION streams (6x channel blowup) dominate.
If byte-halving pays anywhere on this hardware, it pays here.

This probe A/Bs a chain of production-shaped inverted-residual blocks
(104^2, 24ch bottleneck, expand 6 -> 144ch — the shapes carrying
2.4+ GB/step in the audit): bf16 everywhere vs f8e4m3 storage of the
two expanded activations + the block output (bf16 compute, straight-
through gradients).

MEASURED (b128, 6 blocks, 20 steps, v5e) — REJECTED, a wash here too:

  | storage | ms/step | vs bf16 |
  |---|---|---|
  | bf16    | 78.78 | — |
  | f8e4m3  | 79.34 | 0.993x |

Per-op traces (roofline harness) show WHY, and it is a different
mechanism than probe_act8.py's:
  1. Where f8 engages it truly wins: the depthwise forward/dgrad
     fusions drop 2.018 -> 1.555 ms (1.20 -> 1.00 GB, 593 -> 641
     GB/s).  Lowering and materialization both work.
  2. But the chain is DOMINATED by the depthwise WGRAD fusions
     (6 x 3.39 ms, 1.59 GB each at only 470 GB/s = 57% of HBM peak),
     and those carry NO f8 operand: XLA materializes a separate bf16
     copy of the expanded activation as the backward residual instead
     of re-reading the f8 tensor.  The biggest stream is exempt from
     the byte cut by the compiler's own residual choice.
  3. Total measured HBM bytes went UP (45.7 -> 47.4 GB/step): the
     extra convert passes and the duplicated bf16 residual more than
     cancel the forward savings.

Combined with probe_act8.py: 8-bit activation storage fails on this
backend in BOTH regimes — compute-pinned chains can't use the freed
DMA time, and bandwidth-bound chains keep their dominant (wgrad)
stream in bf16 by XLA's residual materialization.  Falsified for
training, full stop.

Side finding for PERF.md's backbone table: mobilenet-v2's wall is the
depthwise WGRAD emitter itself (57-72% of HBM peak on 1.2-1.6 GB
fusions) — a Pallas depthwise-wgrad kernel is the one lever this
audit leaves open (pure-VPU, no MXU dependency), not quantization.

Usage: python experiments/probe_act8_mnv2.py [batch] [blocks] [steps]
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    blocks = int(sys.argv[2]) if len(sys.argv) > 2 else 6
    steps = int(sys.argv[3]) if len(sys.argv) > 3 else 20
    H = W = 104
    C = 24
    E = 6 * C  # 144 expanded channels

    @jax.custom_vjp
    def s8(x):
        return x.astype(jnp.float8_e4m3fn).astype(jnp.bfloat16)

    def _f(x):
        return s8(x), None

    def _b(_, dy):
        return (dy,)

    s8.defvjp(_f, _b)

    def bn(y, g, b):
        yf = y.astype(jnp.float32)
        mu = jnp.mean(yf, (0, 1, 2))
        var = jnp.mean(jnp.square(yf), (0, 1, 2)) - jnp.square(mu)
        scale = (jax.lax.rsqrt(var + 1e-5) * g).astype(jnp.bfloat16)
        shift = (b - mu * jax.lax.rsqrt(var + 1e-5) * g
                 ).astype(jnp.bfloat16)
        return y * scale + shift

    def block(x, p, store):
        we, ge, be, wd, gd, bd, wl, gl, bl = p
        cast = s8 if store else (lambda t: t)
        # 1x1 expand -> BN -> relu6  (the 6x-blowup stream)
        y = jax.lax.conv_general_dilated(
            x, we.astype(x.dtype), (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        y = cast(jnp.clip(bn(y, ge, be), 0, 6))
        # 3x3 depthwise -> BN -> relu6
        y = jax.lax.conv_general_dilated(
            y, wd.astype(y.dtype), (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=E)
        y = cast(jnp.clip(bn(y, gd, bd), 0, 6))
        # 1x1 linear bottleneck + skip
        y = jax.lax.conv_general_dilated(
            y, wl.astype(y.dtype), (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        y = bn(y, gl, bl)
        return cast(x + y)

    rng = np.random.RandomState(0)

    def mk(*shape):
        return jnp.asarray(rng.randn(*shape).astype(np.float32) * 0.1)

    params = [(mk(1, 1, C, E), jnp.ones(E), jnp.zeros(E),
               mk(3, 3, 1, E), jnp.ones(E), jnp.zeros(E),
               mk(1, 1, E, C), jnp.ones(C), jnp.zeros(C))
              for _ in range(blocks)]
    x = jnp.asarray(rng.rand(batch, H, W, C).astype(np.float32)
                    ).astype(jnp.bfloat16)

    results = {}
    for mode in ("bf16", "f8"):
        store = mode == "f8"

        def loss(params, x):
            for p in params:
                x = block(x, p, store)
            return jnp.sum(x.astype(jnp.float32))

        @jax.jit
        def step(params, x):
            return jax.value_and_grad(loss)(params, x)

        l, g = step(params, x)
        float(l)
        t0 = time.perf_counter()
        for _ in range(steps):
            l, g = step(params, x)
        float(l)
        dt = (time.perf_counter() - t0) / steps * 1e3
        results[mode] = dt
        print(f"{mode:5}: {dt:7.2f} ms/step  loss={float(l):.1f}")
    print(f"f8 vs bf16: {results['bf16'] / results['f8']:.3f}x")


if __name__ == "__main__":
    main()
