"""Probe: 8-bit STORAGE of early-module activation streams in training.

Round-3 verdict item 2: the m1 (64ch @ 104^2) chain is bandwidth-bound
— its conv fusions sit on the serial-phase bound flops/peak +
bytes/peak (tools/roofline.py, round 4) and the bf16[128,104,104,64]
stream alone carries ~9.8 GB/step of the 28 GB total.  int8 COMPUTE
was measured useless (probe_int8_dot2.py: no 2x MXU rate), but STORAGE
byte-halving is orthogonal: keep bf16 compute/params, store the
inter-block activation tensors as 8-bit (fp8-e4m3 or scaled int8),
dequantize on read inside the consumer fusions.

This probe answers, standalone at the m1 shape:
  (a) does XLA lower f8e4m3/int8 converts on this backend at all;
  (b) does the 8-bit tensor actually MATERIALIZE in HBM (the down-
      convert must ride the producer fusion's output and the
      up-convert the consumers' input — if XLA materializes the bf16
      instead, storage quantization saves nothing);
  (c) net ms for a K-block conv+bn+relu chain fwd+bwd, A/B.

Gradients stay bf16 end-to-end (straight-through custom_vjp).

MEASURED (b128, 6 blocks, 20 steps, v5e) — REJECTED, a wash both ways:

  | storage | ms/step | vs bf16 |
  |---|---|---|
  | bf16    | 19.66 | — |
  | f8e4m3  | 19.82 | 0.991x |
  | int8    | 19.85 | 0.990x |

Both 8-bit types DO lower and DO materialize (per-op trace: the
forward-conv and dgrad fusions' reads drop 0.53 -> 0.27-0.35 GB), so
(a)/(b) hold — the loss is mechanistic, not a lowering failure:

  1. The m1 conv fusions are pinned at the Co=64 MXU ceiling, not at
     the HBM wall.  With 64 output channels only half the 128 MXU
     lanes fill, so the effective compute peak is ~98.5 TF/s — and
     the fusions run 94 TF/s = ~95% of THAT.  Their wall time did not
     move when their bytes halved (1.095 -> 1.081 ms): the DMA time
     saved hides entirely under the compute phase.  (The serial-phase
     "sum bound" fit at bf16 was a coincidence: t_flop_eff(1.03ms)
     vs t_flop(0.51)+t_hbm(0.53) are indistinguishable at this shape;
     the byte-halving A/B is exactly the experiment that separates
     them.)
  2. XLA does not fold the down-convert into the BN-apply pass it
     already runs: five separate relu+convert materialization passes
     appear (maximum_convert_fusion, ~0.24 ms each, +1.2 ms) — same
     failure mode as the round-3 fused-augment kernel.

Conclusion: 8-bit activation storage is NOT a training lever on this
backend; the bandwidth-bound-looking early modules are actually
compute-bound at their lane-fill-limited effective peak.  This also
retires the round-3 verdict's open int8-storage question (the 1.30x
inference win on m1 shapes came from int8 COMPUTE convs replacing the
whole conv, eval-only — ops/quantize.py keeps that path).

Usage: python experiments/probe_act8.py [batch] [blocks] [steps]
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
    C = 64

    def conv(x, w):
        return jax.lax.conv_general_dilated(
            x, w.astype(x.dtype), (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    def block(x, w, g, b):
        # bf16-I/O BN with f32 stats, like models/layers.py
        y = conv(x, w)
        yf = y.astype(jnp.float32)
        mu = jnp.mean(yf, (0, 1, 2))
        var = jnp.mean(jnp.square(yf), (0, 1, 2)) - jnp.square(mu)
        scale = (jax.lax.rsqrt(var + 1e-5) * g).astype(jnp.bfloat16)
        shift = (b - mu * jax.lax.rsqrt(var + 1e-5) * g
                 ).astype(jnp.bfloat16)
        return jax.nn.relu(y * scale + shift)

    def make_store8(mode):
        @jax.custom_vjp
        def store8(x):
            if mode == "f8":
                return x.astype(jnp.float8_e4m3fn).astype(jnp.bfloat16)
            # int8, static scale for post-BN+relu range [0, 8)
            s = jnp.bfloat16(8.0 / 127.0)
            q = jnp.clip(jnp.round(x.astype(jnp.float32) / s.astype(
                jnp.float32)), -127, 127).astype(jnp.int8)
            return q.astype(jnp.bfloat16) * s

        def _fwd(x):
            return store8(x), None

        def _bwd(_, dy):  # straight-through: gradients stay bf16
            return (dy,)

        store8.defvjp(_fwd, _bwd)
        return store8

    def make_loss(mode):
        store8 = None if mode == "bf16" else make_store8(mode)

        def loss(params, x):
            for w, g, b in params:
                x = block(x, w, g, b)
                if store8 is not None:
                    x = store8(x)
            return jnp.sum(x.astype(jnp.float32))
        return loss

    rng = np.random.RandomState(0)
    params = [(jnp.asarray(rng.randn(3, 3, C, C).astype(np.float32))
               * 0.1,
               jnp.ones((C,), jnp.float32),
               jnp.zeros((C,), jnp.float32)) for _ in range(blocks)]
    x = jnp.asarray(rng.rand(batch, H, W, C).astype(np.float32) * 2
                    ).astype(jnp.bfloat16)

    results = {}
    for mode in ("bf16", "f8", "int8"):
        loss = make_loss(mode)

        @jax.jit
        def step(params, x):
            l, g = jax.value_and_grad(loss)(params, x)
            return l, g

        try:
            l, g = step(params, x)
            float(l)
        except Exception as e:
            print(f"{mode}: DOES NOT COMPILE/RUN: {type(e).__name__}: "
                  f"{str(e)[:200]}")
            continue

        # (b) materialization check: the 8-bit type must appear as a
        # materialized buffer in the optimized HLO (fusion result or
        # operand at the entry computation level)
        txt = jax.jit(step).lower(params, x).compile().as_text()
        n8 = txt.count("f8e4m3fn[" if mode == "f8" else "s8[")
        big8 = sum(1 for ln in txt.splitlines()
                   if (f"f8e4m3fn[{batch}" if mode == "f8"
                       else f"s8[{batch}") in ln and "fusion" in ln)

        for _ in range(2):
            l, g = step(params, x)
        float(l)
        t0 = time.perf_counter()
        for _ in range(steps):
            l, g = step(params, x)
        float(l)
        dt = (time.perf_counter() - t0) / steps * 1e3
        results[mode] = dt
        print(f"{mode:5}: {dt:7.2f} ms/step  loss={float(l):.1f}  "
              f"8bit-type mentions in HLO: {n8} "
              f"(big-tensor fusion lines: {big8})")

    if "bf16" in results:
        for m in ("f8", "int8"):
            if m in results:
                print(f"{m} vs bf16: {results['bf16'] / results[m]:.3f}x")


if __name__ == "__main__":
    main()
