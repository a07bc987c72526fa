"""Probe: does XLA on this TPU lower int8 convolutions to the int8 MXU
path (v5e: 394.7 TOPS int8 vs 196.7 TFLOP/s bf16), and at what measured
speedup over bf16 on the flagship model's dominant conv shapes?

If int8 convs run ~2x bf16, a quantized-conv backend (AQT-style
fake-quant + int8 dot, forward and/or dgrad) is the only route past the
bf16 FLOP speed-of-light that caps bench.py at ~4,000 img/s
(PERF.md round-2 physics).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python experiments/probe_int8_conv.py
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

sys.path.insert(0, "/root/repo")

# (label, N, H, W, Cin, Cout, k, stride) — the flagship's hot convs at b128.
SHAPES = [
    ("m1 3x3 104^2 64->64", 128, 104, 104, 64, 64, 3, 1),
    ("m2 3x3 52^2 128->128", 128, 52, 52, 128, 128, 3, 1),
    ("m3 3x3 26^2 256->256", 128, 26, 26, 256, 256, 3, 1),
    ("m4 3x3 13^2 512->512", 128, 13, 13, 512, 512, 3, 1),
]

STEPS = 20


def bench(dtype, out_dtype, label, N, H, W, Ci, Co, k, s):
    # device-side data generation: the axon relay moves host arrays at
    # only ~7-25 MB/s (PERF.md), so never device_put big inputs here
    key = jax.random.PRNGKey(0)
    if dtype == jnp.int8:
        mk = jax.jit(lambda k1, k2: (
            jax.random.randint(k1, (N, H, W, Ci), -127, 128, jnp.int8),
            jax.random.randint(k2, (k, k, Ci, Co), -127, 128, jnp.int8)))
    else:
        mk = jax.jit(lambda k1, k2: (
            jax.random.normal(k1, (N, H, W, Ci), dtype),
            jax.random.normal(k2, (k, k, Ci, Co), dtype)))
    x, w = mk(*jax.random.split(key))

    def step(x, w):
        def body(c, _):
            y = lax.conv_general_dilated(
                c, w, (s, s), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=out_dtype)
            # re-quantize/cast back so the loop chains same-typed convs
            if dtype == jnp.int8:
                c2 = jnp.clip(y >> 7, -127, 127).astype(jnp.int8)
            else:
                c2 = y.astype(dtype)
            return c2, ()
        c, _ = lax.scan(body, x, None, length=STEPS)
        return jnp.sum(c.astype(jnp.float32))

    jf = jax.jit(step)
    r = float(jf(x, w))  # compile + run
    t0 = time.perf_counter()
    r = float(jf(x, w))
    dt = (time.perf_counter() - t0) / STEPS
    flops = 2 * N * (H // s) * (W // s) * Ci * Co * k * k
    eff = flops / dt / 1e12
    print(f"  {label}: {dt*1e3:7.3f} ms/conv  {eff:7.1f} T{'OP' if dtype==jnp.int8 else 'FLOP'}/s")
    return dt


if __name__ == "__main__":
    print(f"devices: {jax.devices()}")
    results = {}
    for name, dt_in, dt_out in [
        ("bf16", jnp.bfloat16, jnp.float32),
        ("int8->int32", jnp.int8, jnp.int32),
    ]:
        print(f"{name}:")
        for shp in SHAPES:
            try:
                t = bench(dt_in, dt_out, *shp)
                results[(name, shp[0])] = t
            except Exception as e:  # noqa: BLE001
                print(f"  {shp[0]}: FAILED {type(e).__name__}: {str(e)[:160]}")
    print("speedups int8 vs bf16:")
    for shp in SHAPES:
        a = results.get(("bf16", shp[0]))
        b = results.get(("int8->int32", shp[0]))
        if a and b:
            print(f"  {shp[0]}: {a/b:.2f}x")
