"""Probe: raw MXU rate for int8 x int8 -> int32 dots vs bf16 x bf16 ->
f32, compute-bound (large square matmuls chained via lax.scan so no
host round-trips).  v5e datasheet: 394 TOPS int8 vs 197 TFLOP/s bf16 —
if XLA exposes the 2x int8 MXU rate, a quantized conv backend is the
one lever past the bf16 FLOP wall (PERF.md round-2 physics).  If not,
int8 joins the rejected-experiments table.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python -u experiments/probe_int8_dot.py
"""
import sys
import time

import jax
import jax.numpy as jnp
from jax import lax

sys.path.insert(0, "/root/repo")

M = K = N = 4096
STEPS = 40


def bench(name, dtype, out_dtype):
    if dtype == jnp.int8:
        mk = jax.jit(lambda k1, k2: (
            jax.random.randint(k1, (M, K), -4, 5, jnp.int8),
            jax.random.randint(k2, (K, N), -4, 5, jnp.int8)))
    else:
        mk = jax.jit(lambda k1, k2: (
            jax.random.normal(k1, (M, K), dtype) * 0.1,
            jax.random.normal(k2, (K, N), dtype) * 0.1))
    a, b = mk(*jax.random.split(jax.random.PRNGKey(0)))

    def step(a, b):
        def body(c, _):
            y = lax.dot(c, b, preferred_element_type=out_dtype)
            # cheap requant keeping values tiny so int32 never overflows
            if dtype == jnp.int8:
                c2 = jnp.clip(y >> 6, -4, 4).astype(jnp.int8)
            else:
                c2 = (y * 0.01).astype(dtype)
            return c2, ()
        c, _ = lax.scan(body, a, None, length=STEPS)
        return jnp.sum(c.astype(jnp.float32))

    jf = jax.jit(step)
    float(jf(a, b))
    t0 = time.perf_counter()
    float(jf(a, b))
    dt = (time.perf_counter() - t0) / STEPS
    rate = 2 * M * K * N / dt / 1e12
    print(f"{name}: {dt*1e3:7.3f} ms/matmul  "
          f"{rate:7.1f} T{'OP' if dtype == jnp.int8 else 'FLOP'}/s")
    return dt


if __name__ == "__main__":
    print(f"devices: {jax.devices()}  ({M}x{K}x{N}, {STEPS} chained)")
    t_bf = bench("bf16->f32  ", jnp.bfloat16, jnp.float32)
    try:
        t_i8 = bench("int8->int32", jnp.int8, jnp.int32)
        print(f"int8 speedup vs bf16: {t_bf / t_i8:.2f}x")
    except Exception as e:  # noqa: BLE001
        print("int8 dot FAILED:", type(e).__name__, str(e)[:200])
