"""Probe v2: clean MXU-rate measurement, int8 vs bf16 (no requant
pass between matmuls — the v1 chain's casts polluted both paths).
Each scan step perturbs the lhs with one cheap elementwise op (so XLA
cannot hoist the dot) and consumes only a row of the product (so the
only bytes in the loop are lhs read + psum of the row).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python -u experiments/probe_int8_dot2.py
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
            jax.random.randint(k1, (M, K), -64, 65, jnp.int8),
            jax.random.randint(k2, (K, N), -64, 65, jnp.int8)))
    else:
        mk = jax.jit(lambda k1, k2: (
            jax.random.normal(k1, (M, K), dtype),
            jax.random.normal(k2, (K, N), dtype)))
    a, b = mk(*jax.random.split(jax.random.PRNGKey(0)))

    def step(a, b):
        def body(acc, i):
            if dtype == jnp.int8:
                ai = a ^ i.astype(jnp.int8)
            else:
                ai = a + i.astype(dtype)
            y = lax.dot(ai, b, preferred_element_type=out_dtype)
            return acc + y[0].astype(jnp.float32), ()
        acc, _ = lax.scan(body, jnp.zeros((N,), jnp.float32),
                          jnp.arange(STEPS))
        return jnp.sum(acc)

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
    print(f"devices: {jax.devices()}  ({M}x{K}x{N}, {STEPS} perturbed)")
    t_bf = bench("bf16->f32  ", jnp.bfloat16, jnp.float32)
    try:
        t_i8 = bench("int8->int32", jnp.int8, jnp.int32)
        print(f"int8 speedup vs bf16: {t_bf / t_i8:.2f}x")
    except Exception as e:  # noqa: BLE001
        print("int8 dot FAILED:", type(e).__name__, str(e)[:200])
