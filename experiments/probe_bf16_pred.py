"""Probe: do bf16 predicates (compare + select on bf16 operands) lower
and run correctly in Mosaic on this backend, and at what cost vs the
f32-cast form?  The stem argmax currently casts every row to f32 for
its compares (CLAUDE.md round-2 note: 'compare in f32'); if bf16
compares work, the forward drops ~3 full casts per row.

Usage: python experiments/probe_bf16_pred.py
"""
import functools
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")


def kern(x_ref, y_ref, o_ref, *, f32, reps):
    x, y = x_ref[...], y_ref[...]
    if f32:
        x = x.astype(jnp.float32)
        y = y.astype(jnp.float32)
    acc = jnp.zeros(x.shape, jnp.float32)
    for i in range(reps):
        m = (x > y + float(i) * 0.001)
        acc += jnp.where(m, 1.0, 0.0)
    o_ref[...] = acc


def run(f32, reps=8):
    S = (256, 128, 128)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(*S), jnp.bfloat16)
    y = jnp.asarray(rng.randn(*S), jnp.bfloat16)
    f = pl.pallas_call(
        functools.partial(kern, f32=f32, reps=reps),
        grid=(64,),
        in_specs=[pl.BlockSpec(S, lambda i: (0, 0, 0),
                               memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(S, lambda i: (0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(S, jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )
    jf = jax.jit(f)
    o = jf(x, y)
    ref = sum((np.asarray(x, np.float32)
               > np.asarray(y, np.float32) + i * 0.001)
              for i in range(reps)).astype(np.float32)
    ok = np.array_equal(np.asarray(o), ref)
    t0 = time.perf_counter()
    o = jf(x, y)
    _ = float(jnp.sum(o))
    dt = time.perf_counter() - t0
    print(f"f32={f32}: correct={ok}  {dt*1e3:.2f} ms "
          f"({64*reps} cmp+sel passes over 4M bf16 elems)")


if __name__ == "__main__":
    try:
        run(False)
    except Exception as e:  # noqa: BLE001
        print("bf16 predicates FAILED to lower:", type(e).__name__,
              str(e)[:200])
    run(True)
