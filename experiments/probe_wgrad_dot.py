"""Probe: can Mosaic efficiently lower the winograd-wgrad contraction
dot_general([TW,C,N],[TW,Co,N], contracting ((0,2),(0,2))) -> [C,Co]?

Times a pallas kernel doing 16 such dots per grid step (the per-k-loop
wgrad load of the planned fused backward) against the MXU ideal.

Usage: python experiments/probe_wgrad_dot.py [C] [TW] [steps]
"""
import functools
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def kern(v_ref, m_ref, out_ref, *, K):
    s = pl.program_id(0)

    @pl.when(s == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    acc = jnp.zeros(out_ref.shape[1:], jnp.float32)
    TW = v_ref.shape[1]
    for k in range(K):
        for tw in range(TW):
            acc += jax.lax.dot_general(
                v_ref[k, tw], m_ref[k, tw],
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
    out_ref[0] += acc


def main():
    C = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    TW = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    steps = int(sys.argv[3]) if len(sys.argv) > 3 else 64
    K, N = 16, 128
    rng = np.random.RandomState(0)
    v = jnp.asarray(rng.randn(K, TW, C, N) * .1, jnp.bfloat16)
    m = jnp.asarray(rng.randn(K, TW, C, N) * .1, jnp.bfloat16)

    f = pl.pallas_call(
        functools.partial(kern, K=K),
        grid=(steps,),
        in_specs=[pl.BlockSpec((K, TW, C, N), lambda s: (0, 0, 0, 0),
                               memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec((1, C, C), lambda s: (0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, C, C), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )
    jf = jax.jit(f)
    out = jf(v, m)
    _ = float(jnp.sum(out))
    t0 = time.perf_counter()
    out = jf(v, m)
    _ = float(jnp.sum(out))
    dt = time.perf_counter() - t0
    macs = K * TW * C * C * N * steps
    tf = 2 * macs / dt / 1e12
    print(f"C={C} TW={TW} steps={steps}: {dt*1e3:.2f} ms, "
          f"{tf:.1f} TFLOP/s ({100*tf/197:.0f}% bf16 peak)")


if __name__ == "__main__":
    main()
