"""Per-op TPU microbenchmark: winograd kernels vs XLA direct conv at the
flagship model's eligible shapes (b128).

Times each op standalone by chaining ITERS applications inside one jit
(per-dispatch overhead through the axon relay is ~3ms; sync is a scalar
fetch).  Reports ms/op and the implied HBM-bandwidth utilization of the
op's mandatory streams, to locate Mosaic streaming overhead.

Usage: python experiments/bench_winograd_ops.py [batch] [iters]
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from yolov3_tensorflow_tpu.ops import winograd as W  # noqa: E402

HBM_GBPS = 819.0  # v5e


def timeit(fn, *args, iters=1):
    out = fn(*args)
    _ = float(jnp.sum(out[0] if isinstance(out, tuple) else out))
    t0 = time.perf_counter()
    out = fn(*args)
    s = float(jnp.sum(out[0] if isinstance(out, tuple) else out))
    dt = (time.perf_counter() - t0)
    return dt, s


def chain(op, n):
    """jit a loop of n dependent applications of op (same-shape in/out)."""
    @jax.jit
    def run(x, *rest):
        def body(i, x):
            y = op(x, *rest)
            y0 = y[0] if isinstance(y, tuple) else y
            return (0.999 * y0 + 0.001 * x).astype(x.dtype)
        return jax.lax.fori_loop(0, n, body, x)
    return run


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    shapes = [
        (batch, 104, 104, 64, 64),
        (batch, 52, 52, 128, 128),
        (batch, 26, 26, 256, 256),
        (batch, 13, 13, 512, 512),
    ]
    rng = np.random.RandomState(0)
    print(f"batch={batch} iters={iters} backend={jax.default_backend()}")
    header = (f"{'shape':>22s} {'op':>14s} {'ms/op':>8s} "
              f"{'GB/op':>6s} {'GB/s':>7s} {'%HBM':>5s}")
    print(header)

    for (N, H, Wd, C, Co) in shapes:
        x = jnp.asarray(rng.randn(N, H, Wd, C).astype(np.float32) * 0.1,
                        jnp.bfloat16)
        w = jnp.asarray(rng.randn(3, 3, C, Co).astype(np.float32) * 0.05,
                        jnp.bfloat16)
        inv = jnp.asarray(rng.rand(C).astype(np.float32) + 0.5)
        shift = jnp.asarray(rng.randn(C).astype(np.float32) * 0.1)
        nbytes = N * H * Wd * C * 2  # one pass over the activation
        tag = f"{N}x{H}x{Wd}x{C}->{Co}"
        wchunk = W.pick_wchunk(Wd, C, Co, N)

        def report(name, dt):
            ms = dt / iters * 1e3
            gb = 2 * nbytes / 1e9  # read + write, the mandatory streams
            gbs = gb / (ms / 1e3)
            print(f"{tag:>22s} {name:>14s} {ms:8.3f} {gb:6.2f} "
                  f"{gbs:7.0f} {100 * gbs / HBM_GBPS:5.0f}")

        def xla_conv(x):
            return jax.lax.conv_general_dilated(
                x, w, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.bfloat16)

        dt, _ = timeit(chain(xla_conv, iters), x)
        report("xla", dt)

        dt, _ = timeit(chain(lambda x: W.conv3x3(x, w), iters), x)
        report(f"win(wb={wchunk})", dt)

        dt, _ = timeit(chain(lambda x: W.conv3x3_stats(x, w), iters), x)
        report("win+stats", dt)

        dt, _ = timeit(chain(
            lambda x: W.conv3x3_bn_act_stats(x, w, inv, shift), iters), x)
        report("win+bn+stats", dt)

        # gradient-mask bwd kernel (the dx conv of bn_act_stats)
        scal = jnp.stack([inv, shift]).astype(jnp.float32)[:, :, None]
        u_r = W._rot_u(w)

        def gmask_bwd(dy):
            out, _ = W.winograd_hwcn(W._hwcn(dy), u_r, scal=scal,
                                     cmask=W._hwcn(x))
            return W._nhwc(out)

        dt, _ = timeit(chain(gmask_bwd, iters), x)
        report("win-bwd-gmask", dt)


if __name__ == "__main__":
    main()
