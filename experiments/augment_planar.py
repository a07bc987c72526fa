"""PROTOTYPE: whole-augment Pallas kernel in planar layout (v2).

RETIRED by measurement (late round 3) without a TPU A/B of its own:
the v1 kernel's end-to-end TPU run measured the in-kernel counter-hash
PRNG + inverse-CDF at ~6 ms/step VPU cost (fused 1,769 vs xla 1,901
img/s at b128, PERF.md round-4 item 2).  v2 inherits that same PRNG
cost and could at best remove ~2.5 ms of XLA color/noise passes — it
cannot win on this VPU generation.  Kept for a hardware generation
with cheaper transcendental/VPU throughput or a native Mosaic PRNG
with a CPU-interpret rule.

Quarantined experiment (nothing in the package imports this).  The
shipped fused path (ops/augment_noise.py) covers normalize+noise and
leaves the color chain (brightness/saturation/contrast, ~2 XLA passes
over the batch) in XLA because per-pixel cross-channel max/min and the
per-channel spatial mean are cross-LANE ops in the interleaved
(H, W*3) layout.

The v2 idea: view each image as THREE CHANNEL PLANES (3, R, 128) with
R = H*W/128 (H*W is 128-divisible for every multi-scale size).  Then:
  * per-pixel max/min over channels = elementwise max/min of 3 plane
    arrays — no cross-lane movement at all;
  * the per-channel spatial mean = one scalar reduction per plane;
  * per-pixel (channel-shared) masks = the same counter hash as v1 on
    the plane-local flat index.
Everything in the whole augmentation chain becomes elementwise or a
plain scalar reduction — the entire reference pipeline (normalize ->
noise -> brightness -> saturation -> contrast -> clip,
dataset_util.py:19-115) in ONE kernel: read 66 MB uint8 (+ a one-pass
NHWC->planar u8 transpose in XLA, ~0.17 ms at b128), write 133 MB
bf16.  vs the v1+XLA-color split this saves the x_noised and x_sat
intermediate round-trips (~0.5-0.7 ms/step at b128).

Constraint: contrast needs the WHOLE-image mean of the saturated
image, so the grid block is a full image (no row chunking).  VMEM at
416^2: a (3, 1352, 128) f32 temporary is 2.1 MB; ~6-8 live arrays
fit the raised 100 MB scoped budget.  608^2 may not — gate per-shape.

Measure (TPU):  python experiments/augment_planar.py [batch]
  -> prints ms/step for {xla augment_batch, v1 fused+xla color,
     v2 planar kernel} on synthetic uint8 batches, plus max|diff| of
     the deterministic (noise-off) color path vs augment_batch in f32.
"""
from __future__ import annotations

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from yolov3_tensorflow_tpu.data.augment import (_scalars, augment_batch,
                                                augment_batch_fused)
from yolov3_tensorflow_tpu.ops.augment_noise import _mix, _ndtri, _u01

_VMEM_LIMIT = 128 * 1024 * 1024


def _kernel(seed_ref, scal_ref, img_ref, out_ref, *, R, HW, out_dtype):
    s0 = seed_ref[0, 0]
    s1 = seed_ref[0, 1]
    g_std = scal_ref[0, 0]
    p_eff = scal_ref[0, 1]
    pre_b = scal_ref[0, 2]
    post_b = scal_ref[0, 3]
    s_eff = scal_ref[0, 4]
    c_eff = scal_ref[0, 5]

    pix = jax.lax.broadcasted_iota(jnp.int32, (R, 128), 0) * 128 + \
        jax.lax.broadcasted_iota(jnp.int32, (R, 128), 1)
    # per-pixel (channel-shared) salt-pepper stream — same construction
    # as ops/augment_noise.py
    hp = _mix(_mix(_mix(pix) + s0) + s1)
    sel = _u01(hp) < p_eff
    salt = (hp & 1).astype(jnp.float32)

    planes = []
    for ch in range(3):
        x = img_ref[0, ch].astype(jnp.float32) * jnp.float32(1.0 / 255.0)
        # per-element gaussian: decorrelate channels via the counter
        # offset (ch * HW turns the plane index into the global one)
        hg = _mix(_mix(_mix(pix + ch * HW) + s0 + jnp.int32(0x68bc21eb))
                  + s1)
        x = x + g_std * _ndtri(_u01(hg))
        x = jnp.where(sel, salt, x)
        x = jnp.clip(x + pre_b, 0.0, 1.0)  # brightness + saturate's clip
        planes.append(x)

    # saturation (closed HSV form, data/augment.py _saturate): per-pixel
    # channel max/min are ELEMENTWISE across planes in this layout
    v = jnp.maximum(jnp.maximum(planes[0], planes[1]), planes[2])
    mn = jnp.minimum(jnp.minimum(planes[0], planes[1]), planes[2])
    chroma = v - mn
    cap = v / jnp.where(chroma > 0, chroma, 1.0)
    f_px = jnp.where(s_eff * chroma > v, cap, s_eff)

    inv_hw = jnp.float32(1.0 / HW)
    for ch in range(3):
        x = v + f_px * (planes[ch] - v)
        mean = jnp.sum(x) * inv_hw  # per-channel spatial mean (f32)
        x = (x - mean) * c_eff + mean + post_b
        out_ref[0, ch] = jnp.clip(x, 0.0, 1.0).astype(out_dtype)


def augment_planar(rng, images_u8, dtype=jnp.bfloat16, interpret=None):
    """Full-chain planar-kernel augment; same per-image scalar stream
    as augment_batch / augment_batch_fused."""
    n, H, W, C = images_u8.shape
    assert C == 3 and (H * W) % 128 == 0
    HW = H * W
    R = HW // 128
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    dtype = jnp.dtype(dtype)

    from yolov3_tensorflow_tpu.data.augment import RANDOM_NORMAL
    noise_type, color, (k_gauss, _, _) = _scalars(rng, n, jnp.float32)
    g_std = jnp.where(noise_type == 1, RANDOM_NORMAL, 0.0)
    p_eff = jnp.where(noise_type == 0, RANDOM_NORMAL, -1.0)
    seeds = jax.lax.bitcast_convert_type(
        jax.random.bits(k_gauss, (n, 2), jnp.uint32), jnp.int32)
    scal = jnp.stack([
        g_std, p_eff,
        color["pre_b"].reshape(n), color["post_b"].reshape(n),
        color["s_eff"].reshape(n), color["c_eff"].reshape(n)],
        axis=1).astype(jnp.float32)

    planar = jnp.transpose(images_u8, (0, 3, 1, 2)).reshape(n, 3, R, 128)
    kernel = functools.partial(_kernel, R=R, HW=HW, out_dtype=dtype)
    out = pl.pallas_call(
        kernel,
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, 2), lambda i: (i, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 6), lambda i: (i, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 3, R, 128), lambda i: (i, 0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 3, R, 128), lambda i: (i, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((n, 3, R, 128), dtype),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(seeds, scal, planar)
    return jnp.transpose(out.reshape(n, 3, H, W), (0, 2, 3, 1))


def _check_color_parity():
    """Noise-off images must match augment_batch's color math exactly
    (same scalar stream -> identical pre_b/s/c per image)."""
    rng = jax.random.key(11, impl="rbg")
    imgs = jnp.asarray(np.random.RandomState(0).randint(
        0, 256, (16, 32, 32, 3), np.uint8))
    ours = augment_planar(rng, imgs, dtype=jnp.float32)
    ref = augment_batch(rng, jnp.asarray(imgs, jnp.float32) / 255.0)
    noise_type, _, _ = _scalars(rng, 16, jnp.float32)
    quiet = np.asarray(noise_type) == 2
    d = np.abs(np.asarray(ours)[quiet] - np.asarray(ref)[quiet])
    return float(d.max()), int(quiet.sum())


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    err, nq = _check_color_parity()
    print(f"color parity (noise-off, {nq} images): max|diff| = {err:.2e}")

    rng = np.random.RandomState(0)
    imgs = jnp.asarray(rng.randint(0, 256, (batch, 416, 416, 3), np.uint8))
    key = jax.random.key(5, impl="rbg")

    variants = {
        "xla (augment_batch)": jax.jit(lambda k, u8: augment_batch(
            k, u8.astype(jnp.float32) * (1 / 255.0)).astype(jnp.bfloat16)),
        "v1 fused noise + xla color": jax.jit(
            lambda k, u8: augment_batch_fused(k, u8, jnp.bfloat16)),
        "v2 planar kernel": jax.jit(
            lambda k, u8: augment_planar(k, u8, jnp.bfloat16)),
    }
    for name, fn in variants.items():
        try:
            out = fn(key, imgs)
            _ = float(jnp.sum(out.astype(jnp.float32)))  # compile+sync
            t0 = time.perf_counter()
            for _ in range(20):
                out = fn(key, imgs)
            _ = float(jnp.sum(out.astype(jnp.float32)))
            dt = (time.perf_counter() - t0) / 20 * 1e3
            print(f"{name:32s} {dt:7.3f} ms/batch (b{batch})")
        except Exception as e:  # lowering failures are a result too
            print(f"{name:32s} FAILED: {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
