"""Fused normalize + photometric-noise Pallas kernel (in-kernel PRNG).

Reference behavior being fused: the uint8 -> [0,1] image conversion
(reference dataset/file_util.py:58, ``tf.image.convert_image_dtype``)
followed by the equal-probability {salt-pepper, gaussian, none} noise
stage of the augmentation pipeline (reference dataset/dataset_util.py:
30-55 — gaussian stddev 0.01; salt-pepper: p=0.01 per-PIXEL select
mask shared across channels, p=0.5 salt-vs-pepper).

Why a kernel (PERF.md round-4 queue item 2): the XLA path materializes
the random tensors in HBM — a threefry pass writing a full-resolution
normal sample plus two bernoulli masks (~0.27 ms/step at b128) — and
then streams them back through the noise-apply loop fusion
(~0.85 ms).  This kernel reads the uint8 batch ONCE, generates all
randomness on-core, and writes the noised normalized batch once:

  * all randomness is COUNTER-BASED: an avalanche integer hash
    (murmur3-finalizer constants) of the global element/pixel index
    keyed by a per-image seed.  Gaussian draws hash the ELEMENT index
    and push the uniform through an inverse-normal-CDF rational
    approximation (Acklam); salt-pepper masks hash the PIXEL index
    (element // 3), so a pixel's three channel elements agree by
    construction even across grid-chunk boundaries, with no cross-lane
    data movement (gathers/strided reshapes do not lower in Mosaic —
    see CLAUDE.md round-2/3 lessons).  Counter hashing also makes the
    kernel bit-identical between the CPU interpret backend and real
    TPU (``pltpu.prng_*`` has no CPU interpret rule in this jax), so
    the test suite pins the exact production bit-stream.

The noise BIT-STREAM therefore differs from the XLA path (counter
hash vs threefry) while the DISTRIBUTIONS are identical: same gaussian
stddev, same per-pixel select/salt probabilities, same channel-shared
pixel granularity.  Distribution parity and the exact noise-free path
are pinned by tests/test_augment_noise.py.

Layout: the (N, H, W, 3) uint8 batch is viewed as (N, R, 128) with
R = H*W*3/128 — every multi-scale size (32k x 32k) gives H*W*3 =
3072*k^2, divisible by 128, so lanes are always fully packed (no
(.., 3)-minor tiles, which would waste 125/128 lanes and 42x VMEM).

The color stages (brightness/saturation/contrast) deliberately STAY
in XLA: per-pixel channel max/min and the per-channel spatial mean are
cross-lane operations in this layout, and XLA already fuses the color
chain into two passes (data/augment.py).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .partition import get_op_mesh, shard_map_nocheck

_VMEM_LIMIT = 100 * 1024 * 1024
# rows (of 128 lanes) per grid chunk: 2048*128*4B = 1 MiB per live f32
# array — a handful of temporaries stays well inside scoped VMEM while
# the DMA pipeline double-buffers the uint8 input across chunks
_MAX_ROWS = 2048


def _pick_rb(R: int) -> int:
    """Largest Mosaic-legal divisor chunk of R at or under _MAX_ROWS.

    Legal = divisible by 8 (the sublane tile) OR equal to R itself:
    Mosaic rejects any other sublane block size on real TPU (measured;
    the interpret backend does not run that check, so RB=2028 at
    416x416 passed CPU tests and failed on hardware).  R = 24*k^2 for
    every multi-scale size, so an 8-divisor <= 2048 always exists
    (8 * the largest divisor of 3k^2 under 256)."""
    if R <= _MAX_ROWS:
        return R
    for rb in range(_MAX_ROWS - _MAX_ROWS % 8, 7, -8):
        if R % rb == 0:
            return rb
    return R


def supported(shape) -> bool:
    n, h, w, c = shape
    return (h * w * c) % 128 == 0


def _ndtri(u):
    """Inverse normal CDF, Acklam's rational approximation (f32).

    Central region |u-0.5| <= 0.47575: rational in (u-0.5)^2; tails:
    rational in sqrt(-2 log(min(u, 1-u))).  Max |rel err| 1.15e-9 in
    f64; f32 rounding dominates here (~1e-6) — both invisible under a
    0.01-stddev noise draw.  Pinned vs jax.scipy.special.ndtri by
    tests/test_augment_noise.py."""
    u = u.astype(jnp.float32)
    # central: z = q * P(r)/Q(r), r = q^2
    q = u - 0.5
    r = q * q
    num = ((((-3.969683028665376e+01 * r + 2.209460984245205e+02) * r
             - 2.759285104469687e+02) * r + 1.383577518672690e+02) * r
           - 3.066479806614716e+01) * r + 2.506628277459239e+00
    den = ((((-5.447609879822406e+01 * r + 1.615858368580409e+02) * r
             - 1.556989798598866e+02) * r + 6.680131188771972e+01) * r
           - 1.328068155288572e+01) * r + 1.0
    z_central = q * num / den
    # lower tail on ut = min(u, 1-u): z = C(ql)/D(ql), ql = sqrt(-2 ln ut)
    ut = jnp.minimum(u, 1.0 - u)
    ql = jnp.sqrt(-2.0 * jnp.log(ut))
    cnum = ((((-7.784894002430293e-03 * ql - 3.223964580411365e-01) * ql
              - 2.400758277161838e+00) * ql - 2.549732539343734e+00) * ql
            + 4.374664141464968e+00) * ql + 2.938163982698783e+00
    cden = (((7.784695709041462e-03 * ql + 3.224671290700398e-01) * ql
             + 2.445134137142996e+00) * ql + 3.754408661907416e+00) * ql + 1.0
    z_tail = cnum / cden  # negative z of the LOWER tail
    z_tail = jnp.where(u > 0.5, -z_tail, z_tail)
    return jnp.where(jnp.abs(q) <= 0.47575, z_central, z_tail)


def _u01(bits):
    """int32 hash bits -> uniform in (0, 1): top 24 bits + half-step
    offset (min 2^-25, max 1 - 2^-25 — log-safe).  The logical shift
    leaves a non-negative int32, so no unsigned types appear — Mosaic
    has no uint32 -> f32 cast rule (measured on real TPU; the value
    stream is bit-identical to the previous uint32 form)."""
    b24 = jax.lax.shift_right_logical(bits, jnp.int32(8))
    return (b24.astype(jnp.float32) + 0.5) * jnp.float32(2.0 ** -24)


def _mix(h):
    """murmur3 finalizer — full-avalanche int32 hash (wrapping mul)."""
    h = h ^ jax.lax.shift_right_logical(h, 16)
    h = h * jnp.int32(-2048144789)          # 0x85ebca6b
    h = h ^ jax.lax.shift_right_logical(h, 13)
    h = h * jnp.int32(-1028477387)          # 0xc2b2ae35
    h = h ^ jax.lax.shift_right_logical(h, 16)
    return h


def _kernel(seed_ref, scal_ref, img_ref, out_ref, *, RB, out_dtype):
    """Grid step (n, c): rows c*RB .. c*RB+RB-1 of image n.

    seed_ref (N,2) int32 SMEM (two words of each image's 64-bit seed,
    both mixed into the hash); scal_ref (N,2) f32 SMEM = [g_std, p_eff]
    (g_std = 0.01 when this image draws gaussian noise else 0;
    p_eff = 0.01 when it draws salt-pepper else -1 = never).  Both ride
    SMEM WHOLE (block == array) and are indexed by program_id — Mosaic
    rejects sub-(8,128) block shapes even in SMEM (measured: the (1,2)
    per-image block form fails lowering on real TPU; interpret mode
    does not run that check)."""
    n = pl.program_id(0)
    c = pl.program_id(1)
    s0 = seed_ref[n, 0]
    s1 = seed_ref[n, 1]
    g_std = scal_ref[n, 0]
    p_eff = scal_ref[n, 1]

    # Mosaic has no direct uint8 -> f32 cast rule; hop through int32
    x = (img_ref[0].astype(jnp.int32).astype(jnp.float32)
         * jnp.float32(1.0 / 255.0))

    rows = jax.lax.broadcasted_iota(jnp.int32, (RB, 128), 0) + c * RB
    lanes = jax.lax.broadcasted_iota(jnp.int32, (RB, 128), 1)
    e = rows * 128 + lanes  # global element index (chunk-independent)

    # gaussian: per-ELEMENT counter hash -> uniform -> inverse CDF.
    # The 64-bit per-image seed (s0, s1) is ADDED between avalanche
    # rounds (xor would only permute one fixed value set across seeds;
    # a single 32-bit seed would birthday-collide whole noise fields
    # after ~2^16 images)
    hg = _mix(_mix(_mix(e) + s0 + jnp.int32(0x68bc21eb)) + s1)
    x = x + g_std * _ndtri(_u01(hg))

    # salt-pepper: per-PIXEL hash (a pixel's 3 elements share e // 3)
    h = _mix(_mix(_mix(e // 3) + s0) + s1)
    sel = _u01(h) < p_eff
    salt = (h & 1).astype(jnp.float32)
    x = jnp.where(sel, salt, x)

    out_ref[0] = x.astype(out_dtype)


def _invoke(images, seeds, scal, R, RB, out_dtype, interpret):
    N = images.shape[0]
    kernel = functools.partial(_kernel, RB=RB, out_dtype=out_dtype)
    return pl.pallas_call(
        kernel,
        grid=(N, R // RB),
        in_specs=[
            pl.BlockSpec((N, 2), lambda n, c: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((N, 2), lambda n, c: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, RB, 128), lambda n, c: (n, c, 0)),
        ],
        out_specs=pl.BlockSpec((1, RB, 128), lambda n, c: (n, c, 0)),
        out_shape=jax.ShapeDtypeStruct((N, R, 128), out_dtype),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(seeds, scal, images.reshape(N, R, 128))


def noisy_normalize(images, seeds, g_std, p_eff,
                    out_dtype=jnp.bfloat16, interpret=None):
    """uint8 (N, H, W, 3) -> noised normalized (N, H, W, 3) in one pass.

    seeds: (N, 2) int32 per-image 64-bit PRNG seeds; g_std / p_eff:
    (N,) f32 per-image gaussian stddev (0 = off) and salt-pepper select
    probability (negative = off).  Partitions over the registered op
    mesh's data axis (every operand is per-image)."""
    N, H, W, C = images.shape
    assert images.dtype == jnp.uint8, images.dtype
    assert seeds.shape == (N, 2), seeds.shape
    total = H * W * C
    assert total % 128 == 0, images.shape
    R = total // 128
    RB = _pick_rb(R)
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    scal = jnp.stack([g_std.astype(jnp.float32),
                      p_eff.astype(jnp.float32)], axis=1)
    seeds = seeds.astype(jnp.int32)

    invoke = functools.partial(_invoke, R=R, RB=RB, out_dtype=out_dtype,
                               interpret=interpret)
    ms = get_op_mesh()
    if ms is not None and N % ms[0].shape[ms[1]] == 0:
        mesh, axis = ms
        from jax.sharding import PartitionSpec as P
        spec = P(axis)
        invoke = shard_map_nocheck(invoke, mesh=mesh,
                                   in_specs=(spec, spec, spec),
                                   out_specs=spec)
    out = invoke(images, seeds, scal)
    return out.reshape(N, H, W, C)
