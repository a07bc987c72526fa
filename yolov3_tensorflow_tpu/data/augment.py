"""On-device photometric augmentation.

Reference: dataset/dataset_util.py:19-115 — per-image augmentation on the
host tf.data pipeline.  TPU-native re-design: the whole batch is augmented
on-device by pure jnp ops inside the jitted train step, where the VPU does
the elementwise work and the host stays dedicated to JPEG decode.

Parity with the reference:
  * equal-probability {salt-pepper, gaussian, none} noise (:46-55);
    gaussian stddev 0.01 (:30-34); salt-pepper via two Bernoulli masks —
    p=0.01 select, p=0.5 salt-vs-pepper (:36-43)
  * brightness/saturation/contrast applied in one of 4 random orders
    (3 permutations + identity) (:57-104)
  * hyperparameters identical (:22-27); final clip to [0,1] (:103)
  * geometric augs deliberately absent — random crop breaks anchor priors
    (dataset_util.py header note :5-14)

Performance note (why there is no lax.switch): under vmap, a switch runs
EVERY branch for every image and selects — 4 orderings x 3 color ops each.
Instead we use the exact identity ``contrast(x + b) = contrast(x) + b``
(contrast recenters about the mean of its input, absorbing any shift), which
collapses the three reference orderings to ONE canonical pipeline:

    order 0 (b,s,c): contrast(sat(x + b))
    order 1 (s,b,c): contrast(sat(x) + b) = contrast(sat(x)) + b
    order 2 (s,c,b): contrast(sat(x)) + b          (same as order 1)

so y = contrast_c(sat_s(x + pre_b)) + post_b with per-image scalars:
pre_b = b*[order==0], post_b = b*[order in {1,2}], and s=c=1, b=0 for
order 3 (identity).  One saturation pass, one contrast pass, no branches.
Noise is likewise expressed with per-image selector masks.

The reference applies saturation to BGR images as if RGB (augmentation runs
after the RGB->BGR flip, file_util.py:59); the HSV transform is applied to
whatever channel order arrives, replicating that.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

RANDOM_BRIGHTNESS = 30.0 / 255.0
RANDOM_LOW_CONTRAST = 0.9
RANDOM_UP_CONTRAST = 1.1
RANDOM_LOW_SATURATION = 0.9
RANDOM_UP_SATURATION = 1.1
RANDOM_NORMAL = 0.01  # noise scale / salt-pepper density


def _saturate(img, factor):
    """Per-image HSV saturation scale; factor (N,1,1).

    Closed form of the HSV round-trip: with V = max(rgb) fixed and hue
    fixed, every channel is affine in S — rgb = V*(1 - S*k_c) — so scaling
    S by f is exactly ``rgb' = V + f*(rgb - V)``.  This replaces ~15
    elementwise passes of an explicit RGB<->HSV conversion with 2 reduces
    + 1 lerp.  Out-of-gamut inputs (brightness/noise push pixels past
    [0,1]; the reference clips only ONCE at the END of the chain,
    dataset_util.py:103) follow tf's AdjustSaturationOp exactly:
    s = chroma/V for V > 0 (so s > 1 when min < 0) else s = 0 (the pixel
    collapses to uniform V), and s' = min(f*s, 1) — the cap corresponds
    to capping the per-pixel factor at V/chroma.  Pinned per-pixel vs
    tf.image.adjust_saturation on out-of-gamut inputs in
    tests/test_parity.py."""
    v = jnp.max(img, axis=-1, keepdims=True)
    mn = jnp.min(img, axis=-1, keepdims=True)
    chroma = v - mn
    f = factor[..., None]
    cap = v / jnp.where(chroma > 0, chroma, 1.0)
    f_px = jnp.where(f * chroma > v, cap, f)
    f_px = jnp.where(v > 0, f_px, 0.0)
    return v + f_px * (img - v)


def _scalars(rng, n, dtype):
    """The per-image random scalars + the unconsumed noise keys.  Shared
    by both noise backends so the scalar stream is identical whichever
    generates the per-element noise."""
    (k_nt, k_ord, k_b, k_s, k_c, k_gauss, k_sel, k_salt) = \
        jax.random.split(rng, 8)
    noise_type = jax.random.randint(k_nt, (n,), 0, 3)  # 0 sp, 1 gauss, 2 no
    order = jax.random.randint(k_ord, (n,), 0, 4)
    b = jax.random.uniform(k_b, (n,), minval=-RANDOM_BRIGHTNESS,
                           maxval=RANDOM_BRIGHTNESS)
    s = jax.random.uniform(k_s, (n,), minval=RANDOM_LOW_SATURATION,
                           maxval=RANDOM_UP_SATURATION)
    c = jax.random.uniform(k_c, (n,), minval=RANDOM_LOW_CONTRAST,
                           maxval=RANDOM_UP_CONTRAST)
    do_color = order < 3
    color = dict(
        s_eff=jnp.where(do_color, s, 1.0).astype(dtype)[:, None, None],
        c_eff=jnp.where(do_color, c, 1.0).astype(dtype)[
            :, None, None, None],
        pre_b=jnp.where(do_color & (order == 0), b, 0.0).astype(dtype)[
            :, None, None, None],
        post_b=jnp.where(do_color & (order != 0), b, 0.0).astype(dtype)[
            :, None, None, None])
    return noise_type, color, (k_gauss, k_sel, k_salt)


def _color(x, color):
    """brightness/saturation/contrast in the canonical collapsed order
    (header note above); x already noised, same dtype as the scalars."""
    dtype = x.dtype
    x = x + color["pre_b"]
    x = _saturate(x, color["s_eff"])
    # per-channel spatial mean: accumulate in fp32 even on a bf16 batch
    # (XLA folds the convert into the reduction — no extra pass)
    mean = jnp.mean(x.astype(jnp.float32), axis=(1, 2),
                    keepdims=True).astype(dtype)
    x = (x - mean) * color["c_eff"] + mean + color["post_b"]
    return jnp.clip(x, 0.0, 1.0)


def augment_batch(rng, images):
    """Augment a (N, H, W, 3) float batch; independent per-image randomness
    (the map-after-repeat semantics of dataset_util.py:106-115)."""
    n = images.shape[0]
    dtype = images.dtype
    noise_type, color, (k_gauss, k_sel, k_salt) = _scalars(rng, n, dtype)

    # ------------------------------------------------------------ noise --
    gauss_on = (noise_type == 1).astype(dtype)[:, None, None, None]
    x = images + gauss_on * RANDOM_NORMAL * jax.random.normal(
        k_gauss, images.shape, dtype)
    # salt-pepper byte diet (round-5): ONE u32 field per pixel yields
    # both masks — sel = u < round(p * 2^32) (p exact to 1e-11 of the
    # reference's bernoulli(0.01), dataset_util.py:36-43) and salt =
    # bit 0 (exactly Bernoulli(0.5); independent of sel to ~1e-8 —
    # only read where sel fires).  Replaces two bernoulli draws:
    # halves the mask threefry work + HBM round-trips.  The bit-stream
    # differs from the two-draw form (distributions identical), same
    # contract latitude the fused backend already uses.
    u = jax.random.bits(k_sel, images.shape[:3], dtype=jnp.uint32)
    sel = (u < int(round(RANDOM_NORMAL * 2 ** 32))).astype(dtype)
    salt = (u & 1).astype(dtype)
    sp_on = (noise_type == 0).astype(dtype)[:, None, None]
    sel_eff = (sel * sp_on)[..., None]
    x = x * (1.0 - sel_eff) + (salt[..., None] * sel_eff)

    return _color(x, color)


def mixup_batch(rng, images, labels, alpha):
    """Detection mixup (the reference's unchecked roadmap item,
    README.md:131; Zhang et al. 2019, "Bag of Freebies for Training
    Object Detection Neural Networks").

    Each image is blended with a partner drawn by a batch permutation
    using a per-image ``lam ~ Beta(alpha, alpha)``; the labels become the
    UNION of both images' boxes — static shape (N, 2M, 5) for XLA — with
    per-box loss weights lam (own boxes) / 1-lam (partner's), consumed by
    ``YOLOv3Loss.__call__(..., box_weights=)``.  -1 padding rows pass
    through and stay masked by ``valid_mask``.
    """
    n, m = labels.shape[0], labels.shape[1]
    k_perm, k_lam = jax.random.split(rng)
    perm = jax.random.permutation(k_perm, n)
    lam = jax.random.beta(k_lam, alpha, alpha, (n,), jnp.float32)
    lam_img = lam.astype(images.dtype)[:, None, None, None]
    mixed = images * lam_img + images[perm] * (1.0 - lam_img)
    out_labels = jnp.concatenate([labels, labels[perm]], axis=1)
    # weights follow image i's blend: lam[i] for its own boxes, 1-lam[i]
    # for the partner content mixed INTO image i
    box_w = jnp.concatenate(
        [jnp.broadcast_to(lam[:, None], (n, m)),
         jnp.broadcast_to((1.0 - lam)[:, None], (n, m))], axis=1)
    return mixed, out_labels, box_w


def augment_batch_fused(rng, images_u8, dtype):
    """Fused-noise variant: the Pallas kernel (ops/augment_noise.py)
    does uint8-normalize + gaussian + salt-pepper in ONE pass with
    counter-based in-kernel randomness — no threefry HBM tensors; the
    color chain stays in XLA (cross-lane ops).  Same per-image scalar
    stream as :func:`augment_batch`; the per-element noise bit-stream
    differs (same distributions — see the kernel header)."""
    from ..ops.augment_noise import noisy_normalize
    n = images_u8.shape[0]
    dtype = jnp.dtype(dtype)
    noise_type, color, (k_gauss, _, _) = _scalars(rng, n, dtype)
    g_std = jnp.where(noise_type == 1, RANDOM_NORMAL, 0.0)
    p_eff = jnp.where(noise_type == 0, RANDOM_NORMAL, -1.0)
    # 64 bits of seed per image: a single 32-bit seed would birthday-
    # collide whole per-image noise fields after ~2^16 images
    seeds = jax.lax.bitcast_convert_type(
        jax.random.bits(k_gauss, (n, 2), jnp.uint32), jnp.int32)
    x = noisy_normalize(images_u8, seeds, g_std, p_eff, out_dtype=dtype)
    return _color(x, color)
