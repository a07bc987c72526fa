"""On-device photometric augmentation.

Reference: dataset/dataset_util.py:19-115 — per-image augmentation on the
host tf.data pipeline.  TPU-native re-design: the whole batch is augmented
on-device by pure jnp ops inside the jitted train step, where the VPU does
the elementwise work for free and the host stays dedicated to JPEG decode.

Parity with the reference:
  * equal-probability {salt-pepper, gaussian, none} noise (:46-55);
    gaussian stddev 0.01 (:30-34); salt-pepper via two Bernoulli masks —
    p=0.01 select, p=0.5 salt-vs-pepper (:36-43)
  * brightness/saturation/contrast applied in one of 4 random orders
    (3 permutations + identity) via lax.switch (:57-104)
  * hyperparameters identical (:22-27); final clip to [0,1] (:103)
  * geometric augs deliberately absent — random crop breaks anchor priors
    (dataset_util.py header note :5-14)

Note the reference applies saturation to BGR images as if RGB
(augmentation runs after the RGB->BGR flip, file_util.py:59); we replicate
by applying the HSV transform to whatever channel order arrives.
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


def _rgb_to_hsv(img):
    r, g, b = img[..., 0], img[..., 1], img[..., 2]
    mx = jnp.max(img, axis=-1)
    mn = jnp.min(img, axis=-1)
    diff = mx - mn
    safe = jnp.where(diff > 0, diff, 1.0)
    h = jnp.where(
        mx == r, (g - b) / safe % 6.0,
        jnp.where(mx == g, (b - r) / safe + 2.0, (r - g) / safe + 4.0))
    h = jnp.where(diff > 0, h / 6.0, 0.0)
    s = jnp.where(mx > 0, diff / jnp.where(mx > 0, mx, 1.0), 0.0)
    return h, s, mx


def _hsv_to_rgb(h, s, v):
    h6 = h * 6.0
    i = jnp.floor(h6)
    f = h6 - i
    p = v * (1.0 - s)
    q = v * (1.0 - s * f)
    t = v * (1.0 - s * (1.0 - f))
    i = i.astype(jnp.int32) % 6
    r = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
                   [v, q, p, p, t, v])
    g = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
                   [t, v, v, q, p, p])
    b = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
                   [p, p, t, v, v, q])
    return jnp.stack([r, g, b], axis=-1)


def _random_brightness(rng, img):
    """Additive uniform delta (tf.image.random_brightness,
    dataset_util.py:60)."""
    delta = jax.random.uniform(rng, (), minval=-RANDOM_BRIGHTNESS,
                               maxval=RANDOM_BRIGHTNESS)
    return img + delta


def _random_saturation(rng, img):
    """HSV saturation scale in [0.9, 1.1] (dataset_util.py:61-62)."""
    factor = jax.random.uniform(rng, (), minval=RANDOM_LOW_SATURATION,
                                maxval=RANDOM_UP_SATURATION)
    h, s, v = _rgb_to_hsv(jnp.clip(img, 0.0, 1.0))
    return _hsv_to_rgb(h, jnp.clip(s * factor, 0.0, 1.0), v)


def _random_contrast(rng, img):
    """Per-channel contrast about the spatial mean in [0.9, 1.1]
    (tf.image.random_contrast, dataset_util.py:63-64)."""
    factor = jax.random.uniform(rng, (), minval=RANDOM_LOW_CONTRAST,
                                maxval=RANDOM_UP_CONTRAST)
    mean = jnp.mean(img, axis=(0, 1), keepdims=True)
    return (img - mean) * factor + mean


def _add_gauss_noise(rng, img):
    """(dataset_util.py:30-34)"""
    return img + RANDOM_NORMAL * jax.random.normal(rng, img.shape)


def _add_salt_pepper_noise(rng, img):
    """(dataset_util.py:36-43)"""
    r1, r2 = jax.random.split(rng)
    shp = img.shape[:-1]
    sel = jax.random.bernoulli(r1, RANDOM_NORMAL, shp).astype(img.dtype)
    salt = jax.random.bernoulli(r2, 0.5, shp).astype(img.dtype)
    return img * (1.0 - sel)[..., None] + (salt * sel)[..., None]


def _augment_one(rng, img):
    """Single-image augmentation (dataset_util.py:88-104)."""
    k_noise, k_nt, k_order, k1, k2, k3 = jax.random.split(rng, 6)
    noise_type = jax.random.randint(k_nt, (), 0, 3)
    img = jax.lax.switch(noise_type, [
        lambda im: _add_salt_pepper_noise(k_noise, im),
        lambda im: _add_gauss_noise(k_noise, im),
        lambda im: im,
    ], img)

    def order0(im):  # brightness, saturation, contrast (:58-65)
        return _random_contrast(k3, _random_saturation(
            k2, _random_brightness(k1, im)))

    def order1(im):  # saturation, brightness, contrast (:67-75)
        return _random_contrast(k3, _random_brightness(
            k2, _random_saturation(k1, im)))

    def order2(im):  # saturation, contrast, brightness (:77-85)
        return _random_brightness(k3, _random_contrast(
            k2, _random_saturation(k1, im)))

    ordering = jax.random.randint(k_order, (), 0, 4)
    img = jax.lax.switch(ordering, [order0, order1, order2, lambda im: im],
                         img)
    return jnp.clip(img, 0.0, 1.0)


def augment_batch(rng, images):
    """Augment a (N, H, W, 3) float batch with independent per-image
    randomness (the map-after-repeat semantics of dataset_util.py:106-115)."""
    rngs = jax.random.split(rng, images.shape[0])
    return jax.vmap(_augment_one)(rngs, images)
