"""Pallas channel-major conv: exactness vs lax.conv (interpret mode on CPU).

The kernel is a correctness-proven building block; it is not currently
wired into the model (XLA's conv emitter is faster on these shapes — see
PERF.md)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental import pallas as pl

import pallas_conv as pc


@pytest.fixture(autouse=True)
def _interpret(monkeypatch):
    orig = pl.pallas_call
    monkeypatch.setattr(
        pl, "pallas_call",
        lambda *a, **k: orig(*a, **{**k, "interpret": True}))


def _ref_conv(x, w):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME",
        dimension_numbers=("NCHW", "OIHW", "NCHW"))


@pytest.mark.parametrize("n,c,h,w,co", [
    (2, 8, 16, 16, 8),
    (1, 16, 8, 24, 8),   # rectangular, cin != cout
    (2, 8, 16, 126, 8),  # max supported width
])
def test_forward_matches_lax(n, c, h, w, co):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(n, c, h, w).astype(np.float32))
    wt = jnp.asarray(0.3 * rng.randn(co, c, 3, 3).astype(np.float32))
    y = pc.conv3x3_cmajor(x, wt)
    np.testing.assert_allclose(np.asarray(y), np.asarray(_ref_conv(x, wt)),
                               atol=1e-4)


def test_gradients_match_lax():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(2, 8, 16, 16).astype(np.float32))
    wt = jnp.asarray(0.3 * rng.randn(8, 8, 3, 3).astype(np.float32))

    def lp(x, w):
        return jnp.sum(jnp.sin(pc.conv3x3_cmajor(x, w)))

    def lr(x, w):
        return jnp.sum(jnp.sin(_ref_conv(x, w)))

    gp = jax.grad(lp, argnums=(0, 1))(x, wt)
    gr = jax.grad(lr, argnums=(0, 1))(x, wt)
    np.testing.assert_allclose(np.asarray(gp[0]), np.asarray(gr[0]),
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(gp[1]), np.asarray(gr[1]),
                               atol=1e-4)


def test_nhwc_wrapper():
    rng = np.random.RandomState(2)
    xh = jnp.asarray(rng.randn(1, 16, 16, 8).astype(np.float32))
    wh = jnp.asarray(0.3 * rng.randn(3, 3, 8, 8).astype(np.float32))
    y = pc.conv3x3_nhwc_via_cmajor(xh, wh)
    ref = jax.lax.conv_general_dilated(
        xh, wh, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref), atol=1e-4)
