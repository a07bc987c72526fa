"""Fused stem BN+maxpool+relu: forward parity with the classic
composition and backward correctness (tie-free exact match vs autodiff;
gradient-mass conservation under ties).  Plus the pool-only variant
(max_pool_s2, resnet-18-v2's BN/act-free stem) with its -inf padding
semantics."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from yolov3_tensorflow_tpu.ops.stem_pool import (bn_pool_relu,
                                                 bn_pool_relu_eval,
                                                 max_pool_s2,
                                                 max_pool_s2_eval,
                                                 supported)


def classic(y, inv, shift):
    """relu(max_pool3x3s2(y*inv + shift)) on the [H,W,C,N] view, built
    from lax ops (the reference composition, layers.py classic path);
    pool runs in f32 so the reference is reverse-differentiable."""
    bn = (y.astype(jnp.bfloat16) * inv.astype(jnp.bfloat16)[None, None,
                                                            :, None]
          + shift.astype(jnp.bfloat16)[None, None, :, None])
    pooled = jax.lax.reduce_window(
        bn.astype(jnp.float32), -jnp.inf,
        jax.lax.max, (3, 3, 1, 1), (2, 2, 1, 1), "SAME")
    return jnp.maximum(pooled, 0.0)


def unique_input(H, W, C, N, seed=0):
    """bf16 tensor with all-distinct values (no pooling ties)."""
    rng = np.random.RandomState(seed)
    vals = (np.arange(H * W * C * N) - H * W * C * N / 2).astype(np.float32)
    rng.shuffle(vals)
    return jnp.asarray(vals.reshape(H, W, C, N) * 1e-3, jnp.bfloat16)


def test_supported():
    assert supported((208, 208, 64, 128))
    assert not supported((210, 208, 64, 128))  # H % 8 != 0


def test_forward_matches_classic():
    H, W, C, N = 16, 8, 8, 4
    y = unique_input(H, W, C, N)
    inv = jnp.asarray(np.random.RandomState(1).randn(C) * 0.5 + 1.0,
                      jnp.float32)
    shift = jnp.asarray(np.random.RandomState(2).randn(C) * 0.2,
                        jnp.float32)
    ref = classic(y, inv, shift).astype(jnp.float32)
    got = bn_pool_relu(y, inv, shift).astype(jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-2, rtol=2e-2)


def test_eval_forward_bit_equals_train_primal():
    """The code-free inference kernel (bn_pool_relu_eval) must produce
    the exact same pooled output as the train forward's primal."""
    H, W, C, N = 16, 8, 8, 4
    rng = np.random.RandomState(7)
    y = jnp.asarray(rng.randn(H, W, C, N).astype(np.float32),
                    jnp.bfloat16)
    inv = jnp.asarray(rng.rand(C).astype(np.float32) + 0.5)
    shift = jnp.asarray(rng.randn(C).astype(np.float32) * 0.2)
    train_p = bn_pool_relu(y, inv, shift)
    eval_p = bn_pool_relu_eval(y, inv, shift)
    assert np.array_equal(np.asarray(train_p, np.float32),
                          np.asarray(eval_p, np.float32))


def test_model_eval_stem_backend_parity():
    """Model-level inference with stem_backend='fused' (running-average
    BN scalars applied inside the kernel) matches the classic xla eval
    path on the same params/batch_stats."""
    from yolov3_tensorflow_tpu.models.resnet18 import ResNet18
    rng = np.random.RandomState(11)
    x = jnp.asarray(rng.rand(4, 32, 32, 3).astype(np.float32))
    heads = {}
    for backend in ("xla", "fused"):
        model = ResNet18(stem_backend=backend, dtype=jnp.bfloat16)
        variables = model.init(jax.random.PRNGKey(0), x, train=False)
        heads[backend] = model.apply(variables, x, train=False)
    for a, b in zip(heads["xla"], heads["fused"]):
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(b, np.float32),
                                   atol=3e-2, rtol=3e-2)


def test_mixnet_resnext_stem_backend_parity():
    """mixnet-18 and resnext-18 share the flagship's stem chain
    (conv_bn 3x3/2 -> maxpool -> relu) and, since round 4, engage the
    same fused Pallas stem via BasicBackbone.stem_pooled_nhwc — model
    outputs must match the classic path on the same params."""
    from yolov3_tensorflow_tpu.models.mixnet18 import MixNet18
    from yolov3_tensorflow_tpu.models.resnext18 import ResNeXt18
    rng = np.random.RandomState(12)
    x = jnp.asarray(rng.rand(4, 32, 32, 3).astype(np.float32))
    for cls in (MixNet18, ResNeXt18):
        heads = {}
        for backend in ("xla", "fused"):
            model = cls(stem_backend=backend, dtype=jnp.bfloat16)
            variables = model.init(jax.random.PRNGKey(0), x,
                                   train=False)
            heads[backend] = model.apply(variables, x, train=False)
        for a, b in zip(heads["xla"], heads["fused"]):
            np.testing.assert_allclose(np.asarray(a, np.float32),
                                       np.asarray(b, np.float32),
                                       atol=3e-2, rtol=3e-2)


def classic_pool(y):
    """maxpool_3x3_s2 on the [H,W,C,N] view (reference v2 stem
    composition, resnet18_v2.py:61-62): reduce_window with -inf
    padding — the pool-only kernel must reproduce this WITHOUT the
    relu that made 0-padding exact for the fused BN stem."""
    return jax.lax.reduce_window(
        y.astype(jnp.bfloat16).astype(jnp.float32), -jnp.inf,
        jax.lax.max, (3, 3, 1, 1), (2, 2, 1, 1), "SAME")


def test_pool_only_forward_matches_classic_negative_values():
    """ALL-NEGATIVE input: every edge window's max is negative, so any
    0-padding leak would surface immediately."""
    H, W, C, N = 16, 8, 8, 4
    y = -jnp.abs(unique_input(H, W, C, N, seed=5)) - jnp.asarray(
        1.0, jnp.bfloat16)
    ref = classic_pool(y)
    got = max_pool_s2(y).astype(jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-2, rtol=2e-2)
    assert float(jnp.max(got)) < 0.0  # no relu: negatives survive


def test_pool_only_eval_bit_equals_train_primal():
    H, W, C, N = 16, 8, 8, 4
    rng = np.random.RandomState(9)
    y = jnp.asarray(rng.randn(H, W, C, N).astype(np.float32),
                    jnp.bfloat16)
    train_p = max_pool_s2(y)
    eval_p = max_pool_s2_eval(y)
    assert np.array_equal(np.asarray(train_p, np.float32),
                          np.asarray(eval_p, np.float32))


def test_pool_only_backward_tie_free_matches_autodiff():
    H, W, C, N = 16, 8, 8, 4
    y = unique_input(H, W, C, N, seed=13).astype(jnp.float32)
    g = jax.random.normal(jax.random.PRNGKey(6), (H // 2, W // 2, C, N))

    gr = jax.grad(lambda t: jnp.sum(classic_pool(t) * g))(y)
    gf = jax.grad(lambda t: jnp.sum(
        max_pool_s2(t).astype(jnp.float32) * g))(y)
    np.testing.assert_allclose(np.asarray(gf), np.asarray(gr),
                               atol=5e-2, rtol=5e-2)


def test_pool_only_tie_first_in_scan_conserves_gradient():
    """All-equal windows: first-in-scan routing must conserve the total
    gradient mass (one winner per window takes all of dp)."""
    H, W, C, N = 16, 8, 8, 4
    y = jnp.full((H, W, C, N), -2.0, jnp.float32)  # negative: no relu net
    g = jnp.ones((H // 2, W // 2, C, N), jnp.float32)
    dy = jax.grad(lambda t: jnp.sum(
        max_pool_s2(t).astype(jnp.float32) * g))(y)
    total = float(jnp.sum(dy))
    expect = float(jnp.sum(g))
    assert abs(total - expect) / expect < 1e-3
    # first-in-scan: for interior windows the winner is the top-left tap
    # (row 2r, col 2t); window (1,1) covers rows 2..4, cols 2..4
    assert float(dy[2, 2, 0, 0]) >= 1.0


def test_v2_model_stem_backend_parity():
    """resnet-18-v2 model level: stem_backend='fused' (pool-only kernel
    + in_hwcn first module) matches the classic xla path on the same
    params — checkpoints are backend-portable."""
    from yolov3_tensorflow_tpu.models.resnet18_v2 import ResNet18V2
    rng = np.random.RandomState(15)
    x = jnp.asarray(rng.rand(4, 32, 32, 3).astype(np.float32))
    heads = {}
    variables = None
    for backend in ("xla", "fused"):
        model = ResNet18V2(stem_backend=backend, dtype=jnp.bfloat16)
        init = model.init(jax.random.PRNGKey(0), x, train=False)
        if variables is None:
            variables = init
        else:
            # identical param trees: the in_hwcn path mirrors the
            # classic creation order exactly
            assert (jax.tree_util.tree_structure(init)
                    == jax.tree_util.tree_structure(variables))
        heads[backend] = model.apply(variables, x, train=False)
    for a, b in zip(heads["xla"], heads["fused"]):
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(b, np.float32),
                                   atol=3e-2, rtol=3e-2)


def test_v2_model_train_step_fused_stem():
    """Train-mode v2 with the pool-only stem: gradients flow, losses
    finite and decreasing over a few steps (exercises the custom-vjp
    backward through the full model)."""
    from yolov3_tensorflow_tpu.models.resnet18_v2 import ResNet18V2
    rng = np.random.RandomState(16)
    x = jnp.asarray(rng.rand(4, 32, 32, 3).astype(np.float32))
    model = ResNet18V2(stem_backend="fused", dtype=jnp.bfloat16)
    variables = model.init(jax.random.PRNGKey(0), x, train=True)
    params, rest = variables["params"], variables["batch_stats"]

    def loss_fn(p):
        (s8, s16, s32), _ = model.apply(
            {"params": p, "batch_stats": rest}, x, train=True,
            mutable=["batch_stats"])
        return (jnp.mean(jnp.square(s32.astype(jnp.float32)))
                + jnp.mean(jnp.square(s8.astype(jnp.float32))))

    grads = jax.grad(loss_fn)(params)
    flat = jax.tree_util.tree_leaves(grads)
    assert all(bool(jnp.all(jnp.isfinite(g))) for g in flat)
    # the stem conv's gradient must be nonzero (dy routed through codes)
    stem_g = grads["Conv_0"]["kernel"]
    assert float(jnp.max(jnp.abs(stem_g))) > 0.0


def test_backward_tie_free_matches_autodiff():
    H, W, C, N = 16, 8, 8, 4
    y = unique_input(H, W, C, N, seed=3).astype(jnp.float32)
    inv = jnp.asarray(np.random.RandomState(1).randn(C) * 0.5 + 1.2,
                      jnp.float32)
    shift = jnp.asarray(np.random.RandomState(2).randn(C) * 0.2,
                        jnp.float32)
    g = jax.random.normal(jax.random.PRNGKey(4), (H // 2, W // 2, C, N))

    def loss_ref(y, inv, shift):
        return jnp.sum(classic(y, inv, shift).astype(jnp.float32) * g)

    def loss_fused(y, inv, shift):
        return jnp.sum(bn_pool_relu(y, inv, shift).astype(jnp.float32)
                       * g)

    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(y, inv, shift)
    gf = jax.grad(loss_fused, argnums=(0, 1, 2))(y, inv, shift)
    # positions whose bf16 bn value is duplicated within their (c, n)
    # column may be pooling ties: there the fused op legitimately splits
    # the gradient where select-and-scatter picks first-in-scan — mask
    # them out of the elementwise comparison
    bn = np.asarray(
        y.astype(jnp.bfloat16)
        * inv.astype(jnp.bfloat16)[None, None, :, None]
        + shift.astype(jnp.bfloat16)[None, None, :, None])
    tie = np.zeros(bn.shape, bool)
    for c in range(bn.shape[2]):
        for n in range(bn.shape[3]):
            col = bn[:, :, c, n]
            vals, counts = np.unique(col, return_counts=True)
            dup = set(vals[counts > 1].tolist())
            if dup:
                tie[:, :, c, n] = np.isin(col, list(dup))
    for name, a, b in zip(("dy", "dinv", "dshift"), gr, gf):
        a, b = np.asarray(a), np.asarray(b)
        sc = float(np.max(np.abs(a))) + 1e-6
        if name == "dy":
            a, b = a[~tie], b[~tie]
        np.testing.assert_allclose(b / sc, a / sc, atol=5e-2,
                                   err_msg=name)
    # total gradient mass must agree even across ties
    np.testing.assert_allclose(float(np.sum(np.asarray(gf[0]))),
                               float(np.sum(np.asarray(gr[0]))),
                               rtol=2e-2)


def test_tie_splitting_conserves_gradient():
    """All-equal window values: gradient mass must be preserved (split
    among ties), and dshift must equal the sum of active pooled grads."""
    H, W, C, N = 16, 8, 8, 4
    y = jnp.ones((H, W, C, N), jnp.bfloat16)
    inv = jnp.ones((C,), jnp.float32)
    shift = jnp.zeros((C,), jnp.float32)
    g = jnp.ones((H // 2, W // 2, C, N), jnp.float32)

    def loss(y, inv, shift):
        return jnp.sum(bn_pool_relu(y, inv, shift).astype(jnp.float32)
                       * g)

    dy, dinv, dshift = jax.grad(loss, argnums=(0, 1, 2))(
        y.astype(jnp.float32), inv, shift)
    total = float(jnp.sum(dy))
    expect = float(jnp.sum(g))  # each window routes exactly its dp
    assert abs(total - expect) / expect < 1e-3
    np.testing.assert_allclose(np.asarray(dshift),
                               np.full((C,), H // 2 * W // 2 * N),
                               rtol=1e-3)


def test_zero_inv_channel_gradients_finite():
    """gamma underflowing to exactly 0 (inv == 0) must not NaN the
    gradients: dinv's (p - shift)/inv reconstruction divides by inv,
    and the unguarded 0/0 would poison every parameter on the next
    optimizer step.  The guarded backward returns dinv = 0 for that
    channel (the y-dependence is unrecoverable and the primal is
    constant in it to first order) and keeps dy/dshift exact."""
    H, W, C, N = 16, 8, 8, 4
    y = unique_input(H, W, C, N, seed=7).astype(jnp.float32)
    inv = jnp.asarray(np.r_[0.0, np.random.RandomState(3).rand(C - 1) + 0.5],
                      jnp.float32)
    shift = jnp.asarray(np.random.RandomState(4).randn(C) * 0.3, jnp.float32)
    g = jax.random.normal(jax.random.PRNGKey(5), (H // 2, W // 2, C, N))

    def loss(y, inv, shift):
        return jnp.sum(bn_pool_relu(y, inv, shift).astype(jnp.float32) * g)

    dy, dinv, dshift = jax.grad(loss, argnums=(0, 1, 2))(y, inv, shift)
    for name, t in (("dy", dy), ("dinv", dinv), ("dshift", dshift)):
        assert bool(jnp.all(jnp.isfinite(t))), name
    assert float(dinv[0]) == 0.0
    # the healthy channels still match autodiff of the classic form
    gr = jax.grad(lambda *a: jnp.sum(
        classic(*a).astype(jnp.float32) * g), argnums=1)(y, inv, shift)
    sc = float(jnp.max(jnp.abs(gr))) + 1e-6
    np.testing.assert_allclose(np.asarray(dinv[1:]) / sc,
                               np.asarray(gr[1:]) / sc, atol=5e-2)
