"""Winograd F(2,3) fused conv kernel: numerical parity with direct
convolution, gradient correctness of the custom VJP, and eligibility
gating (runs in Pallas interpret mode on the CPU test backend)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from yolov3_tensorflow_tpu.ops.winograd import (conv3x3, eligible,
                                                pick_wchunk)


def direct(x, w):
    return jax.lax.conv_general_dilated(
        x.astype(jnp.bfloat16), w.astype(jnp.bfloat16), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.bfloat16).astype(jnp.float32)


SHAPES = [
    (2, 8, 8, 8, 8),      # square even
    (2, 10, 6, 8, 16),    # C != Co
    (1, 7, 9, 8, 8),      # odd H and W (padded final col/row)
    (2, 6, 20, 8, 8),     # chunk-divisible W
]


@pytest.mark.parametrize("shape", SHAPES)
def test_forward_matches_direct(shape):
    N, H, W, C, Co = shape
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    x = jax.random.normal(k1, (N, H, W, C), jnp.float32)
    w = jax.random.normal(k2, (3, 3, C, Co), jnp.float32) * 0.2
    ref = direct(x, w)
    got = conv3x3(x.astype(jnp.bfloat16),
                  w.astype(jnp.bfloat16)).astype(jnp.float32)
    scale = float(jnp.max(jnp.abs(ref))) + 1e-6
    np.testing.assert_allclose(np.asarray(got) / scale,
                               np.asarray(ref) / scale, atol=0.03)


def test_forward_small_wchunks():
    # force chunking by picking a wide W so the eligibility path chunks
    N, H, W, C, Co = 1, 4, 32, 8, 8
    k1, k2 = jax.random.split(jax.random.PRNGKey(1))
    x = jax.random.normal(k1, (N, H, W, C), jnp.float32)
    w = jax.random.normal(k2, (3, 3, C, Co), jnp.float32) * 0.2
    ref = direct(x, w)
    got = conv3x3(x.astype(jnp.bfloat16),
                  w.astype(jnp.bfloat16)).astype(jnp.float32)
    scale = float(jnp.max(jnp.abs(ref))) + 1e-6
    np.testing.assert_allclose(np.asarray(got) / scale,
                               np.asarray(ref) / scale, atol=0.03)


def test_gradients_match_direct():
    N, H, W, C, Co = 2, 8, 8, 8, 8
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(2), 3)
    x = jax.random.normal(k1, (N, H, W, C), jnp.float32)
    w = jax.random.normal(k2, (3, 3, C, Co), jnp.float32) * 0.2
    g = jax.random.normal(k3, (N, H, W, Co), jnp.float32)

    def loss_ref(x, w):
        return jnp.sum(direct(x, w) * g)

    def loss_win(x, w):
        return jnp.sum(conv3x3(x.astype(jnp.bfloat16),
                               w.astype(jnp.bfloat16)).astype(jnp.float32)
                       * g)

    dxr, dwr = jax.grad(loss_ref, argnums=(0, 1))(x, w)
    dxw, dww = jax.grad(loss_win, argnums=(0, 1))(x, w)
    for a, b in ((dxr, dxw), (dwr, dww)):
        scale = float(jnp.max(jnp.abs(a))) + 1e-6
        np.testing.assert_allclose(np.asarray(b) / scale,
                                   np.asarray(a) / scale, atol=0.05)


def test_eligibility():
    assert eligible((8, 32, 32, 64), 64, (3, 3), (1, 1), "SAME", 1)
    assert not eligible((8, 32, 32, 64), 64, (1, 1), (1, 1), "SAME", 1)
    assert not eligible((8, 32, 32, 64), 64, (3, 3), (2, 2), "SAME", 1)
    assert not eligible((8, 32, 32, 64), 64, (3, 3), (1, 1), "VALID", 1)
    assert not eligible((8, 32, 32, 64), 64, (3, 3), (1, 1), "SAME", 64)
    assert not eligible((8, 32, 32, 60), 60, (3, 3), (1, 1), "SAME", 1)
    # enormous channel counts must fall back rather than blow VMEM
    assert pick_wchunk(52, 4096, 4096, 128) is None


# ------------------------------------------------------------------ #
# Train-mode fused ops: conv3x3_stats / conv3x3_bn_act_stats values and
# ALL gradients vs a lax-composed reference, specifically on shapes
# where W % wb != 0 (ragged final chunk) — the configuration in which
# the stats epilogue once accumulated phantom output columns (advisor
# round-2 high finding): 13x13 (odd W -> wb = 14) and a wide W that
# forces multi-chunking with a non-dividing wb.

TRAIN_SHAPES = [
    (2, 13, 13, 8, 8),    # odd W: ragged single chunk (the NaN repro)
    (2, 8, 8, 8, 16),     # aligned control
    (1, 6, 200, 8, 8),    # forced chunking, W % wb != 0
]


def _stats_ref(x, w):
    y = direct(x, w)
    return y, jnp.sum(y, axis=(0, 1, 2)), jnp.sum(y * y, axis=(0, 1, 2))


def _cba_ref(x, w, inv, shift):
    z = jnp.maximum(x.astype(jnp.bfloat16) * inv.astype(jnp.bfloat16)
                    + shift.astype(jnp.bfloat16), jnp.bfloat16(0))
    return _stats_ref(z, w)


def _rel_close(got, ref, atol):
    scale = float(jnp.max(jnp.abs(ref))) + 1e-6
    np.testing.assert_allclose(np.asarray(got, jnp.float32) / scale,
                               np.asarray(ref, jnp.float32) / scale,
                               atol=atol)


@pytest.mark.parametrize("shape", TRAIN_SHAPES)
def test_stats_epilogue_matches_ref(shape):
    from yolov3_tensorflow_tpu.ops.winograd import conv3x3_stats
    N, H, W, C, Co = shape
    k1, k2 = jax.random.split(jax.random.PRNGKey(3))
    x = jax.random.normal(k1, (N, H, W, C), jnp.float32)
    w = jax.random.normal(k2, (3, 3, C, Co), jnp.float32) * 0.2
    yr, sr, qr = _stats_ref(x, w)
    y, s, q = conv3x3_stats(x.astype(jnp.bfloat16), w.astype(jnp.bfloat16))
    _rel_close(y, yr, 0.03)
    _rel_close(s, sr, 0.03)
    _rel_close(q, qr, 0.03)
    assert np.all(np.isfinite(np.asarray(s))), "phantom-column corruption"
    assert np.all(np.isfinite(np.asarray(q)))


@pytest.mark.parametrize("shape", TRAIN_SHAPES)
def test_stats_epilogue_gradients(shape):
    from yolov3_tensorflow_tpu.ops.winograd import conv3x3_stats
    N, H, W, C, Co = shape
    keys = jax.random.split(jax.random.PRNGKey(4), 5)
    x = jax.random.normal(keys[0], (N, H, W, C), jnp.float32)
    w = jax.random.normal(keys[1], (3, 3, C, Co), jnp.float32) * 0.2
    gy = jax.random.normal(keys[2], (N, H, W, Co), jnp.float32)
    gs = jax.random.normal(keys[3], (Co,), jnp.float32)
    gq = jax.random.normal(keys[4], (Co,), jnp.float32) * 0.1

    def scalarize(y, s, q):
        return (jnp.sum(y.astype(jnp.float32) * gy)
                + jnp.sum(s * gs) + jnp.sum(q * gq))

    def loss_ref(x, w):
        return scalarize(*_stats_ref(x, w))

    def loss_win(x, w):
        return scalarize(*conv3x3_stats(x.astype(jnp.bfloat16),
                                        w.astype(jnp.bfloat16)))

    refs = jax.grad(loss_ref, argnums=(0, 1))(x, w)
    gots = jax.grad(loss_win, argnums=(0, 1))(x, w)
    for got, ref in zip(gots, refs):
        assert np.all(np.isfinite(np.asarray(got)))
        _rel_close(got, ref, 0.05)


@pytest.mark.parametrize("shape", TRAIN_SHAPES)
def test_bn_act_stats_gradients(shape):
    """conv3x3_bn_act_stats: all four gradients vs the lax composition —
    13x13 once produced dinv = NaN from out-of-bounds c_ref reads."""
    from yolov3_tensorflow_tpu.ops.winograd import conv3x3_bn_act_stats
    N, H, W, C, Co = shape
    keys = jax.random.split(jax.random.PRNGKey(5), 7)
    x = jax.random.normal(keys[0], (N, H, W, C), jnp.float32)
    w = jax.random.normal(keys[1], (3, 3, C, Co), jnp.float32) * 0.2
    inv = jax.random.normal(keys[2], (C,), jnp.float32) * 0.5 + 1.0
    shift = jax.random.normal(keys[3], (C,), jnp.float32) * 0.2
    gy = jax.random.normal(keys[4], (N, H, W, Co), jnp.float32)
    gs = jax.random.normal(keys[5], (Co,), jnp.float32)
    gq = jax.random.normal(keys[6], (Co,), jnp.float32) * 0.1

    def scalarize(y, s, q):
        return (jnp.sum(y.astype(jnp.float32) * gy)
                + jnp.sum(s * gs) + jnp.sum(q * gq))

    def loss_ref(x, w, inv, shift):
        return scalarize(*_cba_ref(x, w, inv, shift))

    def loss_win(x, w, inv, shift):
        return scalarize(*conv3x3_bn_act_stats(
            x.astype(jnp.bfloat16), w.astype(jnp.bfloat16), inv, shift))

    refs = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(x, w, inv, shift)
    gots = jax.grad(loss_win, argnums=(0, 1, 2, 3))(x, w, inv, shift)
    # exact-zero pre-activations are relu gradient ties: the kernel's
    # strict `> 0` mask and autodiff-of-maximum's `>= 0` are both valid
    # subgradients (cf. the maxpool tie convention, CLAUDE.md) — mask
    # those positions out of the dx comparison
    tie = np.asarray(x.astype(jnp.bfloat16) * inv.astype(jnp.bfloat16)
                     + shift.astype(jnp.bfloat16)) == 0
    for name, got, ref in zip(("dx", "dw", "dinv", "dshift"), gots, refs):
        assert np.all(np.isfinite(np.asarray(got))), name
        if name == "dx":
            got = jnp.where(tie, 0.0, got)
            ref = jnp.where(tie, 0.0, ref)
        _rel_close(got, ref, 0.06)


def test_model_backend_parity_train(tiny_cfg):
    """train=True forward + parameter-gradient parity between the xla
    and winograd backends — exercises the fused stats-mode BN
    integration end-to-end (advisor round-2 medium finding).

    Gradient criterion: through 18 BN-coupled bf16 layers the backward
    pass is ill-conditioned — the PLAIN xla-bf16 backend's gradients
    already deviate 0.5-0.8x (max-normalized) from an f32 ground truth,
    and winograd-vs-xla differences are the same magnitude (measured).
    Comparing the two bf16 backends elementwise is therefore
    meaningless; the meaningful invariant is that the fused path is no
    WORSE-conditioned than the standard bf16 path: per parameter,
    RMS(win - f32) <= 2.5 * RMS(xla - f32) + eps."""
    from yolov3_tensorflow_tpu.models.detector import build_detector
    cfg_x = tiny_cfg.replace(conv_backend="xla")
    # min_channels=0 engages the FULL chain incl. module 1 (the
    # production floor excludes 64ch blocks on perf grounds only)
    cfg_w = tiny_cfg.replace(conv_backend="winograd",
                             winograd_min_channels=0)
    cfg_f = tiny_cfg.replace(conv_backend="xla", compute_dtype="float32")
    mx, mw = build_detector(cfg_x), build_detector(cfg_w)
    mf = build_detector(cfg_f)
    h, w, c = tiny_cfg.input_image_size
    x = jax.random.normal(jax.random.PRNGKey(0), (2, h, w, c))
    vx = mx.init(jax.random.PRNGKey(1), x, train=True)
    gyk = jax.random.split(jax.random.PRNGKey(2), 8)

    def run(model, variables):
        params = variables["params"]

        def loss(p):
            outs, _ = model.apply(
                {**variables, "params": p}, x, train=True,
                mutable=["batch_stats"])
            tot = 0.0
            for i, o in enumerate(outs):
                g = jax.random.normal(gyk[i], o.shape) * 1e-2
                tot += jnp.sum(o.astype(jnp.float32) * g)
            return tot, outs

        (_, outs), grads = jax.value_and_grad(loss, has_aux=True)(params)
        return outs, grads

    ox, gx = run(mx, vx)
    ow, gw = run(mw, vx)
    of, gf = run(mf, vx)
    # forward: train=True couples every layer through its batch
    # statistics, so bf16-level winograd/direct drift compounds with
    # depth (the /32 head sees ~6% RMS); exact per-op numerics are
    # pinned by the block-level tests above
    for a, b in zip(ox, ow):
        a32 = np.asarray(a, np.float32)
        d = np.asarray(b, np.float32) - a32
        rms = np.sqrt(np.mean(d * d)) / (np.sqrt(np.mean(a32 * a32)) + 1e-6)
        assert rms < 0.10, rms
        relmax = np.abs(d).max() / (np.abs(a32).max() + 1e-6)
        assert relmax < 0.25, relmax
    flat_x = dict(jax.tree_util.tree_leaves_with_path(gx))
    flat_w = dict(jax.tree_util.tree_leaves_with_path(gw))
    flat_f = dict(jax.tree_util.tree_leaves_with_path(gf))
    checked = 0
    for path, ref in flat_f.items():
        ref = np.asarray(ref, np.float32)
        ex = np.asarray(flat_x[path], np.float32) - ref
        ew = np.asarray(flat_w[path], np.float32) - ref
        assert np.isfinite(ew).all(), path
        rms_x = float(np.sqrt(np.mean(ex * ex)))
        rms_w = float(np.sqrt(np.mean(ew * ew)))
        floor = 0.02 * float(np.sqrt(np.mean(ref * ref))) + 1e-8
        assert rms_w <= 2.5 * rms_x + floor, (path, rms_w, rms_x)
        checked += 1
    assert checked > 20


def test_model_backend_parity(tiny_cfg):
    """Same init -> winograd and xla detectors agree within bf16-winograd
    tolerance, with identical parameter trees (checkpoint portability)."""
    from yolov3_tensorflow_tpu.models.detector import build_detector
    cfg_x = tiny_cfg.replace(conv_backend="xla")
    cfg_w = tiny_cfg.replace(conv_backend="winograd")
    mx, mw = build_detector(cfg_x), build_detector(cfg_w)
    h, w, c = tiny_cfg.input_image_size
    x = jax.random.normal(jax.random.PRNGKey(0), (2, h, w, c))
    vx = mx.init(jax.random.PRNGKey(1), x, train=False)
    vw = mw.init(jax.random.PRNGKey(1), x, train=False)
    assert (jax.tree_util.tree_structure(vx)
            == jax.tree_util.tree_structure(vw))
    ox = mx.apply(vx, x, train=False)
    ow = mw.apply(vw, x, train=False)
    for a, b in zip(ox, ow):
        scale = float(jnp.max(jnp.abs(a))) + 1e-6
        np.testing.assert_allclose(np.asarray(b) / scale,
                                   np.asarray(a) / scale, atol=0.05)


@pytest.mark.parametrize("shape", TRAIN_SHAPES)
def test_bn_add_act_stats_gradients(shape):
    """hconv_bn_add_act_stats (the residual-boundary 2-input prologue):
    y, a, stats and all five gradients vs the lax composition,
    including a nonzero cotangent on the materialized boundary
    activation `a` (the identity-chain path)."""
    from yolov3_tensorflow_tpu.ops.winograd import hconv_bn_add_act_stats
    N, H, W, C, Co = shape
    keys = jax.random.split(jax.random.PRNGKey(7), 9)
    x = jax.random.normal(keys[0], (N, H, W, C), jnp.float32)
    ident = jax.random.normal(keys[1], (N, H, W, C), jnp.float32)
    w = jax.random.normal(keys[2], (3, 3, C, Co), jnp.float32) * 0.2
    inv = jax.random.normal(keys[3], (C,), jnp.float32) * 0.5 + 1.0
    shift = jax.random.normal(keys[4], (C,), jnp.float32) * 0.2
    gy = jax.random.normal(keys[5], (N, H, W, Co), jnp.float32)
    ga = jax.random.normal(keys[6], (N, H, W, C), jnp.float32)
    gs = jax.random.normal(keys[7], (Co,), jnp.float32)
    gq = jax.random.normal(keys[8], (Co,), jnp.float32) * 0.1

    def hw(t):
        return jnp.transpose(t.astype(jnp.bfloat16), (1, 2, 3, 0))

    def scalarize(y, a, s, q):
        return (jnp.sum(y.astype(jnp.float32) * hw(gy).astype(jnp.float32))
                + jnp.sum(a.astype(jnp.float32)
                          * hw(ga).astype(jnp.float32))
                + jnp.sum(s * gs) + jnp.sum(q * gq))

    def ref_op(x, ident, w, inv, shift):
        # association order matches the kernel: (x*inv + shift) + id
        a = jnp.maximum(x.astype(jnp.bfloat16) * inv.astype(jnp.bfloat16)
                        + shift.astype(jnp.bfloat16)
                        + ident.astype(jnp.bfloat16), jnp.bfloat16(0))
        y, s, q = _stats_ref(a, w)
        return y, a, s, q

    def loss_ref(x, ident, w, inv, shift):
        y, a, s, q = ref_op(x, ident, w, inv, shift)
        return scalarize(hw(y), hw(a), s, q)

    def loss_win(x, ident, w, inv, shift):
        y, a, s, q = hconv_bn_add_act_stats(
            hw(x), hw(ident), w.astype(jnp.bfloat16), inv, shift)
        return scalarize(y, a, s, q)

    refs = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4))(
        x, ident, w, inv, shift)
    gots = jax.grad(loss_win, argnums=(0, 1, 2, 3, 4))(
        x, ident, w, inv, shift)
    tie = np.asarray(x.astype(jnp.bfloat16) * inv.astype(jnp.bfloat16)
                     + shift.astype(jnp.bfloat16)
                     + ident.astype(jnp.bfloat16)) == 0
    names = ("dx", "dident", "dw", "dinv", "dshift")
    for name, got, ref in zip(names, gots, refs):
        assert np.all(np.isfinite(np.asarray(got))), name
        if name in ("dx", "dident"):
            got = jnp.where(tie, 0.0, got)
            ref = jnp.where(tie, 0.0, ref)
        _rel_close(got, ref, 0.06)


@pytest.mark.parametrize("shape", TRAIN_SHAPES[:1])
def test_bn_add_act_values(shape):
    from yolov3_tensorflow_tpu.ops.winograd import hconv_bn_add_act_stats
    N, H, W, C, Co = shape
    keys = jax.random.split(jax.random.PRNGKey(8), 5)
    x = jax.random.normal(keys[0], (N, H, W, C), jnp.float32)
    ident = jax.random.normal(keys[1], (N, H, W, C), jnp.float32)
    w = jax.random.normal(keys[2], (3, 3, C, Co), jnp.float32) * 0.2
    inv = jax.random.normal(keys[3], (C,), jnp.float32) * 0.5 + 1.0
    shift = jax.random.normal(keys[4], (C,), jnp.float32) * 0.2

    def hw(t):
        return jnp.transpose(t.astype(jnp.bfloat16), (1, 2, 3, 0))

    a_ref = jnp.maximum(x.astype(jnp.bfloat16) * inv.astype(jnp.bfloat16)
                        + shift.astype(jnp.bfloat16)
                        + ident.astype(jnp.bfloat16), jnp.bfloat16(0))
    y_ref, s_ref, q_ref = _stats_ref(a_ref, w)
    y, a, s, q = hconv_bn_add_act_stats(hw(x), hw(ident),
                                        w.astype(jnp.bfloat16), inv, shift)
    _rel_close(a, hw(a_ref), 0.02)
    _rel_close(y, hw(y_ref), 0.03)
    _rel_close(s, s_ref, 0.03)
    _rel_close(q, q_ref, 0.03)
