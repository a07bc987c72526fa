"""Loss correctness: vectorized XLA loss vs the independent NumPy oracle,
plus structural invariances (reference semantics: yolov3/yolov3_loss.py)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from yolov3_tensorflow_tpu.config import Config
from yolov3_tensorflow_tpu.ops.loss import YOLOv3Loss

from .reference_loss import reference_loss

# oracle-gate subset: `python -m pytest tests/ -m quick -q`
# (oracle-pinned loss semantics)
pytestmark = pytest.mark.quick


def _mk_cfg(**kw):
    base = dict(input_image_size=(32, 32, 3), max_boxes=3,
                anchor_boxes=(((0.2, 0.3), (0.5, 0.4)),
                              ((0.3, 0.3),),
                              ((0.6, 0.7), (0.9, 0.8))))
    base.update(kw)
    return Config(**base)


def _random_heads(cfg, n, seed=0):
    rng = np.random.RandomState(seed)
    return [jnp.asarray(0.5 * rng.randn(n, h, w, c).astype(np.float32))
            for (h, w), c in zip(cfg.head_grid_sizes, cfg.head_channel_nums)]


def _targets(n, m, rows):
    t = -np.ones((n, m, 5), np.float32)
    for (i, j), row in rows.items():
        t[i, j] = row
    return jnp.asarray(t)


@pytest.mark.parametrize("class_num,focal,tiou,smooth", [
    (0, False, False, False),
    (3, False, False, False),
    (3, True, False, False),
    (0, False, True, False),
    (4, False, False, True),
])
def test_matches_numpy_oracle(class_num, focal, tiou, smooth):
    cfg = _mk_cfg(class_num=class_num, is_focal_loss=focal,
                  is_tiou_recall=tiou, is_label_smoothing=smooth,
                  rectified_coord_num=100)
    heads = _random_heads(cfg, 2, seed=class_num + 10 * focal + 100 * tiou)
    targets = _targets(2, 3, {
        (0, 0): [0.5, 0.5, 0.25, 0.3, min(1, class_num and 1)],
        (0, 1): [0.2, 0.7, 0.1, 0.15, 0],
        (1, 0): [0.8, 0.3, 0.4, 0.5, min(2, max(0, class_num - 1))],
    })
    loss = YOLOv3Loss(cfg)
    total, bd, cnt = jax.jit(loss)(heads, targets,
                                   jnp.asarray(0, jnp.int32))
    ref_total, ref_bd, ref_cnt = reference_loss(
        [np.asarray(h) for h in heads], np.asarray(targets), cfg,
        image_count=0)
    np.testing.assert_allclose(float(total), ref_total, rtol=2e-4)
    got = np.stack([np.asarray(bd[k]) for k in (
        "rectified_coord_loss", "coord_loss_xy", "coord_loss_wh",
        "noobj_iou_loss", "obj_iou_loss", "class_loss")])
    np.testing.assert_allclose(got, ref_bd, rtol=2e-3, atol=1e-5)
    assert int(cnt) == ref_cnt


def test_padding_rows_do_not_matter():
    cfg = _mk_cfg(max_boxes=5)
    heads = _random_heads(cfg, 1)
    t1 = _targets(1, 5, {(0, 0): [0.5, 0.5, 0.2, 0.2, 0]})
    # same object, garbage in the padding rows (must still read as padding)
    t2 = np.asarray(t1).copy()
    t2[0, 3] = [-1, 0.9, 0.9, 0.9, 5]
    loss = YOLOv3Loss(cfg)
    l1, _, _ = loss(heads, t1, jnp.asarray(10 ** 9, jnp.int32))
    l2, _, _ = loss(heads, jnp.asarray(t2), jnp.asarray(10 ** 9, jnp.int32))
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-6)


def test_rectified_counter_gating():
    cfg = _mk_cfg(rectified_coord_num=3)
    heads = _random_heads(cfg, 2)
    t = _targets(2, 3, {(0, 0): [0.5, 0.5, 0.2, 0.2, 0]})
    loss = YOLOv3Loss(cfg)
    # active: count 0 <= 3
    _, bd, cnt = loss(heads, t, jnp.asarray(0, jnp.int32))
    assert np.asarray(bd["rectified_coord_loss"]).sum() > 0
    assert int(cnt) == 2
    # still active at exactly the boundary (reference uses <=)
    _, bd, cnt = loss(heads, t, jnp.asarray(3, jnp.int32))
    assert np.asarray(bd["rectified_coord_loss"]).sum() > 0
    assert int(cnt) == 5
    # inactive past it; counter freezes
    _, bd, cnt = loss(heads, t, jnp.asarray(4, jnp.int32))
    assert np.asarray(bd["rectified_coord_loss"]).sum() == 0
    assert int(cnt) == 4


def test_empty_image_and_gradients_finite():
    cfg = _mk_cfg()
    heads = _random_heads(cfg, 2)
    t = -jnp.ones((2, 3, 5))
    loss = YOLOv3Loss(cfg)

    def total(hs):
        l, _, _ = loss(hs, t, jnp.asarray(0, jnp.int32))
        return l

    val = total(heads)
    assert bool(jnp.isfinite(val))
    grads = jax.grad(total)(heads)
    assert all(bool(jnp.all(jnp.isfinite(g))) for g in grads)
    # only noobj + rectified terms are non-zero without objects
    _, bd, _ = loss(heads, t, jnp.asarray(10 ** 9, jnp.int32))
    assert np.asarray(bd["coord_loss_xy"]).sum() == 0
    assert np.asarray(bd["obj_iou_loss"]).sum() == 0
    assert np.asarray(bd["noobj_iou_loss"]).sum() > 0


def test_gradients_finite_at_extreme_logits():
    """Regression: the naive sigmoid expression's autodiff is inf/inf=NaN
    below logit ~-88; the noobj term drives logits there in long runs.
    Found as a sudden weight NaN at epoch 110 of a healthy training run."""
    cfg = _mk_cfg()
    heads = [jnp.full((1, h, w, c), -120.0)
             for (h, w), c in zip(cfg.head_grid_sizes,
                                  cfg.head_channel_nums)]
    t = _targets(1, 3, {(0, 0): [0.5, 0.5, 0.2, 0.2, 0]})
    loss = YOLOv3Loss(cfg)

    def total(hs):
        l, _, _ = loss(hs, t, jnp.asarray(10 ** 9, jnp.int32))
        return l

    val = total(heads)
    grads = jax.grad(total)(heads)
    assert bool(jnp.isfinite(val))
    assert all(bool(jnp.all(jnp.isfinite(g))) for g in grads)
    # and at extreme positive logits (exp side)
    heads_hi = [jnp.full_like(h, 120.0) for h in heads]
    grads = jax.grad(total)(heads_hi)
    assert all(bool(jnp.all(jnp.isfinite(g))) for g in grads)


@pytest.mark.parametrize("class_num", [0, 3])
def test_giou_matches_numpy_oracle(class_num):
    """GIOU coordinate loss (reference roadmap README.md:134) vs the
    independently-written oracle branch."""
    cfg = _mk_cfg(class_num=class_num, is_giou_loss=True,
                  rectified_coord_num=100)
    heads = _random_heads(cfg, 2, seed=21 + class_num)
    targets = _targets(2, 3, {
        (0, 0): [0.5, 0.5, 0.25, 0.3, min(1, class_num and 1)],
        (0, 1): [0.2, 0.7, 0.1, 0.15, 0],
        (1, 0): [0.8, 0.3, 0.4, 0.5, min(2, max(0, class_num - 1))],
    })
    loss = YOLOv3Loss(cfg)
    total, bd, cnt = jax.jit(loss)(heads, targets,
                                   jnp.asarray(0, jnp.int32))
    ref_total, ref_bd, ref_cnt = reference_loss(
        [np.asarray(h) for h in heads], np.asarray(targets), cfg,
        image_count=0)
    np.testing.assert_allclose(float(total), ref_total, rtol=2e-4)
    got = np.stack([np.asarray(bd[k]) for k in (
        "rectified_coord_loss", "coord_loss_xy", "coord_loss_wh",
        "noobj_iou_loss", "obj_iou_loss", "class_loss")])
    np.testing.assert_allclose(got, ref_bd, rtol=2e-3, atol=1e-5)
    # the wh slot is folded into the GIOU (xy) term
    assert np.asarray(bd["coord_loss_wh"]).sum() == 0
    assert np.asarray(bd["coord_loss_xy"]).sum() > 0


def test_giou_gradients_finite_at_extreme_logits():
    cfg = _mk_cfg(is_giou_loss=True)
    t = _targets(1, 3, {(0, 0): [0.5, 0.5, 0.2, 0.2, 0]})
    loss = YOLOv3Loss(cfg)

    def total(hs):
        l, _, _ = loss(hs, t, jnp.asarray(10 ** 9, jnp.int32))
        return l

    for v in (-120.0, 120.0):
        heads = [jnp.full((1, h, w, c), v)
                 for (h, w), c in zip(cfg.head_grid_sizes,
                                      cfg.head_channel_nums)]
        assert bool(jnp.isfinite(total(heads)))
        grads = jax.grad(total)(heads)
        assert all(bool(jnp.all(jnp.isfinite(g))) for g in grads)


def test_box_weights_ones_is_default():
    cfg = _mk_cfg(class_num=3)
    heads = _random_heads(cfg, 2, seed=3)
    t = _targets(2, 3, {(0, 0): [0.5, 0.5, 0.25, 0.3, 1],
                        (1, 0): [0.8, 0.3, 0.4, 0.5, 2]})
    loss = YOLOv3Loss(cfg)
    l1, _, _ = loss(heads, t, jnp.asarray(0, jnp.int32))
    l2, _, _ = loss(heads, t, jnp.asarray(0, jnp.int32),
                    box_weights=jnp.ones((2, 3)))
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-6)


def test_box_weights_match_oracle():
    """Fractional per-box weights (the mixup hook) against the oracle's
    independently-looped weighting."""
    cfg = _mk_cfg(class_num=3, rectified_coord_num=-1)
    heads = _random_heads(cfg, 2, seed=11)
    targets = _targets(2, 3, {
        (0, 0): [0.5, 0.5, 0.25, 0.3, 1],
        (0, 1): [0.2, 0.7, 0.1, 0.15, 0],
        (1, 0): [0.8, 0.3, 0.4, 0.5, 2],
    })
    w = np.asarray([[0.3, 0.9, 0.5], [0.7, 1.0, 1.0]], np.float32)
    loss = YOLOv3Loss(cfg)
    total, bd, _ = loss(heads, targets, jnp.asarray(10 ** 9, jnp.int32),
                        box_weights=jnp.asarray(w))
    ref_total, ref_bd, _ = reference_loss(
        [np.asarray(h) for h in heads], np.asarray(targets), cfg,
        box_weights=w)
    np.testing.assert_allclose(float(total), ref_total, rtol=2e-4)
    got = np.stack([np.asarray(bd[k]) for k in (
        "rectified_coord_loss", "coord_loss_xy", "coord_loss_wh",
        "noobj_iou_loss", "obj_iou_loss", "class_loss")])
    np.testing.assert_allclose(got, ref_bd, rtol=2e-3, atol=1e-5)


@pytest.mark.parametrize("class_num", [0, 3])
def test_ghm_matches_numpy_oracle(class_num):
    """GHM-C confidence loss (the reference's declared-but-dead flag,
    configs.py:71 / roadmap README.md:133) vs the independently-looped
    oracle branch."""
    cfg = _mk_cfg(class_num=class_num, is_gradient_harmonized=True,
                  rectified_coord_num=100)
    heads = _random_heads(cfg, 2, seed=31 + class_num)
    targets = _targets(2, 3, {
        (0, 0): [0.5, 0.5, 0.25, 0.3, min(1, class_num and 1)],
        (0, 1): [0.2, 0.7, 0.1, 0.15, 0],
        (1, 0): [0.8, 0.3, 0.4, 0.5, min(2, max(0, class_num - 1))],
    })
    loss = YOLOv3Loss(cfg)
    total, bd, _ = jax.jit(loss)(heads, targets, jnp.asarray(0, jnp.int32))
    ref_total, ref_bd, _ = reference_loss(
        [np.asarray(h) for h in heads], np.asarray(targets), cfg,
        image_count=0)
    np.testing.assert_allclose(float(total), ref_total, rtol=2e-4)
    got = np.stack([np.asarray(bd[k]) for k in (
        "rectified_coord_loss", "coord_loss_xy", "coord_loss_wh",
        "noobj_iou_loss", "obj_iou_loss", "class_loss")])
    np.testing.assert_allclose(got, ref_bd, rtol=2e-3, atol=1e-5)
    assert np.asarray(bd["noobj_iou_loss"]).sum() > 0
    assert np.asarray(bd["obj_iou_loss"]).sum() > 0


@pytest.mark.parametrize("class_num", [0, 3])
def test_gaussian_yolo_matches_numpy_oracle(class_num):
    """Gaussian YOLO NLL coordinates (reference roadmap README.md:135)
    vs the independently-looped oracle branch."""
    cfg = _mk_cfg(class_num=class_num, is_gaussian_yolo=True,
                  rectified_coord_num=100)
    assert cfg.box_len == 9 + class_num
    heads = _random_heads(cfg, 2, seed=41 + class_num)
    targets = _targets(2, 3, {
        (0, 0): [0.5, 0.5, 0.25, 0.3, min(1, class_num and 1)],
        (0, 1): [0.2, 0.7, 0.1, 0.15, 0],
        (1, 0): [0.8, 0.3, 0.4, 0.5, min(2, max(0, class_num - 1))],
    })
    loss = YOLOv3Loss(cfg)
    total, bd, cnt = jax.jit(loss)(heads, targets,
                                   jnp.asarray(0, jnp.int32))
    ref_total, ref_bd, ref_cnt = reference_loss(
        [np.asarray(h) for h in heads], np.asarray(targets), cfg,
        image_count=0)
    np.testing.assert_allclose(float(total), ref_total, rtol=2e-4)
    got = np.stack([np.asarray(bd[k]) for k in (
        "rectified_coord_loss", "coord_loss_xy", "coord_loss_wh",
        "noobj_iou_loss", "obj_iou_loss", "class_loss")])
    np.testing.assert_allclose(got, ref_bd, rtol=2e-3, atol=1e-5)
    assert int(cnt) == ref_cnt


def test_gaussian_yolo_gradients_finite_at_extreme_logits():
    cfg = _mk_cfg(is_gaussian_yolo=True, class_num=2)
    t = _targets(1, 3, {(0, 0): [0.5, 0.5, 0.2, 0.2, 0]})
    loss = YOLOv3Loss(cfg)

    def total(hs):
        l, _, _ = loss(hs, t, jnp.asarray(10 ** 9, jnp.int32))
        return l

    for v in (-120.0, 120.0):
        heads = [jnp.full((1, h, w, c), v)
                 for (h, w), c in zip(cfg.head_grid_sizes,
                                      cfg.head_channel_nums)]
        assert bool(jnp.isfinite(total(heads)))
        grads = jax.grad(total)(heads)
        assert all(bool(jnp.all(jnp.isfinite(g))) for g in grads)


def test_gaussian_with_focal_and_box_weights_matches_oracle():
    """Feature composition: Gaussian NLL coordinates x mixup box
    weights x focal confidence — each multiplies a different term, so
    the composed loss must still match the independently-looped oracle."""
    cfg = _mk_cfg(class_num=3, is_gaussian_yolo=True, is_focal_loss=True,
                  rectified_coord_num=-1)
    heads = _random_heads(cfg, 2, seed=23)
    targets = _targets(2, 3, {
        (0, 0): [0.5, 0.5, 0.25, 0.3, 1],
        (0, 1): [0.2, 0.7, 0.1, 0.15, 0],
        (1, 0): [0.8, 0.3, 0.4, 0.5, 2],
    })
    w = np.asarray([[0.4, 0.8, 0.5], [0.6, 1.0, 1.0]], np.float32)
    loss = YOLOv3Loss(cfg)
    total, bd, _ = loss(heads, targets, jnp.asarray(10 ** 9, jnp.int32),
                        box_weights=jnp.asarray(w))
    ref_total, ref_bd, _ = reference_loss(
        [np.asarray(h) for h in heads], np.asarray(targets), cfg,
        box_weights=w)
    np.testing.assert_allclose(float(total), ref_total, rtol=2e-4)
    got = np.stack([np.asarray(bd[k]) for k in (
        "rectified_coord_loss", "coord_loss_xy", "coord_loss_wh",
        "noobj_iou_loss", "obj_iou_loss", "class_loss")])
    np.testing.assert_allclose(got, ref_bd, rtol=2e-3, atol=1e-5)


def test_gaussian_and_giou_mutually_exclusive():
    cfg = _mk_cfg(is_gaussian_yolo=True, is_giou_loss=True)
    with pytest.raises(ValueError):
        YOLOv3Loss(cfg)


def test_focal_and_ghm_mutually_exclusive():
    """Both re-weight the confidence CE; GHM silently winning would turn
    a focal_gamma sweep into identical runs — __init__ must refuse."""
    cfg = _mk_cfg(is_focal_loss=True, is_gradient_harmonized=True)
    with pytest.raises(ValueError):
        YOLOv3Loss(cfg)


def test_ghm_with_box_weights_matches_oracle():
    """GHM composes with mixup's per-box weights: positive anchors carry
    the accumulated clipped weight; the histogram stays binary."""
    cfg = _mk_cfg(class_num=3, is_gradient_harmonized=True,
                  rectified_coord_num=-1)
    heads = _random_heads(cfg, 2, seed=17)
    targets = _targets(2, 3, {
        (0, 0): [0.5, 0.5, 0.25, 0.3, 1],
        (0, 1): [0.2, 0.7, 0.1, 0.15, 0],
        (1, 0): [0.8, 0.3, 0.4, 0.5, 2],
    })
    w = np.asarray([[0.3, 0.9, 0.5], [0.7, 1.0, 1.0]], np.float32)
    loss = YOLOv3Loss(cfg)
    total, bd, _ = loss(heads, targets, jnp.asarray(10 ** 9, jnp.int32),
                        box_weights=jnp.asarray(w))
    ref_total, ref_bd, _ = reference_loss(
        [np.asarray(h) for h in heads], np.asarray(targets), cfg,
        box_weights=w)
    np.testing.assert_allclose(float(total), ref_total, rtol=2e-4)
    got = np.stack([np.asarray(bd[k]) for k in (
        "rectified_coord_loss", "coord_loss_xy", "coord_loss_wh",
        "noobj_iou_loss", "obj_iou_loss", "class_loss")])
    np.testing.assert_allclose(got, ref_bd, rtol=2e-3, atol=1e-5)


def test_ghm_gradients_finite_at_extreme_logits():
    cfg = _mk_cfg(is_gradient_harmonized=True)
    t = _targets(1, 3, {(0, 0): [0.5, 0.5, 0.2, 0.2, 0]})
    loss = YOLOv3Loss(cfg)

    def total(hs):
        l, _, _ = loss(hs, t, jnp.asarray(10 ** 9, jnp.int32))
        return l

    for v in (-120.0, 120.0):
        heads = [jnp.full((1, h, w, c), v)
                 for (h, w), c in zip(cfg.head_grid_sizes,
                                      cfg.head_channel_nums)]
        assert bool(jnp.isfinite(total(heads)))
        grads = jax.grad(total)(heads)
        assert all(bool(jnp.all(jnp.isfinite(g))) for g in grads)


def test_ghm_weights_sum_to_one_per_head():
    """Invariant from the normalization: summed over all participating
    candidates, the GHM weights are exactly 1 per head — so the noobj+obj
    total is a weighted MEAN of the per-candidate CEs and sits between
    the min and max candidate CE."""
    cfg = _mk_cfg(class_num=0, is_gradient_harmonized=True,
                  rectified_coord_num=-1)
    # uniform logits: all background candidates share one bin -> every
    # weight = 1/count, and the noobj term equals the plain mean CE
    heads = [jnp.zeros((1, h, w, c))
             for (h, w), c in zip(cfg.head_grid_sizes,
                                  cfg.head_channel_nums)]
    t = _targets(1, 3, {})  # no objects: all anchors are background
    loss = YOLOv3Loss(cfg)
    _, bd, _ = loss(heads, t, jnp.asarray(10 ** 9, jnp.int32))
    w_noobj = np.asarray([r[2] for r in cfg.loss_weights])
    # sigmoid(0) = 0.5 -> CE = -log(0.5) at every candidate; the weighted
    # mean of a constant is that constant
    np.testing.assert_allclose(
        np.asarray(bd["noobj_iou_loss"]),
        w_noobj * (-np.log(0.5)), rtol=1e-5)


def test_mixup_duplicate_union_equals_base():
    """The mixup label transform is loss-invariant in the degenerate
    self-pair case: union of a label set with itself, weighted lam and
    1-lam, must equal the single-copy loss (weights sum to 1 per box and
    the object/background geometry is weight-independent)."""
    cfg = _mk_cfg(class_num=3)
    heads = _random_heads(cfg, 2, seed=5)
    t = _targets(2, 3, {(0, 0): [0.5, 0.5, 0.25, 0.3, 1],
                        (1, 1): [0.8, 0.3, 0.4, 0.5, 2]})
    lam = 0.37
    t2 = jnp.concatenate([t, t], axis=1)
    w = jnp.concatenate([jnp.full((2, 3), lam),
                         jnp.full((2, 3), 1.0 - lam)], axis=1)
    loss = YOLOv3Loss(cfg)
    base, bd1, _ = loss(heads, t, jnp.asarray(10 ** 9, jnp.int32))
    mixed, bd2, _ = loss(heads, t2, jnp.asarray(10 ** 9, jnp.int32),
                         box_weights=w)
    np.testing.assert_allclose(float(base), float(mixed), rtol=1e-5)


def test_cross_head_assignment_unique_when_no_tie():
    """A small object should normally win on exactly one head."""
    cfg = _mk_cfg(rectified_coord_num=-1)
    heads = _random_heads(cfg, 1, seed=7)
    t = _targets(1, 3, {(0, 0): [0.4, 0.6, 0.05, 0.05, 0]})
    loss = YOLOv3Loss(cfg)
    _, bd, _ = loss(heads, t, jnp.asarray(10 ** 9, jnp.int32))
    obj = np.asarray(bd["obj_iou_loss"])
    assert int((obj > 0).sum()) == 1


# ---------------------------------------------------------------------- #
# Pairwise composition sweep: every pair of loss-variant flags (incl. the
# box_weights hook) must match the oracle when enabled TOGETHER — the
# single-flag tests above cannot catch an interaction bug (e.g. a branch
# that reads the wrong channel index only when gaussian re-layouts raw).
_FLAGS = ("focal", "tiou", "smooth", "ghm", "giou", "gaussian", "bw")
# mutually exclusive pairs (YOLOv3Loss.__init__ raises): giou/gaussian
# both replace the coord pair; focal/ghm both re-weight the confidence CE
_PAIRS = [(a, b) for i, a in enumerate(_FLAGS) for b in _FLAGS[i + 1:]
          if {a, b} not in ({"giou", "gaussian"}, {"focal", "ghm"})]


@pytest.mark.parametrize("fa,fb", _PAIRS)
def test_flag_pair_compositions_match_oracle(fa, fb):
    on = {fa, fb}
    cfg = _mk_cfg(class_num=3,
                  is_focal_loss="focal" in on,
                  is_tiou_recall="tiou" in on,
                  is_label_smoothing="smooth" in on,
                  is_gradient_harmonized="ghm" in on,
                  is_giou_loss="giou" in on,
                  is_gaussian_yolo="gaussian" in on,
                  rectified_coord_num=100)
    # deterministic per-pair seed (hash() is salted per process — a
    # seed-dependent failure would be unreproducible across runs)
    heads = _random_heads(
        cfg, 2, seed=1 + _FLAGS.index(fa) * len(_FLAGS) + _FLAGS.index(fb))
    targets = _targets(2, 3, {
        (0, 0): [0.5, 0.5, 0.25, 0.3, 1],
        (0, 1): [0.2, 0.7, 0.1, 0.15, 0],
        (1, 0): [0.8, 0.3, 0.4, 0.5, 2],
    })
    bw = None
    if "bw" in on:
        bw = jnp.asarray([[0.3, 0.9, 1.0], [0.6, 1.0, 1.0]], jnp.float32)
    loss = YOLOv3Loss(cfg)
    total, bd, cnt = jax.jit(loss)(heads, targets,
                                   jnp.asarray(0, jnp.int32),
                                   box_weights=bw)
    ref_total, ref_bd, ref_cnt = reference_loss(
        [np.asarray(h) for h in heads], np.asarray(targets), cfg,
        image_count=0,
        box_weights=None if bw is None else np.asarray(bw))
    np.testing.assert_allclose(float(total), ref_total, rtol=3e-4)
    got = np.stack([np.asarray(bd[k]) for k in (
        "rectified_coord_loss", "coord_loss_xy", "coord_loss_wh",
        "noobj_iou_loss", "obj_iou_loss", "class_loss")])
    np.testing.assert_allclose(got, ref_bd, rtol=3e-3, atol=1e-5)
    # every composition must also be trainable: finite gradients
    g = jax.grad(lambda hs: loss(hs, targets, jnp.asarray(0, jnp.int32),
                                 box_weights=bw)[0])(heads)
    assert all(bool(jnp.isfinite(x).all()) for x in g)
