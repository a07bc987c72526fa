"""Fuzz the vectorized loss against the NumPy oracle across random
geometries: anchor counts per head, grid sizes, batch sizes, object counts
(including zero), class counts, and option flags."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from yolov3_tensorflow_tpu.config import Config
from yolov3_tensorflow_tpu.ops.loss import YOLOv3Loss

from .reference_loss import reference_loss

KEYS = ("rectified_coord_loss", "coord_loss_xy", "coord_loss_wh",
        "noobj_iou_loss", "obj_iou_loss", "class_loss")


@pytest.mark.parametrize("trial", range(8))
def test_fuzz_matches_oracle(trial):
    rng = np.random.RandomState(100 + trial)
    size = int(rng.choice([32, 64])), int(rng.choice([32, 64, 96]))
    class_num = int(rng.choice([0, 1, 4]))
    n = int(rng.choice([1, 2, 3]))
    m = int(rng.choice([2, 5]))
    anchors = tuple(
        tuple((float(rng.uniform(0.05, 0.9)), float(rng.uniform(0.05, 0.9)))
              for _ in range(rng.randint(1, 4)))
        for _ in range(3))
    cfg = Config(
        input_image_size=(size[0], size[1], 3), max_boxes=m,
        anchor_boxes=anchors, class_num=class_num,
        is_focal_loss=bool(rng.randint(2)),
        is_tiou_recall=bool(rng.randint(2)),
        rectified_coord_num=int(rng.choice([-1, 100])),
    )
    heads = [jnp.asarray(0.7 * rng.randn(n, h, w, c).astype(np.float32))
             for (h, w), c in zip(cfg.head_grid_sizes,
                                  cfg.head_channel_nums)]
    targets = -np.ones((n, m, 5), np.float32)
    for i in range(n):
        for j in range(rng.randint(0, m + 1)):
            bw, bh = rng.uniform(0.05, 0.6, 2)
            cx = rng.uniform(bw / 2, 1 - bw / 2)
            cy = rng.uniform(bh / 2, 1 - bh / 2)
            targets[i, j] = [cx, cy, bw, bh, rng.randint(
                0, max(class_num, 1))]
    targets_j = jnp.asarray(targets)

    loss = YOLOv3Loss(cfg)
    total, bd, cnt = jax.jit(loss)(heads, targets_j,
                                   jnp.asarray(0, jnp.int32))
    ref_total, ref_bd, ref_cnt = reference_loss(
        [np.asarray(h) for h in heads], targets, cfg, image_count=0)
    np.testing.assert_allclose(float(total), ref_total, rtol=5e-4,
                               err_msg=f"cfg trial {trial}: {anchors}")
    got = np.stack([np.asarray(bd[k]) for k in KEYS])
    np.testing.assert_allclose(got, ref_bd, rtol=5e-3, atol=1e-4)
    assert int(cnt) == ref_cnt
