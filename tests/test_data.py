"""Data pipeline: letterbox parity with tf.image.resize_with_pad, label
transform math (dataset/file_util.py:47-55), loader invariants, and
augmentation bounds (dataset/dataset_util.py)."""
import time

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from yolov3_tensorflow_tpu.config import Config
from yolov3_tensorflow_tpu.data.augment import augment_batch
from yolov3_tensorflow_tpu.data.loader import (Dataset, letterbox_geometry,
                                               load_image, pad_labels,
                                               parse_label_file,
                                               transform_labels)


def test_letterbox_geometry_matches_tf():
    tf = pytest.importorskip("tensorflow")
    rng = np.random.RandomState(0)
    for (sh, sw) in [(100, 200), (375, 500), (333, 500), (480, 640),
                     (50, 50), (800, 100)]:
        img = rng.randint(0, 255, (sh, sw, 3), np.uint8)
        ours_hw, (pt, pl) = letterbox_geometry((sh, sw), (384, 480))
        tf_out = tf.image.resize_with_pad(
            tf.constant(img), 384, 480,
            method=tf.image.ResizeMethod.NEAREST_NEIGHBOR).numpy()
        # the non-padding region extents must agree
        mask = tf_out.sum(axis=-1) > 0
        rows = np.where(mask.any(axis=1))[0]
        cols = np.where(mask.any(axis=0))[0]
        if len(rows):
            assert abs(int(rows[0]) - pt) <= 1
            assert abs(int(rows[-1]) - (pt + ours_hw[0] - 1)) <= 1
        if len(cols):
            assert abs(int(cols[0]) - pl) <= 1
            assert abs(int(cols[-1]) - (pl + ours_hw[1] - 1)) <= 1


def test_label_transform_math():
    # src 200x100 (h x w) -> dst 100x100: width is the limiting... ratio
    # per reference: src_over_dst = [2.0, 1.0]; ratio_wh = [0.5, 1.0]
    labels = np.asarray([[0.5, 0.5, 0.2, 0.4, 1.0]], np.float32)
    out = transform_labels(labels, (200, 100), (100, 100))
    np.testing.assert_allclose(out[0], [0.5, 0.5, 0.1, 0.4, 1.0], atol=1e-6)
    # centred: cx' = cx*r + (1-r)/2 keeps the centre of a centred box
    labels = np.asarray([[0.0, 0.5, 0.2, 0.4, 1.0]], np.float32)
    out = transform_labels(labels, (200, 100), (100, 100))
    np.testing.assert_allclose(out[0, 0], 0.25, atol=1e-6)


def test_loader_on_reference_sample(sample_paths):
    cfg = Config(input_image_size=(96, 128, 3), max_boxes=8, batch_size=4)
    ds = Dataset(cfg, sample_paths["label"], sample_paths["images"])
    assert len(ds) == 20
    batch = next(ds.batches())
    assert batch.images.shape == (4, 96, 128, 3)
    assert batch.labels.shape == (4, 8, 5)
    assert batch.images.dtype == np.uint8  # normalized on-device
    f = batch.images_float()
    assert f.dtype == np.float32
    assert 0.0 <= f.min() and f.max() <= 1.0
    # -1 padding only in trailing rows
    for lab in batch.labels:
        valid = lab[:, 0] >= 0
        k = int(valid.sum())
        assert valid[:k].all() and not valid[k:].any()
    # test-mode batches carry paths
    ds_t = Dataset(cfg, sample_paths["label"], sample_paths["images"],
                   is_test=True, shuffle=False)
    b = next(ds_t.batches(repeat=False))
    assert b.paths is not None and len(b.paths) == 4
    assert b.paths[0].endswith("000001.jpg")


def test_bgr_channel_order(sample_paths):
    """file_util.py:59 reverses RGB->BGR."""
    from PIL import Image
    path = f"{sample_paths['images']}/000001.jpg"
    img = load_image(path, (384, 480))
    rgb = np.asarray(Image.open(path).convert("RGB"), np.float32) / 255.0
    # compare channel means: loaded[...,2] should match the RGB red mean
    inner = img[img.sum(axis=-1) > 0]
    assert abs(inner[:, 2].mean() - rgb[..., 0].mean()) < 0.05
    assert abs(inner[:, 0].mean() - rgb[..., 2].mean()) < 0.05


def test_pad_labels_truncates():
    lab = np.tile(np.asarray([[0.5, 0.5, 0.1, 0.1, 0]], np.float32), (6, 1))
    out = pad_labels(lab, 4)
    assert out.shape == (4, 5)
    assert (out[:, 0] >= 0).all()


def test_augment_bounds_and_variety():
    rng = jax.random.PRNGKey(0)
    imgs = jnp.asarray(np.random.RandomState(0).rand(8, 32, 32, 3)
                       .astype(np.float32))
    out = jax.jit(augment_batch)(rng, imgs)
    assert out.shape == imgs.shape
    assert float(out.min()) >= 0.0 and float(out.max()) <= 1.0
    # different key -> different augmentation
    out2 = jax.jit(augment_batch)(jax.random.PRNGKey(1), imgs)
    assert not np.allclose(np.asarray(out), np.asarray(out2))
    # same key -> deterministic
    out3 = jax.jit(augment_batch)(rng, imgs)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out3))


def test_parse_label_file(sample_paths):
    ex = parse_label_file(sample_paths["label"], sample_paths["images"])
    assert len(ex) == 20
    assert ex[0].labels.shape == (2, 5)  # 000001.jpg has two objects
    assert ex[3].labels.shape == (7, 5)  # 000004.jpg has seven


def test_cache_auto_streams_large_corpora(sample_paths, tmp_path):
    """cache="auto" caches the 20-image sample but streams a synthetic
    10k-line corpus (the RAM landmine from VERDICT r1 item 5)."""
    cfg = Config(input_image_size=(96, 128, 3), max_boxes=8, batch_size=4)
    small = Dataset(cfg, sample_paths["label"], sample_paths["images"])
    assert small._cache is not None  # 20 images fit the auto budget

    # fabricate a big label file reusing the sample images (paths repeat;
    # decoded footprint 10k * 416*416*3 would be ~5 GB)
    big_cfg = Config(input_image_size=(416, 416, 3), max_boxes=8,
                     batch_size=4)
    lines = open(sample_paths["label"]).read().splitlines()
    biglabel = tmp_path / "label.txt"
    biglabel.write_text("\n".join(lines[i % len(lines)]
                                  for i in range(10_000)))
    big = Dataset(big_cfg, str(biglabel), sample_paths["images"])
    assert big._cache is None  # streams uncached
    b = next(big.batches())
    assert b.images.shape == (4, 416, 416, 3)
    # explicit override still wins
    forced = Dataset(big_cfg, str(biglabel), sample_paths["images"],
                     cache=True)
    assert forced._cache is not None


def test_batch_wrap_fills_when_batch_exceeds_twice_dataset(sample_paths):
    """The static-shape wrap must tile the index order: with
    batch_size > 2*len(dataset) the old order[:bs-len] pad under-filled
    the batch, silently breaking the promised static shape."""
    cfg = Config(input_image_size=(96, 128, 3), max_boxes=8, batch_size=48)
    ds = Dataset(cfg, sample_paths["label"], sample_paths["images"])
    assert len(ds) == 20
    batch = next(ds.batches(repeat=False))
    assert batch.images.shape == (48, 96, 128, 3)
    assert batch.labels.shape == (48, 8, 5)


def test_prefetch_propagates_worker_errors(sample_paths):
    """A mid-run decode/IO failure must raise in the consumer, not
    masquerade as a clean end-of-stream that silently truncates
    training."""
    cfg = Config(input_image_size=(96, 128, 3), max_boxes=8, batch_size=4)
    ds = Dataset(cfg, sample_paths["label"], sample_paths["images"])

    def boom(*a, **kw):
        raise OSError("disk went away")

    ds._fetch_batch_images = boom
    it = ds.prefetch()
    with pytest.raises(OSError, match="disk went away"):
        next(it)


def test_prefetch_close_stops_worker(sample_paths):
    """Abandoning a repeat=True prefetch iterator must stop its worker
    thread (no leaked thread pinning depth+1 decoded batches)."""
    import threading

    cfg = Config(input_image_size=(96, 128, 3), max_boxes=8, batch_size=4)
    ds = Dataset(cfg, sample_paths["label"], sample_paths["images"])
    before = threading.active_count()
    it = ds.prefetch(depth=2)
    next(it)
    it.close()  # GeneratorExit -> cancel event -> worker drains out
    deadline = time.time() + 10
    while threading.active_count() > before and time.time() < deadline:
        time.sleep(0.05)
    assert threading.active_count() <= before


def test_native_per_image_fallback(tmp_path):
    """One undecodable-by-libjpeg image (a PNG disguised as .jpg: PIL
    sniffs the real format, libjpeg errors) must fall back to PIL for
    THAT image only — and the batch must still be correct."""
    from PIL import Image as PILImage

    from yolov3_tensorflow_tpu.data import native_loader
    if not native_loader.available():
        pytest.skip("native loader not built")
    imgdir = tmp_path / "images"
    imgdir.mkdir()
    rng = np.random.RandomState(0)
    lines = []
    for i in range(4):
        arr = rng.randint(0, 255, (40, 60, 3), np.uint8)
        p = imgdir / f"im{i}.jpg"
        PILImage.fromarray(arr).save(
            str(p), format="PNG" if i == 2 else "JPEG")
        lines.append(f"im{i}.jpg 0.5 0.5 0.4 0.4 0")
    label = tmp_path / "label.txt"
    label.write_text("\n".join(lines) + "\n")
    cfg = Config(input_image_size=(64, 64, 3), max_boxes=4, batch_size=4,
                 class_num=13)
    ds = Dataset(cfg, str(label), str(imgdir), cache=False, shuffle=False)
    batch = next(ds.batches(repeat=False))
    assert batch.images.shape == (4, 64, 64, 3)
    # every image matches the pure-PIL reference decode
    from yolov3_tensorflow_tpu.data.loader import load_image
    for k in range(4):
        ref = load_image(str(imgdir / f"im{k}.jpg"), (64, 64),
                         as_float=False)
        np.testing.assert_array_equal(batch.images[k], ref, err_msg=str(k))
    assert 2 in ds._native_failed


def test_mixup_batch_blend_union_weights():
    """mixup (reference roadmap README.md:131): image blend, label
    union, and per-box weights pinned against the documented RNG
    consumption (perm then lam)."""
    from yolov3_tensorflow_tpu.data.augment import mixup_batch

    rng = jax.random.PRNGKey(3)
    n, m = 4, 2
    images = jnp.asarray(
        np.random.RandomState(0).rand(n, 8, 8, 3).astype(np.float32))
    labels = -np.ones((n, m, 5), np.float32)
    for i in range(n):
        labels[i, 0] = [0.5, 0.5, 0.2, 0.3, i]
    labels = jnp.asarray(labels)
    mixed, out_labels, w = mixup_batch(rng, images, labels, 1.5)

    k_perm, k_lam = jax.random.split(rng)
    perm = jax.random.permutation(k_perm, n)
    lam = jax.random.beta(k_lam, 1.5, 1.5, (n,), jnp.float32)
    expect = images * lam[:, None, None, None] \
        + images[perm] * (1 - lam)[:, None, None, None]
    np.testing.assert_allclose(np.asarray(mixed), np.asarray(expect),
                               rtol=1e-6)
    assert out_labels.shape == (n, 2 * m, 5)
    np.testing.assert_array_equal(np.asarray(out_labels[:, :m]),
                                  np.asarray(labels))
    np.testing.assert_array_equal(np.asarray(out_labels[:, m:]),
                                  np.asarray(labels)[np.asarray(perm)])
    # image i's own boxes weigh lam[i], the partner content's 1-lam[i]
    np.testing.assert_allclose(np.asarray(w[:, :m]),
                               np.tile(np.asarray(lam)[:, None], (1, m)))
    np.testing.assert_allclose(np.asarray(w[:, m:]),
                               np.tile(1 - np.asarray(lam)[:, None],
                                       (1, m)))
    assert np.all((np.asarray(lam) > 0) & (np.asarray(lam) < 1))


def test_dataset_drops_unreadable_files(tmp_path, caplog):
    """One bad label.txt line (missing or corrupt image) must drop THAT
    example with a warning, not kill the constructor — mirrors the
    per-image decode fallback (reference pre-filters separately via
    utils/check_label_file.py)."""
    from PIL import Image as PILImage
    imgdir = tmp_path / "images"
    imgdir.mkdir()
    PILImage.fromarray(np.zeros((20, 30, 3), np.uint8)).save(
        str(imgdir / "ok.jpg"))
    (imgdir / "bad.jpg").write_bytes(b"not a jpeg")
    label = tmp_path / "label.txt"
    label.write_text("ok.jpg 0.5 0.5 0.4 0.4 0\n"
                     "bad.jpg 0.5 0.5 0.4 0.4 0\n"
                     "missing.jpg 0.5 0.5 0.4 0.4 0\n")
    cfg = Config(input_image_size=(64, 64, 3), max_boxes=4, batch_size=1,
                 class_num=13)
    ds = Dataset(cfg, str(label), str(imgdir), cache=False, shuffle=False)
    assert len(ds.examples) == 1 and len(ds._labels) == 1
    batch = next(ds.batches(repeat=False))
    assert batch.images.shape == (1, 64, 64, 3)
    # an all-bad list still raises
    label.write_text("missing.jpg 0.5 0.5 0.4 0.4 0\n")
    with pytest.raises(ValueError):
        Dataset(cfg, str(label), str(imgdir), cache=False)


def test_dataset_process_shard_disjoint_union(sample_paths):
    """Multi-host input sharding (the tf.data Dataset.shard analog):
    per-process example sets are disjoint, their union is the corpus,
    and global_size keeps the FULL count for steps_per_epoch math."""
    cfg = Config(input_image_size=(96, 128, 3), max_boxes=8, batch_size=4)
    shards = [Dataset(cfg, sample_paths["label"], sample_paths["images"],
                      shard=(i, 3)) for i in range(3)]
    paths = [set(e.path for e in ds.examples) for ds in shards]
    assert all(ds.global_size == 20 for ds in shards)
    assert sum(len(p) for p in paths) == 20
    assert set.union(*paths) == set(
        e.path for e in Dataset(cfg, sample_paths["label"],
                                sample_paths["images"]).examples)
    for i in range(3):
        for j in range(i + 1, 3):
            assert not (paths[i] & paths[j])
    with pytest.raises(ValueError):
        Dataset(cfg, sample_paths["label"], sample_paths["images"],
                shard=(3, 3))


def test_device_prefetch_sharded_lands_on_mesh(sample_paths):
    """device_prefetch(shardings=...) must produce batches already laid
    out as the jitted step's in_shardings (no implicit device-0 reshard)
    with values identical to the unsharded path."""
    from yolov3_tensorflow_tpu.parallel.mesh import (batch_sharding,
                                                     image_sharding,
                                                     make_mesh)
    cfg = Config(input_image_size=(96, 128, 3), max_boxes=8, batch_size=8)
    mesh = make_mesh(4)
    img_s = image_sharding(mesh)
    lab_s = batch_sharding(mesh)
    ds = Dataset(cfg, sample_paths["label"], sample_paths["images"],
                 shuffle=False)
    b = next(ds.device_prefetch(shardings=(img_s, lab_s), repeat=False))
    assert b.images.sharding.is_equivalent_to(img_s, b.images.ndim)
    assert b.labels.sharding.is_equivalent_to(lab_s, b.labels.ndim)
    assert len({s.device for s in b.images.addressable_shards}) == 4
    ds2 = Dataset(cfg, sample_paths["label"], sample_paths["images"],
                  shuffle=False)
    b2 = next(ds2.device_prefetch(repeat=False))
    np.testing.assert_array_equal(np.asarray(b.images),
                                  np.asarray(b2.images))
    np.testing.assert_array_equal(np.asarray(b.labels),
                                  np.asarray(b2.labels))
