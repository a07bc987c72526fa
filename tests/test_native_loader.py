"""Native C++ loader: bit-exactness vs the PIL path, error handling, and
Dataset integration (with graceful fallback when the toolchain is absent)."""
import numpy as np
import pytest

from yolov3_tensorflow_tpu.data import native_loader
from yolov3_tensorflow_tpu.data.loader import Dataset, load_image

pytestmark = pytest.mark.skipif(not native_loader.available(),
                                reason="native loader not built")


def test_bit_exact_vs_pil(sample_paths):
    import glob
    paths = sorted(glob.glob(f"{sample_paths['images']}/*.jpg"))[:8]
    imgs, dims = native_loader.decode_letterbox_batch(paths, (96, 128))
    assert imgs.shape == (8, 96, 128, 3) and imgs.dtype == np.uint8
    for k, p in enumerate(paths):
        ref = load_image(p, (96, 128), as_float=False)
        np.testing.assert_array_equal(imgs[k], ref)


def test_dims_reported(sample_paths):
    paths = [f"{sample_paths['images']}/000001.jpg"]
    _, dims = native_loader.decode_letterbox_batch(paths, (64, 64))
    from PIL import Image
    with Image.open(paths[0]) as im:
        assert tuple(dims[0]) == (im.size[1], im.size[0])


def test_missing_file_raises(tmp_path):
    with pytest.raises(RuntimeError):
        native_loader.decode_letterbox_batch(
            [str(tmp_path / "nope.jpg")], (64, 64))


def test_dataset_uses_native(sample_paths):
    from yolov3_tensorflow_tpu.config import Config
    cfg = Config(input_image_size=(96, 128, 3), max_boxes=8, batch_size=4)
    ds_native = Dataset(cfg, sample_paths["label"], sample_paths["images"],
                        shuffle=False)
    b = next(ds_native.batches(repeat=False))
    # must equal the PIL path exactly
    ref = np.stack([load_image(ds_native.examples[i].path, (96, 128),
                               as_float=False) for i in range(4)])
    np.testing.assert_array_equal(b.images, ref)


def test_extreme_aspect_clamps_and_matches_pil(tmp_path):
    """A source whose limiting-axis floor would be 0 resized pixels
    (4000x8 -> 416x416) must clamp to 1 px in BOTH paths — previously
    PIL divided by zero while native emitted an all-black image."""
    from PIL import Image
    wide = str(tmp_path / "wide.jpg")
    tall = str(tmp_path / "tall.jpg")
    Image.fromarray(np.full((8, 4000, 3), 200, np.uint8)).save(wide)
    Image.fromarray(np.full((4000, 8, 3), 200, np.uint8)).save(tall)
    for p in (wide, tall):
        imgs, _, status = native_loader.decode_letterbox_batch(
            [p], (416, 416), strict=False)
        assert status[0] == 0 and imgs[0].sum() > 0
        ref = load_image(p, (416, 416), as_float=False)
        np.testing.assert_array_equal(imgs[0], ref)


def test_truncated_jpeg_rejected(tmp_path, sample_paths):
    """libjpeg reports a truncated stream as a WARNING and pads with
    garbage rows; the loader must surface it as a nonzero status (the
    Dataset then falls back per-image to PIL, which raises) instead of
    silently training on the padded image."""
    src = open(f"{sample_paths['images']}/000001.jpg", "rb").read()
    p = str(tmp_path / "trunc.jpg")
    open(p, "wb").write(src[:len(src) // 2])
    _, _, status = native_loader.decode_letterbox_batch(
        [p], (96, 128), strict=False)
    assert status[0] != 0
    with pytest.raises(Exception):
        load_image(p, (96, 128), as_float=False)  # PIL agrees: reject


def test_non_utf8_filename(tmp_path, sample_paths):
    """os.fsencode round-trips surrogateescape filenames; str.encode
    previously raised and dumped the whole batch onto the PIL path."""
    import os
    import shutil
    raw = b"caf\xe9.jpg"  # latin-1, not valid UTF-8
    dst = os.path.join(os.fsdecode(bytes(tmp_path)), os.fsdecode(raw))
    shutil.copy(f"{sample_paths['images']}/000001.jpg", dst)
    imgs, _ = native_loader.decode_letterbox_batch([dst], (64, 64))
    assert imgs.shape == (1, 64, 64, 3) and imgs.sum() > 0
