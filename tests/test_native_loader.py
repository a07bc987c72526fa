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
