"""Host-side data pipeline.

TPU-native re-design of the reference's tf.data input path
(dataset/file_util.py:14-114): a NumPy/PIL loader feeding the device via a
background prefetch thread.  Photometric augmentation is NOT done here — it
runs on-device inside the jitted train step (see data/augment.py), which is
both faster (VPU) and keeps the single host core free for JPEG decode.

Behavioural parity:
  * label.txt line format ``image_name cx cy w h class ...`` with normalized
    cxcywh (file_util.py:22-32, 63-76)
  * aspect-preserving letterbox resize to (H, W) with NEAREST, centred pad
    (file_util.py:54-55, matching tf.image.resize_image_with_pad's
    floor-based geometry)
  * matching label transform xy*ratio + (1-ratio)/2, wh*ratio
    (file_util.py:47-52)
  * float32 [0,1] conversion then RGB->BGR channel reversal
    (file_util.py:58-59) — BGR is the network's channel order
  * labels padded with -1 (file_util.py:95-97) — here to the static
    ``max_boxes`` length so shapes under jit are static
  * test mode additionally yields image paths (file_util.py:99-104)
"""
from __future__ import annotations

import logging
import os
import queue
import threading
from typing import Iterator, List, NamedTuple, Optional, Tuple

import numpy as np
from PIL import Image

from ..config import Config


class Example(NamedTuple):
    path: str
    labels: np.ndarray  # (K, 5) normalized [cx, cy, w, h, class]


class Batch(NamedTuple):
    images: np.ndarray  # (N, H, W, 3) uint8 BGR (normalized on-device)
    labels: np.ndarray  # (N, max_boxes, 5) float32, -1 padded
    paths: Optional[Tuple[str, ...]] = None

    def images_float(self) -> np.ndarray:
        """Host-side float view for visualization (the device path
        normalizes inside the jitted step)."""
        if self.images.dtype == np.uint8:
            return self.images.astype(np.float32) / 255.0
        return self.images


def parse_label_file(file_path: str, root_path: str) -> List[Example]:
    """Parse the label txt (file_util.py:22-32).  Lines with no boxes are
    kept with an empty (0, 5) label array."""
    examples = []
    with open(file_path, "r") as f:
        for line in f:
            # split() (not split(' ')) skips repeated whitespace/tabs, like
            # the reference's tf.string_split
            parts = line.split()
            if not parts:
                continue
            vals = np.asarray([float(v) for v in parts[1:]], np.float32)
            labels = vals.reshape(-1, 5) if vals.size else np.zeros(
                (0, 5), np.float32)
            examples.append(Example(os.path.join(root_path, parts[0]),
                                    labels))
    return examples


def letterbox_geometry(src_hw: Tuple[int, int],
                       dst_hw: Tuple[int, int]):
    """Replicate tf.image.resize_image_with_pad geometry: scale by the
    limiting axis (floor to int), centre with floor-divided padding."""
    sh, sw = src_hw
    dh, dw = dst_hw
    ratio = min(dh / sh, dw / sw)
    # clamp to >=1 pixel: an extreme-aspect source (4000x8 into 416x416)
    # floors one axis to 0, which would divide by zero in the NEAREST
    # index map; native/loader.cc clamps identically
    rh = max(1, int(np.floor(sh * ratio)))
    rw = max(1, int(np.floor(sw * ratio)))
    pt, pl = (dh - rh) // 2, (dw - rw) // 2
    return (rh, rw), (pt, pl)


def transform_labels(labels: np.ndarray, src_hw, dst_hw) -> np.ndarray:
    """Label geometry for the letterbox (file_util.py:47-52):
    ratio_wh = (src/dst per axis) / max(...); xy*r + (1-r)/2; wh*r."""
    if labels.size == 0:
        return labels
    src_over_dst = np.array([src_hw[0] / dst_hw[0], src_hw[1] / dst_hw[1]],
                            np.float32)  # [h, w]
    ratio_wh = src_over_dst[::-1] / src_over_dst.max()  # [w, h]
    out = labels.copy()
    out[:, 0:2] = labels[:, 0:2] * ratio_wh + (1.0 - ratio_wh) / 2.0
    out[:, 2:4] = labels[:, 2:4] * ratio_wh
    return out


def letterbox_array(arr: np.ndarray, dst_hw: Tuple[int, int],
                    as_float: bool = True) -> np.ndarray:
    """NEAREST letterbox of a decoded RGB uint8 (H, W, 3) array -> BGR
    (file_util.py:44-59).  The decode-independent half of
    :func:`load_image`, shared with in-memory sources (the serving
    runtime decodes request bytes, infer/server.py).

    Uses the explicit center convention floor((i+0.5)*src/dst): PIL's own
    resize differs by one pixel at exact-integer boundaries (last-ulp
    affine math), and the native C++ loader must be bit-equal to this
    path — so all implementations use this same formula."""
    sh, sw = arr.shape[:2]
    (rh, rw), (pt, pl) = letterbox_geometry((sh, sw), dst_hw)
    ymap = np.minimum(((np.arange(rh) + 0.5) * (sh / rh)).astype(np.int64),
                      sh - 1)
    xmap = np.minimum(((np.arange(rw) + 0.5) * (sw / rw)).astype(np.int64),
                      sw - 1)
    resized = arr[ymap][:, xmap]
    canvas = np.zeros((dst_hw[0], dst_hw[1], 3), np.uint8)
    canvas[pt:pt + rh, pl:pl + rw] = resized
    bgr = canvas[..., ::-1]
    if as_float:
        return bgr.astype(np.float32) / 255.0
    return bgr.copy()


def load_image(path: str, dst_hw: Tuple[int, int],
               as_float: bool = True) -> np.ndarray:
    """JPEG decode -> NEAREST letterbox -> BGR (file_util.py:44-59).

    as_float=True gives the reference's float32 [0,1]; as_float=False keeps
    uint8 — the Dataset ships uint8 to the device (4x less host->device
    traffic and RAM) and the train step normalizes on-device."""
    img = Image.open(path).convert("RGB")
    return letterbox_array(np.asarray(img, np.uint8), dst_hw, as_float)


def pad_labels(labels: np.ndarray, max_boxes: int) -> np.ndarray:
    """-1 padding to a static length (file_util.py:97, made static)."""
    out = -np.ones((max_boxes, 5), np.float32)
    k = min(len(labels), max_boxes)
    if k:
        out[:k] = labels[:k]
    return out


CACHE_AUTO_LIMIT_BYTES = 2 << 30  # "auto" RAM-caches only sets under 2 GiB


class Dataset:
    """Shuffling, repeating, prefetching batch iterator.

    Equivalent of FileUtil.get_dataset (file_util.py:63-114).  Decoded
    letterboxed images are RAM-cached when the whole set fits a 2 GiB
    budget (``cache="auto"``, right for the bundled 20-image sample) and
    streamed uncached otherwise — a 10k-image corpus must not pin ~5 GB of
    host RAM.  Shuffling is a full epoch permutation of INDICES (no image
    buffer), strictly stronger than the reference's 5x-batch shuffle
    buffer (file_util.py:78-79) at zero RAM cost.
    """

    def __init__(self, cfg: Config, label_path: str, root_path: str,
                 is_test: bool = False, cache="auto",
                 shuffle: bool = True, seed: int = 6,
                 dst_hw: Optional[Tuple[int, int]] = None,
                 shard: Optional[Tuple[int, int]] = None):
        self.cfg = cfg
        self.examples = parse_label_file(label_path, root_path)
        if not self.examples:
            raise ValueError(f"no examples parsed from {label_path}")
        # multi-host input sharding (the tf.data Dataset.shard analog):
        # shard=(process_index, process_count) keeps each host's example
        # set disjoint so the per-host batches assemble into a global
        # batch with no duplicated samples.  global_size stays the FULL
        # corpus size — steps_per_epoch derivations must count the
        # global epoch, not one host's slice.
        self.global_size = len(self.examples)
        if shard is not None:
            index, count = shard
            if not 0 <= index < count:
                raise ValueError(f"shard index {index} outside [0, {count})")
            self.examples = self.examples[index::count]
            if not self.examples:
                raise ValueError(
                    f"shard {index}/{count} of {self.global_size} examples "
                    "is empty — fewer images than hosts")
        self.dst_hw = dst_hw or (cfg.input_image_size[0],
                                 cfg.input_image_size[1])
        self.is_test = is_test
        self.shuffle = shuffle
        self.rng = np.random.RandomState(seed)
        if cache == "auto":
            need = len(self.examples) * self.dst_hw[0] * self.dst_hw[1] * 3
            cache = need <= CACHE_AUTO_LIMIT_BYTES
            if not cache:
                logging.info(
                    "dataset of %d images (~%.1f GB decoded) exceeds the "
                    "auto-cache budget; streaming uncached",
                    len(self.examples), need / 1e9)
        self._cache = {} if cache else None
        self._native_failed: set = set()  # warn once per bad image
        self._native_warned = False
        # transformed labels are deterministic per example: precompute.
        # Image.open is a lazy header read (size only, no decode); a
        # missing/unreadable file drops THAT example with a warning —
        # one bad label.txt line must not kill the whole constructor
        # (mirrors _fetch_batch_images' per-image fallback; the
        # reference's check_label_file.py pre-filter stays available).
        self._labels = []
        overflow = 0
        kept, dropped = [], []
        for ex in self.examples:
            try:
                with Image.open(ex.path) as im:
                    sw, sh = im.size
            except (OSError, ValueError):
                dropped.append(ex.path)
                continue
            kept.append(ex)
            t = transform_labels(ex.labels, (sh, sw), self.dst_hw)
            if len(t) > cfg.max_boxes:
                overflow += 1
            self._labels.append(pad_labels(t, cfg.max_boxes))
        if dropped:
            logging.warning(
                "%d/%d listed images are missing/unreadable and were "
                "dropped (first: %s)", len(dropped), len(self.examples),
                dropped[0])
            self.examples = kept
            if not self.examples:
                raise ValueError(f"no readable images from {label_path}")
        if overflow:
            # the static pad bound drops ground truth silently otherwise —
            # the reference pads dynamically with no cap (file_util.py:97)
            logging.warning(
                "%d/%d examples exceed cfg.max_boxes=%d; excess ground-truth "
                "boxes are DROPPED from training/eval. Raise Config.max_boxes "
                "to cover the densest image.",
                overflow, len(self.examples), cfg.max_boxes)

    def __len__(self):
        return len(self.examples)

    def _image(self, idx: int) -> np.ndarray:
        if self._cache is not None and idx in self._cache:
            return self._cache[idx]
        img = load_image(self.examples[idx].path, self.dst_hw,
                         as_float=False)
        if self._cache is not None:
            self._cache[idx] = img
        return img

    def _fetch_batch_images(self, idx) -> np.ndarray:
        """Decode a batch, preferring the native C++ loader (one threaded
        call, bit-exact with the PIL path; see data/native_loader.py).
        Per-image failures (corrupt/CMYK JPEGs) fall back to PIL for
        THAT image only — one bad file must not push every batch that
        contains it onto the ~10x-slower all-PIL path."""
        missing = [int(i) for i in idx
                   if self._cache is None or int(i) not in self._cache]
        decoded = {}
        if missing:
            try:
                from . import native_loader
                if native_loader.available():
                    imgs, _, status = native_loader.decode_letterbox_batch(
                        [self.examples[i].path for i in missing],
                        self.dst_hw, strict=False)
                    for k, i in enumerate(missing):
                        if status[k] == 0:
                            decoded[i] = imgs[k]
                        elif i not in self._native_failed:
                            self._native_failed.add(i)
                            logging.warning(
                                "native decode failed for %s (status %d); "
                                "PIL fallback for this image",
                                self.examples[i].path, int(status[k]))
            except Exception:
                if not self._native_warned:
                    self._native_warned = True
                    logging.warning("native loader call failed; "
                                    "PIL fallback", exc_info=True)
            if self._cache is not None:
                self._cache.update(decoded)
        if self._cache is not None:
            return np.stack([self._image(i) for i in idx])
        return np.stack([decoded[int(i)] if int(i) in decoded
                         else self._image(i) for i in idx])

    def batches(self, batch_size: Optional[int] = None,
                repeat: bool = True) -> Iterator[Batch]:
        bs = batch_size or self.cfg.batch_size
        n = len(self.examples)
        order = np.arange(n)
        while True:
            if self.shuffle:
                self.rng.shuffle(order)
            for start in range(0, n, bs):
                idx = order[start:start + bs]
                if len(idx) < bs:  # wrap to keep shapes static
                    # np.resize tiles: full fill even when bs > 2*n
                    idx = np.concatenate(
                        [idx, np.resize(order, bs - len(idx))])
                images = self._fetch_batch_images(idx)
                labels = np.stack([self._labels[i] for i in idx])
                paths = tuple(self.examples[i].path for i in idx) \
                    if self.is_test else None
                yield Batch(images, labels, paths)
            if not repeat:
                return

    def device_prefetch(self, batch_size: Optional[int] = None,
                        repeat: bool = True, depth: int = 2,
                        host_depth: int = 2,
                        shardings: Optional[Tuple] = None) -> Iterator[Batch]:
        """Host prefetch + double-buffered async device transfer: the next
        batch's host->device copy overlaps the current step's compute
        (jax.device_put is asynchronous).

        ``shardings``: optional (image_sharding, label_sharding) pair —
        the trainer's ``input_shardings``.  With it, every transfer lands
        each batch shard DIRECTLY on its mesh device instead of device 0
        (a jitted step with sharded in_shardings otherwise reshards the
        committed array through an extra device-to-device copy), and on a
        multi-process runtime the per-host batch is assembled into the
        global array via ``jax.make_array_from_process_local_data`` —
        construct the Dataset with ``shard=(process_index, process_count)``
        and a per-host ``batch_size`` of global/process_count there.
        """
        import jax

        if shardings is None:
            put_img = put_lab = jax.device_put
        else:
            img_s, lab_s = shardings
            if jax.process_count() > 1:
                def put_img(x):
                    return jax.make_array_from_process_local_data(img_s, x)

                def put_lab(x):
                    return jax.make_array_from_process_local_data(lab_s, x)
            else:
                def put_img(x):
                    return jax.device_put(x, img_s)

                def put_lab(x):
                    return jax.device_put(x, lab_s)

        queue_: "list" = []
        for b in self.prefetch(batch_size, repeat, host_depth):
            queue_.append(Batch(put_img(b.images), put_lab(b.labels),
                                b.paths))
            if len(queue_) >= depth:
                yield queue_.pop(0)
        while queue_:
            yield queue_.pop(0)

    def prefetch(self, batch_size: Optional[int] = None, repeat: bool = True,
                 depth: int = 2) -> Iterator[Batch]:
        """Background-thread prefetch (the tf.data prefetch(AUTOTUNE)
        analog, file_util.py:113).

        Worker exceptions RE-RAISE in the consumer (a mid-run decode/IO
        error must not masquerade as a clean end-of-stream and silently
        truncate training), and closing/abandoning the generator stops
        the worker and releases its queued batches (an abandoned
        repeat=True iterator otherwise pins depth+1 decoded batches and
        a thread forever)."""
        q: "queue.Queue" = queue.Queue(maxsize=depth)
        cancel = threading.Event()

        class _End:
            def __init__(self, err=None):
                self.err = err

        def _put(item) -> bool:
            while not cancel.is_set():
                try:
                    q.put(item, timeout=0.2)
                    return True
                except queue.Full:
                    continue
            return False

        def worker():
            try:
                for b in self.batches(batch_size, repeat):
                    if not _put(b):
                        return
                _put(_End())
            except BaseException as e:  # pragma: no cover - raced IO
                _put(_End(e))

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if isinstance(item, _End):
                    if item.err is not None:
                        raise item.err
                    return
                yield item
        finally:
            cancel.set()
            while True:  # unblock a q.put-blocked worker promptly
                try:
                    q.get_nowait()
                except queue.Empty:
                    break
