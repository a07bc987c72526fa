"""Synthetic detection dataset generator.

The reference ships a 20-image COCO subset as its train/val/test fixture
(dataset/test_sample, configs.py:31-34).  That data cannot be vendored
here, so this tool generates an equivalent self-contained fixture:
JPEG images of colored rectangles/ellipses on textured backgrounds with a
matching ``label.txt`` (``image cx cy w h class ...`` normalized, the
reference's format) and ``class.txt``.

Deterministic given the seed, so tests and demos are reproducible.
"""
from __future__ import annotations

import argparse
import os

import numpy as np

CLASS_NAMES = ["box", "disc", "bar"]


def _draw_rect(img, x0, y0, x1, y1, color):
    img[y0:y1, x0:x1] = color


def _draw_ellipse(img, cx, cy, rx, ry, color):
    h, w = img.shape[:2]
    ys, xs = np.ogrid[:h, :w]
    mask = ((xs - cx) / max(rx, 1)) ** 2 + ((ys - cy) / max(ry, 1)) ** 2 <= 1
    img[mask] = color


def generate(out_dir: str, num_images: int = 20, size=(480, 384),
             seed: int = 6, max_objects: int = 5):
    """size: (W, H) of generated images."""
    from PIL import Image

    rng = np.random.RandomState(seed)
    w, h = size
    img_dir = os.path.join(out_dir, "images")
    os.makedirs(img_dir, exist_ok=True)
    lines = []
    for idx in range(num_images):
        # textured background
        base = rng.randint(40, 200, 3)
        img = (base + rng.randint(-30, 30, (h, w, 3))).clip(
            0, 255).astype(np.uint8)
        n_obj = rng.randint(1, max_objects + 1)
        labels = []
        for _ in range(n_obj):
            cls = rng.randint(0, len(CLASS_NAMES))
            bw = rng.randint(w // 10, w // 3)
            bh = rng.randint(h // 10, h // 3)
            if cls == 2:  # bar: wide and short
                bw, bh = max(bw, w // 4), max(h // 16, bh // 3)
            cx = rng.randint(bw // 2, w - bw // 2)
            cy = rng.randint(bh // 2, h - bh // 2)
            color = rng.randint(0, 255, 3)
            x0, y0 = cx - bw // 2, cy - bh // 2
            if cls == 1:
                _draw_ellipse(img, cx, cy, bw // 2, bh // 2, color)
            else:
                _draw_rect(img, x0, y0, x0 + bw, y0 + bh, color)
            labels.append((cx / w, cy / h, bw / w, bh / h, cls))
        name = f"{idx + 1:06d}.jpg"
        Image.fromarray(img).save(os.path.join(img_dir, name), quality=92)
        parts = [name] + [
            f"{cx} {cy} {bw} {bh} {cls}" for cx, cy, bw, bh, cls in labels]
        lines.append(" ".join(parts))
    with open(os.path.join(out_dir, "label.txt"), "w") as f:
        f.write("\n".join(lines) + "\n")
    with open(os.path.join(out_dir, "class.txt"), "w") as f:
        f.write("\n".join(CLASS_NAMES) + "\n")
    return out_dir


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("out_dir")
    p.add_argument("--num_images", type=int, default=20)
    p.add_argument("--size", default="480x384", help="WxH")
    p.add_argument("--seed", type=int, default=6)
    a = p.parse_args(argv)
    w, h = (int(v) for v in a.size.split("x"))
    generate(a.out_dir, a.num_images, (w, h), a.seed)
    print(f"wrote {a.num_images} images + label.txt to {a.out_dir}")


if __name__ == "__main__":
    main()
