"""COCO instance-annotation JSON -> the framework's label.txt format.

The reference's entire data workflow starts from a text label file of
``image_path cx cy w h cls ...`` rows with box geometry normalized by
the image size (reference README.md:36-40, dataset/file_util.py:22-32).
Its bundled sample was hand-converted from COCO ("取coco数据集中的20张
图片做训练", README.md:20) but no converter ships — anyone migrating a
COCO-format dataset has to write one.  This tool is that converter:

  python -m yolov3_tensorflow_tpu.tools.coco_to_labels \
      instances_train.json --out label.txt [--classes classes.txt]

* COCO bbox [x, y, w, h] (absolute top-left corner + size) becomes
  normalized center/size: cx=(x+w/2)/W, cy=(y+h/2)/H, w/=W, h/=H.
* COCO category ids are sparse (80 classes spread over ids 1..90);
  they are densified to contiguous 0-based ids in ascending id order,
  and the name mapping is written to --classes (one name per line,
  line k = class k — the dataset/test_sample/class.txt convention).
* Images without annotations are skipped by default (the reference's
  loss needs >=0 objects but a 0-object image contributes only noobj
  terms; pass --keep_empty to emit them as path-only rows, which
  data/loader.py reads as 0-box images).
* Degenerate boxes (w<=0 or h<=0 after clamping to the image) and
  ``iscrowd`` regions are dropped, mirroring common detector practice.

No pycocotools dependency — the JSON is parsed directly.
"""
from __future__ import annotations

import argparse
import json
import logging


def convert(coco: dict, keep_empty: bool = False):
    """Returns (lines, class_names): label.txt rows + dense-id names."""
    images = {im["id"]: im for im in coco.get("images", [])}
    cats = sorted(coco.get("categories", []), key=lambda c: c["id"])
    dense = {c["id"]: k for k, c in enumerate(cats)}
    names = [c.get("name", str(c["id"])) for c in cats]

    boxes_by_image = {im_id: [] for im_id in images}
    dropped = 0
    for ann in coco.get("annotations", []):
        if ann.get("iscrowd", 0):
            dropped += 1
            continue
        im = images.get(ann["image_id"])
        if im is None or ann.get("category_id") not in dense:
            # orphan annotation: missing image row or a category_id
            # absent from the categories table — skip, don't traceback
            dropped += 1
            continue
        iw, ih = float(im["width"]), float(im["height"])
        x, y, w, h = (float(v) for v in ann["bbox"])
        # clamp to the image, then reject what degenerates
        x0, y0 = max(x, 0.0), max(y, 0.0)
        x1, y1 = min(x + w, iw), min(y + h, ih)
        if x1 - x0 <= 0 or y1 - y0 <= 0:
            dropped += 1
            continue
        cx = (x0 + x1) / 2.0 / iw
        cy = (y0 + y1) / 2.0 / ih
        bw = (x1 - x0) / iw
        bh = (y1 - y0) / ih
        cls = dense[ann["category_id"]]
        boxes_by_image[ann["image_id"]].append(
            f"{cx:.6f} {cy:.6f} {bw:.6f} {bh:.6f} {cls}")

    lines = []
    empty = 0
    for im_id in sorted(images):
        boxes = boxes_by_image[im_id]
        name = images[im_id]["file_name"]
        if any(c.isspace() for c in name):
            # label.txt rows are whitespace-split (loader.py:63, the
            # reference's tf.string_split) — a path with spaces would
            # silently shear the row into garbage floats
            logging.warning("skipping %r: whitespace in file_name "
                            "cannot be represented in label.txt", name)
            dropped += len(boxes)
            continue
        if boxes:
            lines.append(name + " " + " ".join(boxes))
        elif keep_empty:
            lines.append(name)
            empty += 1
        else:
            empty += 1
    logging.info("converted %d images (%d boxes, %d dropped, %d empty)",
                 len(lines), sum(len(b) for b in boxes_by_image.values()),
                 dropped, empty)
    return lines, names


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("coco_json", help="COCO instances JSON")
    p.add_argument("--out", default="label.txt",
                   help="output label file (reference format)")
    p.add_argument("--classes", default=None,
                   help="write dense-id class names here (class.txt "
                        "convention; default: <out dir>/class.txt)")
    p.add_argument("--keep_empty", action="store_true",
                   help="emit annotation-free images as 0-box rows")
    a = p.parse_args(argv)
    logging.basicConfig(level=logging.INFO)

    import os
    with open(a.coco_json) as f:
        coco = json.load(f)
    lines, names = convert(coco, keep_empty=a.keep_empty)
    with open(a.out, "w") as f:
        f.write("\n".join(lines) + ("\n" if lines else ""))
    classes = a.classes or os.path.join(
        os.path.dirname(os.path.abspath(a.out)), "class.txt")
    with open(classes, "w") as f:
        f.write("\n".join(names) + ("\n" if names else ""))
    print(f"{a.out}: {len(lines)} rows; {classes}: {len(names)} classes "
          f"(set --class_num {len(names)})")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
