"""PASCAL-VOC XML annotations -> the framework's label.txt format.

The reference's data workflow starts from a text label file of
``image_path cx cy w h cls ...`` rows normalized by the image size
(reference README.md:36-40, dataset/file_util.py:22-32), and its
bundled ``class.txt`` lists VOC-style class names — but no converter
ships for the VOC ``Annotations/*.xml`` layout those names come from.
This tool is that converter (companion of tools/coco_to_labels.py):

  python -m yolov3_tensorflow_tpu.tools.voc_to_labels Annotations/ \
      --out label.txt [--classes class.txt] [--class_list names.txt]

* ``<bndbox>`` corners are clamped to the image and converted to
  normalized center/size: cx=(xmin+xmax)/2/W etc.  VOC's historical
  1-based pixel origin is at most a 1-px shift; the raw values are
  used as-is (clamped), matching modern VOC-format emitters.
* Class ids: with ``--class_list FILE`` the given class.txt fixes the
  name->id mapping (objects with unlisted names are dropped with a
  warning count); without it, names are collected, sorted, densified
  to 0-based ids, and written to ``--classes``.
* ``difficult=1`` objects are dropped by default (standard VOC eval
  practice); ``--keep_difficult`` keeps them.
* The image file name comes from ``<filename>`` (falling back to the
  XML stem + ``.jpg``); names containing whitespace are skipped —
  label.txt rows are whitespace-split (data/loader.py) and would shear.
* Degenerate boxes (non-positive size after clamping) are dropped.
* ``<size>`` with zero/missing width or height skips the file with a
  warning (the normalization would divide by zero).

Pure xml.etree parsing — no external dependency.
"""
from __future__ import annotations

import argparse
import glob
import logging
import os
import xml.etree.ElementTree as ET
from typing import Dict, List, Optional, Sequence, Tuple

Obj = Tuple[str, float, float, float, float, int]  # name, corners, difficult


def parse_annotation(xml_text: str, fallback_name: str = ""
                     ) -> Tuple[str, Tuple[float, float], List[Obj]]:
    """One VOC XML -> (image_file_name, (W, H), objects)."""
    root = ET.fromstring(xml_text)
    name = (root.findtext("filename") or "").strip() or fallback_name
    size = root.find("size")
    w = float(size.findtext("width", "0") or 0) if size is not None else 0.0
    h = float(size.findtext("height", "0") or 0) if size is not None else 0.0
    objs: List[Obj] = []
    for obj in root.iter("object"):
        cls = (obj.findtext("name") or "").strip()
        box = obj.find("bndbox")
        if not cls or box is None:
            continue
        difficult = int(float(obj.findtext("difficult", "0") or 0))
        objs.append((cls,
                     float(box.findtext("xmin", "0")),
                     float(box.findtext("ymin", "0")),
                     float(box.findtext("xmax", "0")),
                     float(box.findtext("ymax", "0")),
                     difficult))
    return name, (w, h), objs


def convert(annotations: Sequence[Tuple[str, Tuple[float, float],
                                        List[Obj]]],
            class_names: Optional[Sequence[str]] = None,
            keep_difficult: bool = False,
            keep_empty: bool = False) -> Tuple[List[str], List[str]]:
    """Parsed annotations -> (label.txt lines, dense-id class names).

    ``class_names`` non-None fixes the mapping (unlisted names drop);
    None auto-collects the names sorted alphabetically."""
    if class_names is None:
        seen = sorted({o[0] for _, _, objs in annotations for o in objs})
        names = list(seen)
    else:
        names = [str(n).strip() for n in class_names]
    name_to_id: Dict[str, int] = {n: i for i, n in enumerate(names)}

    lines: List[str] = []
    dropped = unlisted = empty = n_boxes = 0
    for file_name, (iw, ih), objs in annotations:
        if any(c.isspace() for c in file_name):
            # label.txt rows are whitespace-split (data/loader.py, the
            # reference's tf.string_split) — a name with spaces would
            # silently shear the row into garbage floats
            logging.warning("skipping %r: whitespace in file name "
                            "cannot be represented in label.txt",
                            file_name)
            dropped += len(objs)
            continue
        if iw <= 0 or ih <= 0:
            logging.warning("skipping %r: missing/zero <size>",
                            file_name)
            dropped += len(objs)
            continue
        boxes = []
        for cls, x0, y0, x1, y1, difficult in objs:
            if difficult and not keep_difficult:
                dropped += 1
                continue
            if cls not in name_to_id:
                unlisted += 1
                continue
            x0c, y0c = max(x0, 0.0), max(y0, 0.0)
            x1c, y1c = min(x1, iw), min(y1, ih)
            if x1c - x0c <= 0 or y1c - y0c <= 0:
                dropped += 1
                continue
            boxes.append(f"{(x0c + x1c) / 2 / iw:.6f} "
                         f"{(y0c + y1c) / 2 / ih:.6f} "
                         f"{(x1c - x0c) / iw:.6f} "
                         f"{(y1c - y0c) / ih:.6f} {name_to_id[cls]}")
        n_boxes += len(boxes)
        if boxes:
            lines.append(file_name + " " + " ".join(boxes))
        elif keep_empty:
            lines.append(file_name)
            empty += 1
        else:
            empty += 1
    if unlisted:
        logging.warning("%d objects dropped: class name not in "
                        "--class_list", unlisted)
    logging.info("converted %d images (%d boxes, %d dropped, %d empty)",
                 len(lines), n_boxes, dropped, empty)
    return lines, names


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("annotations",
                   help="VOC Annotations directory (or a glob of .xml)")
    p.add_argument("--out", default="label.txt",
                   help="output label file (reference format)")
    p.add_argument("--classes", default=None,
                   help="write dense-id class names here (class.txt "
                        "convention; default: <out dir>/class.txt)")
    p.add_argument("--class_list", default=None,
                   help="existing class.txt fixing the name->id map "
                        "(objects with unlisted names are dropped)")
    p.add_argument("--keep_difficult", action="store_true",
                   help="keep difficult=1 objects (dropped by default)")
    p.add_argument("--keep_empty", action="store_true",
                   help="emit annotation-free images as 0-box rows")
    a = p.parse_args(argv)
    logging.basicConfig(level=logging.INFO)

    if os.path.isdir(a.annotations):
        paths = sorted(glob.glob(os.path.join(a.annotations, "*.xml")))
    else:
        paths = sorted(glob.glob(a.annotations))
    if not paths:
        p.error(f"no .xml files under {a.annotations!r}")

    parsed = []
    for path in paths:
        stem = os.path.splitext(os.path.basename(path))[0]
        with open(path, "r", encoding="utf-8") as f:
            try:
                parsed.append(parse_annotation(f.read(),
                                               fallback_name=stem + ".jpg"))
            except ET.ParseError as e:
                logging.warning("skipping %s: malformed XML (%s)", path, e)

    class_names = None
    if a.class_list:
        with open(a.class_list, "r", encoding="utf-8") as f:
            class_names = [ln.strip() for ln in f if ln.strip()]
    lines, names = convert(parsed, class_names=class_names,
                           keep_difficult=a.keep_difficult,
                           keep_empty=a.keep_empty)
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
