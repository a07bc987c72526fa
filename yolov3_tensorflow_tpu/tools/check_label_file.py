"""Pre-flight label-file validator (reference: utils/check_label_file.py:10-25):
keep only label lines whose image file exists AND decodes, write the
filtered list next to the original as ``new_<name>``."""
from __future__ import annotations

import argparse
import os

from PIL import Image


def check_label_file(label_file: str, image_root: str,
                     output: str = None) -> str:
    out_path = output or os.path.join(
        os.path.dirname(label_file),
        "new_" + os.path.basename(label_file))
    kept = dropped = 0
    with open(label_file) as fin, open(out_path, "w") as fout:
        for line in fin:
            fields = line.split()
            if not fields:
                continue
            name = fields[0]
            path = os.path.join(image_root, name)
            try:
                with Image.open(path) as im:
                    im.verify()
                fout.write(line)
                kept += 1
            except Exception:
                dropped += 1
    print(f"kept {kept}, dropped {dropped} -> {out_path}")
    return out_path


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("label_file")
    p.add_argument("image_root")
    p.add_argument("--output", default=None)
    a = p.parse_args(argv)
    check_label_file(a.label_file, a.image_root, a.output)


if __name__ == "__main__":
    main()
