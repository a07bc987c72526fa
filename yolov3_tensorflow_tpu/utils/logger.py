"""Root logger setup (reference: utils/logger.py:10-30): rotating file
handler (1 MB x 3 backups) + console stream, uniform format."""
from __future__ import annotations

import logging
import os
from logging.handlers import RotatingFileHandler

FORMAT = "%(asctime)s %(levelname)s %(filename)s:%(lineno)d: %(message)s"


def generate_logger(filename: str = None, level=logging.INFO):
    root = logging.getLogger()
    root.setLevel(level)
    formatter = logging.Formatter(FORMAT)
    if filename:
        os.makedirs(os.path.dirname(filename) or ".", exist_ok=True)
        fh = RotatingFileHandler(filename, maxBytes=2 ** 20, backupCount=3)
        fh.setFormatter(formatter)
        root.addHandler(fh)
    sh = logging.StreamHandler()
    sh.setFormatter(formatter)
    root.addHandler(sh)
    return root
