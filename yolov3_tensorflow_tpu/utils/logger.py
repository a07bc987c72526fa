"""Root logger setup (reference: utils/logger.py:10-30): rotating file
handler (1 MB x 3 backups) + console stream, uniform format."""
from __future__ import annotations

import logging
import os
from logging.handlers import RotatingFileHandler

FORMAT = "%(asctime)s %(levelname)s %(filename)s:%(lineno)d: %(message)s"


def generate_logger(filename: str = None, level=logging.INFO):
    """Idempotent: a second call (tests, embedders re-running the CLI
    flow in one interpreter) must not stack duplicate handlers — every
    log line would then print/write 2, 3, ... times."""
    root = logging.getLogger()
    root.setLevel(level)
    formatter = logging.Formatter(FORMAT)
    files = {getattr(h, "baseFilename", None) for h in root.handlers}
    have_stream = any(type(h) is logging.StreamHandler
                      for h in root.handlers)
    if filename and os.path.abspath(filename) not in files:
        os.makedirs(os.path.dirname(filename) or ".", exist_ok=True)
        fh = RotatingFileHandler(filename, maxBytes=2 ** 20, backupCount=3)
        fh.setFormatter(formatter)
        root.addHandler(fh)
    if not have_stream:
        sh = logging.StreamHandler()
        sh.setFormatter(formatter)
        root.addHandler(sh)
    return root
