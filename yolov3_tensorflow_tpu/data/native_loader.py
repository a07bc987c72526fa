"""ctypes binding for the native C++ JPEG decode + letterbox loader.

The reference's input pipeline rides tf.data's C++ runtime; this is the
equivalent native component (native/loader.cc): libjpeg(-turbo) decode with
the NEAREST letterbox fused into the output pass, multithreaded, GIL-free
during the call.  Falls back gracefully when the shared library cannot be
built (callers use data/loader.py's PIL path).
"""
from __future__ import annotations

import ctypes
import logging
import os
import subprocess
import threading
from typing import List, Optional, Tuple

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native")
_SO_PATH = os.path.join(_NATIVE_DIR, "libyolo_loader.so")
# installed wheels ship the prebuilt library as package data next to
# this module (setup.py BuildPyWithNative); the repo-checkout path
# above stays first so a dev rebuild (make -C native) wins
_PKG_SO_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "libyolo_loader.so")

_lib = None
_lib_checked = False
_lib_lock = threading.Lock()


def _build() -> bool:
    try:
        subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                       capture_output=True, timeout=120)
        return os.path.exists(_SO_PATH)
    except Exception as e:  # toolchain/libjpeg absent
        logging.info("native loader build failed (%s); using PIL fallback",
                     type(e).__name__)
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    """Load (building on first use) the native library, or None.

    Lock-guarded: concurrent first callers (two Datasets' prefetch
    workers) would otherwise race ``make`` in the same directory or
    observe ``_lib_checked`` set with ``_lib`` still None and silently
    drop onto the ~10x-slower all-PIL path."""
    global _lib, _lib_checked
    if _lib_checked:
        return _lib
    with _lib_lock:
        if _lib_checked:
            return _lib
        lib = _load_locked()
        _lib = lib
        _lib_checked = True  # after _lib: lock-free readers see both
        return _lib


def _load_locked() -> Optional[ctypes.CDLL]:
    so = _SO_PATH
    if not os.path.exists(so):
        if os.path.exists(_PKG_SO_PATH):
            so = _PKG_SO_PATH  # installed wheel: prebuilt package data
        elif not (os.path.isdir(_NATIVE_DIR) and _build()):
            return None
    try:
        lib = ctypes.CDLL(so)
        lib.yolo_decode_letterbox_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.POINTER(ctypes.c_ubyte),
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
            ctypes.c_int,
        ]
        lib.yolo_decode_letterbox_batch.restype = None
        return lib
    except OSError as e:
        logging.info("native loader unavailable (%s); using PIL fallback", e)
        return None


def available() -> bool:
    return get_lib() is not None


def decode_letterbox_batch(paths: List[str], dst_hw: Tuple[int, int],
                           num_threads: int = 0, strict: bool = True):
    """Decode JPEGs into a (n, H, W, 3) uint8 BGR letterboxed batch.

    ``strict`` returns (images, src_dims (n,2) [h,w]) and raises
    RuntimeError on any per-image decode failure; ``strict=False``
    returns (images, src_dims, status (n,) int32) so the caller can
    fall back per-image (0 = ok; failed rows of ``images`` are
    undefined)."""
    lib = get_lib()
    if lib is None:
        raise RuntimeError("native loader not available")
    n = len(paths)
    h, w = dst_hw
    out = np.empty((n, h, w, 3), np.uint8)
    src_dims = np.empty((n, 2), np.int32)
    status = np.empty((n,), np.int32)
    # fsencode, not str.encode: a non-UTF8 filename (surrogateescape-
    # decoded by the OS) would UnicodeEncodeError the WHOLE batch onto
    # the ~10x-slower all-PIL path; fsencode round-trips exactly
    arr = (ctypes.c_char_p * n)(*[os.fsencode(p) for p in paths])
    lib.yolo_decode_letterbox_batch(
        arr, n, h, w,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
        src_dims.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        status.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        num_threads)
    if not strict:
        return out, src_dims, status
    if status.any():
        bad = [paths[i] for i in np.where(status)[0]]
        raise RuntimeError(f"native decode failed for {bad[:3]}...")
    return out, src_dims
