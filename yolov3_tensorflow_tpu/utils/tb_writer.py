"""Minimal TensorBoard event-file writer — pure Python, no TensorFlow.

The reference's observability layer is a Keras TensorBoard callback
(reference: utils/board_callback.py:12-148), which drags the whole TF
runtime in as a dependency.  A JAX-native framework should not need TF to
write scalars, so this module hand-encodes the three tiny protobuf
messages TensorBoard actually reads (Event / Summary / HistogramProto,
from tensorflow/core/util/event.proto + framework/summary.proto) and the
TFRecord framing (length + masked-crc32c records) around them.

TensorBoard discovers any file matching ``events.out.tfevents.*`` and
reads:
  * record 0: Event{wall_time, file_version: "brain.Event:2"}
  * scalar:   Event{wall_time, step, summary{value{tag, simple_value}}}
  * histogram:Event{wall_time, step, summary{value{tag, histo{...}}}}
  * text:     Event{..., summary{value{tag, metadata{plugin "text"},
              tensor{DT_STRING, shape [1], string_val}}}}

Verified byte-compatible against ``tf.summary`` output in
tests/test_tb_writer.py (the test cross-reads with TF's reader when TF is
importable, and always checks the wire framing/crc independently).
"""
from __future__ import annotations

import os
import socket
import struct
import threading
import time
from typing import Sequence

import numpy as np

# --------------------------------------------------------------------- #
# crc32c (Castagnoli), table-driven; TFRecord uses the "masked" variant.
_CRC_TABLE = []


def _build_crc_table():
    poly = 0x82F63B78  # reversed Castagnoli polynomial
    for i in range(256):
        crc = i
        for _ in range(8):
            crc = (crc >> 1) ^ poly if crc & 1 else crc >> 1
        _CRC_TABLE.append(crc)


_build_crc_table()


def crc32c(data: bytes) -> int:
    crc = 0xFFFFFFFF
    for b in data:
        crc = _CRC_TABLE[(crc ^ b) & 0xFF] ^ (crc >> 8)
    return crc ^ 0xFFFFFFFF


def masked_crc32c(data: bytes) -> int:
    crc = crc32c(data)
    return (((crc >> 15) | (crc << 17)) + 0xA282EAD8) & 0xFFFFFFFF


# --------------------------------------------------------------------- #
# protobuf wire-format primitives
def _varint(n: int) -> bytes:
    if n < 0:
        # proto varints encode negative int64 as 64-bit two's complement
        # (10 bytes); without this, n >>= 7 stays negative forever.
        n &= (1 << 64) - 1
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _key(field: int, wire: int) -> bytes:
    return _varint((field << 3) | wire)


def _f_double(field: int, v: float) -> bytes:
    return _key(field, 1) + struct.pack("<d", v)


def _f_float(field: int, v: float) -> bytes:
    return _key(field, 5) + struct.pack("<f", v)


def _f_varint(field: int, v: int) -> bytes:
    return _key(field, 0) + _varint(v)


def _f_bytes(field: int, data: bytes) -> bytes:
    return _key(field, 2) + _varint(len(data)) + data


def _f_packed_doubles(field: int, vals: Sequence[float]) -> bytes:
    payload = b"".join(struct.pack("<d", v) for v in vals)
    return _f_bytes(field, payload)


# --------------------------------------------------------------------- #
# message builders (field numbers from the TF protos)
def _bucket_limits() -> np.ndarray:
    """TF-style bucket limits: +/- 1e-12 * 1.1^k geometric ladder.
    Constant (~1500 entries) — built once, not per histogram call."""
    limits = [1e-12]
    while limits[-1] < 1e20:
        limits.append(limits[-1] * 1.1)
    return np.asarray([-x for x in reversed(limits)] + limits
                      + [np.finfo(np.float64).max])


_BUCKET_LIMITS = _bucket_limits()
_BUCKET_BINS = np.concatenate(
    [[-np.finfo(np.float64).max], _BUCKET_LIMITS])


def _histogram_proto(values: np.ndarray) -> bytes:
    """HistogramProto with TF's exponential bucketing (summary.proto)."""
    v = np.asarray(values, np.float64).ravel()
    # Drop non-finite values: np.histogram excludes NaN/Inf from the
    # bucket counts while they would still poison min/max/sum, producing
    # a malformed proto TB cannot render — exactly when the user opens
    # TB to diagnose a divergence.  Summary stats cover what is plotted.
    v = v[np.isfinite(v)]
    if v.size == 0:
        v = np.zeros((1,), np.float64)
    limits = _BUCKET_LIMITS
    counts, _ = np.histogram(v, bins=_BUCKET_BINS)
    nz = counts.nonzero()[0]
    if nz.size:  # trim empty tails; TB only needs the populated span
        lo, hi = nz[0], nz[-1] + 1
        limits, counts = limits[lo:hi], counts[lo:hi]
    msg = (_f_double(1, float(v.min())) + _f_double(2, float(v.max()))
           + _f_double(3, float(v.size)) + _f_double(4, float(v.sum()))
           + _f_double(5, float(np.square(v).sum()))
           + _f_packed_doubles(6, limits.tolist())
           + _f_packed_doubles(7, counts.astype(np.float64).tolist()))
    return msg


def _summary_value_scalar(tag: str, value: float) -> bytes:
    inner = _f_bytes(1, tag.encode()) + _f_float(2, float(value))
    return _f_bytes(1, inner)  # Summary.value (repeated field 1)


def _summary_value_histo(tag: str, values: np.ndarray) -> bytes:
    inner = _f_bytes(1, tag.encode()) + _f_bytes(5, _histogram_proto(values))
    return _f_bytes(1, inner)


def _summary_value_text(tag: str, text: str) -> bytes:
    # SummaryMetadata{plugin_data{plugin_name:"text"}} -> Value.metadata(9)
    plugin = _f_bytes(1, b"text")
    metadata = _f_bytes(1, plugin)
    # TensorProto{dtype:DT_STRING(7), tensor_shape{dim{size:1}},
    #             string_val:[text]}
    dim = _f_varint(1, 1)  # TensorShapeProto.Dim.size
    shape = _f_bytes(2, dim)  # TensorShapeProto.dim (field 2)
    tensor = (_f_varint(1, 7) + _f_bytes(2, shape)
              + _f_bytes(8, text.encode()))
    inner = (_f_bytes(1, tag.encode()) + _f_bytes(9, metadata)
             + _f_bytes(8, tensor))
    return _f_bytes(1, inner)


def _event(step: int = 0, summary: bytes = b"",
           file_version: str = "") -> bytes:
    msg = _f_double(1, time.time())
    if step:
        msg += _f_varint(2, step)
    if file_version:
        msg += _f_bytes(3, file_version.encode())
    if summary:
        msg += _f_bytes(5, summary)
    return msg


# --------------------------------------------------------------------- #
class EventFileWriter:
    """Append-only writer for one TB run directory (thread-safe)."""

    def __init__(self, log_dir: str):
        os.makedirs(log_dir, exist_ok=True)
        fname = (f"events.out.tfevents.{int(time.time())}."
                 f"{socket.gethostname()}.{os.getpid()}.v2")
        self.path = os.path.join(log_dir, fname)
        self._fh = open(self.path, "ab")
        self._lock = threading.Lock()
        self._write_record(_event(file_version="brain.Event:2"))

    def _write_record(self, data: bytes):
        header = struct.pack("<Q", len(data))
        rec = (header + struct.pack("<I", masked_crc32c(header))
               + data + struct.pack("<I", masked_crc32c(data)))
        with self._lock:
            self._fh.write(rec)
            self._fh.flush()

    def scalar(self, tag: str, value: float, step: int):
        self._write_record(_event(step, _summary_value_scalar(tag, value)))

    def histogram(self, tag: str, values, step: int):
        self._write_record(_event(
            step, _summary_value_histo(tag, np.asarray(values))))

    def text(self, tag: str, text: str, step: int = 0):
        self._write_record(_event(step, _summary_value_text(tag, text)))

    def close(self):
        with self._lock:
            if not self._fh.closed:
                self._fh.close()
