"""TF-free TensorBoard writer: wire-format framing, proto payloads, and
cross-reading with TensorFlow's own event reader (the ground truth for the
format the reference's board_callback.py emits via tf.summary)."""
import glob
import os
import struct

import numpy as np
import pytest

from yolov3_tensorflow_tpu.utils.tb_writer import (EventFileWriter,
                                                   crc32c, masked_crc32c)


def read_records(path):
    """Independent TFRecord frame parser with crc verification."""
    records = []
    with open(path, "rb") as fh:
        data = fh.read()
    off = 0
    while off < len(data):
        (length,) = struct.unpack_from("<Q", data, off)
        (len_crc,) = struct.unpack_from("<I", data, off + 8)
        assert masked_crc32c(data[off:off + 8]) == len_crc
        payload = data[off + 12:off + 12 + length]
        (data_crc,) = struct.unpack_from("<I", data, off + 12 + length)
        assert masked_crc32c(payload) == data_crc
        records.append(payload)
        off += 12 + length + 4
    return records


def test_crc32c_known_vectors():
    # RFC 3720 test vectors for CRC32C
    assert crc32c(b"\x00" * 32) == 0x8A9136AA
    assert crc32c(b"\xff" * 32) == 0x62A8AB43
    assert crc32c(bytes(range(32))) == 0x46DD794E
    assert crc32c(b"123456789") == 0xE3069283


def test_framing_and_version_record(tmp_path):
    w = EventFileWriter(str(tmp_path))
    w.scalar("loss", 1.5, step=3)
    w.close()
    recs = read_records(w.path)
    assert len(recs) == 2
    assert b"brain.Event:2" in recs[0]
    assert b"loss" in recs[1]


@pytest.fixture(scope="module")
def tf():
    return pytest.importorskip("tensorflow")


def test_tf_reads_scalars(tmp_path, tf):
    w = EventFileWriter(str(tmp_path))
    w.scalar("loss", 0.25, step=7)
    w.scalar("lr", 1e-3, step=8)
    w.close()
    events = [tf.compat.v1.Event.FromString(r.numpy()) for r in
              tf.data.TFRecordDataset(w.path)]
    assert events[0].file_version == "brain.Event:2"
    scalars = {(v.tag, e.step): v.simple_value
               for e in events[1:] for v in e.summary.value}
    assert scalars[("loss", 7)] == pytest.approx(0.25)
    assert scalars[("lr", 8)] == pytest.approx(1e-3)
    assert events[1].wall_time > 1e9


def test_tf_reads_histogram(tmp_path, tf):
    vals = np.random.RandomState(0).randn(1000).astype(np.float32)
    w = EventFileWriter(str(tmp_path))
    w.histogram("bn_gamma", vals, step=2)
    w.close()
    events = [tf.compat.v1.Event.FromString(r.numpy()) for r in
              tf.data.TFRecordDataset(w.path)]
    histo = events[1].summary.value[0].histo
    assert events[1].summary.value[0].tag == "bn_gamma"
    assert histo.num == pytest.approx(1000)
    assert histo.min == pytest.approx(vals.min(), abs=1e-6)
    assert histo.max == pytest.approx(vals.max(), abs=1e-6)
    assert histo.sum == pytest.approx(float(vals.sum()), rel=1e-5)
    assert sum(histo.bucket) == pytest.approx(1000)
    # bucket_limit must be ascending for TB's renderer
    lims = list(histo.bucket_limit)
    assert lims == sorted(lims)


def test_tf_reads_text(tmp_path, tf):
    w = EventFileWriter(str(tmp_path))
    w.text("model/hlo", "module @jit_train_step {}", step=0)
    w.close()
    events = [tf.compat.v1.Event.FromString(r.numpy()) for r in
              tf.data.TFRecordDataset(w.path)]
    val = events[1].summary.value[0]
    assert val.tag == "model/hlo"
    assert val.metadata.plugin_data.plugin_name == "text"
    assert val.tensor.string_val[0] == b"module @jit_train_step {}"
    assert val.tensor.dtype == 7  # DT_STRING


def test_metrics_writer_is_tf_free(tmp_path, monkeypatch, tf):
    """TensorBoardWriter must not import tensorflow; its output must still
    be readable by TB (checked via TF's reader on the produced files)."""
    import builtins
    real_import = builtins.__import__

    def no_tf(name, *a, **k):
        if name == "tensorflow" or name.startswith("tensorflow."):
            raise ImportError("tensorflow blocked for test")
        return real_import(name, *a, **k)

    from yolov3_tensorflow_tpu.train.metrics import (HEAD_TAGS, LOSS_KEYS,
                                                     TensorBoardWriter)
    monkeypatch.setattr(builtins, "__import__", no_tf)
    tbw = TensorBoardWriter(str(tmp_path / "tb"))
    breakdown = {k: np.arange(3, dtype=np.float32) + i
                 for i, k in enumerate(LOSS_KEYS)}
    tbw.write_epoch(0, 1e-3, 4.2, breakdown,
                    params={"bn": {"scale": np.ones((8,), np.float32)}})
    tbw.write_epoch(1, 1e-3, 4.0, breakdown, val_loss=4.5)
    tbw.write_model_structure("module @step {}", "conv/kernel (3,3,3,8)")
    tbw.close()
    monkeypatch.setattr(builtins, "__import__", real_import)

    # overlay layout: one run dir per sub-loss/head + total
    for key in LOSS_KEYS:
        for tag in HEAD_TAGS:
            files = glob.glob(str(tmp_path / "tb" / key / tag / "events*"))
            assert files, f"missing run dir {key}/{tag}"
    # val_loss overlays on the same "loss" tag in its own run dir
    assert glob.glob(str(tmp_path / "tb" / "val_total" / "events*"))
    events = []
    for f in glob.glob(str(tmp_path / "tb" / "events*")):
        events += [tf.compat.v1.Event.FromString(r.numpy()) for r in
                   tf.data.TFRecordDataset(f)]
    tags = [v.tag for e in events for v in e.summary.value]
    assert "learning_rate" in tags and "bn_gamma" in tags
    assert "model/param_tree" in tags and "model/stablehlo" in tags
    assert os.path.exists(tmp_path / "tb" / "train_step_hlo.txt")
    assert os.path.exists(tmp_path / "tb" / "param_tree.txt")


def test_varint_negative_step_terminates(tmp_path):
    """Negative int64 varints must encode as 64-bit two's complement
    (10 bytes) — the naive shift loop previously hung forever."""
    from yolov3_tensorflow_tpu.utils.tb_writer import _varint
    enc = _varint(-1)
    assert len(enc) == 10  # proto int64 two's-complement encoding
    # decode back
    val = 0
    for i, b in enumerate(enc):
        val |= (b & 0x7F) << (7 * i)
    assert val == (1 << 64) - 1
    # writer-level: a negative-step scalar event must not hang and must
    # still frame correctly
    w = EventFileWriter(str(tmp_path))
    w.scalar("sentinel", 1.0, step=-1)
    w.close()
    assert len(read_records(w.path)) == 2


def test_histogram_nonfinite_values(tmp_path, tf):
    """NaN/Inf in a histogram (e.g. a diverging bn_gamma) must not
    produce a malformed proto: counts, num, min/max/sum must stay
    consistent over the finite values TB can plot."""
    vals = np.array([1.0, float("nan"), 2.0, float("inf"),
                     -float("inf"), 3.0], np.float32)
    w = EventFileWriter(str(tmp_path))
    w.histogram("bn_gamma", vals, step=1)
    w.close()
    events = [tf.compat.v1.Event.FromString(r.numpy()) for r in
              tf.data.TFRecordDataset(w.path)]
    histo = events[1].summary.value[0].histo
    assert histo.num == pytest.approx(3)
    assert sum(histo.bucket) == pytest.approx(3)
    assert histo.min == pytest.approx(1.0)
    assert histo.max == pytest.approx(3.0)
    assert histo.sum == pytest.approx(6.0)
    assert np.isfinite(histo.sum_squares)
