"""Dynamic-batching inference server (infer/server.py): letterbox
inversion geometry, request coalescing, HTTP surface, and parity of the
served detections with the direct predict path.

The reference delegates serving to external TF-Serving
(trainer.py:165-185); the server is framework surface here, so it gets
the same in-repo gate as the CLI (test_cli_e2e.py)."""
import io
import json
import threading
import time
import urllib.request

import numpy as np
import pytest

from yolov3_tensorflow_tpu.config import Config
from yolov3_tensorflow_tpu.data.loader import (letterbox_array,
                                               letterbox_geometry)
from yolov3_tensorflow_tpu.infer.server import (DynamicBatcher,
                                                InferenceServer,
                                                ServerStats, _ladder_size,
                                                unletterbox_boxes)


def _cfg(**kw):
    base = dict(input_image_size=(64, 64, 3), batch_size=2, max_boxes=4,
                class_num=3, is_augment=False, compute_dtype="float32",
                confidence_thresh=0.05)
    base.update(kw)
    return Config(**base)


# ------------------------------------------------------------ geometry --
def test_unletterbox_inverts_letterbox():
    """Boxes drawn in the original frame survive letterbox -> normalize ->
    unletterbox to within the nearest-resize quantization (one source
    pixel)."""
    rng = np.random.RandomState(0)
    for src_hw in [(100, 200), (333, 97), (64, 64), (41, 13)]:
        sh, sw = src_hw
        dst_hw = (64, 64)
        (rh, rw), (pt, pl) = letterbox_geometry(src_hw, dst_hw)
        orig = np.stack([
            rng.uniform(0, sw // 2, 5), rng.uniform(0, sh // 2, 5),
            rng.uniform(sw // 2, sw, 5), rng.uniform(sh // 2, sh, 5),
        ], axis=1)
        # forward map: original px -> letterbox px -> normalized
        fwd = orig.copy()
        fwd[:, [0, 2]] = fwd[:, [0, 2]] * (rw / sw) + pl
        fwd[:, [1, 3]] = fwd[:, [1, 3]] * (rh / sh) + pt
        fwd[:, [0, 2]] /= dst_hw[1]
        fwd[:, [1, 3]] /= dst_hw[0]
        rows = np.concatenate([fwd, np.zeros((5, 4))], axis=1)
        back = unletterbox_boxes(rows, src_hw, dst_hw)
        np.testing.assert_allclose(back[:, 0:4], orig, atol=1e-6)


def test_unletterbox_clamps_to_image():
    rows = np.array([[-0.5, -0.5, 1.5, 1.5, 0, 0, 0, 0]])
    out = unletterbox_boxes(rows, (50, 80), (64, 64))
    assert out[0, 0] >= 0 and out[0, 1] >= 0
    assert out[0, 2] <= 80 and out[0, 3] <= 50


def test_unletterbox_empty():
    out = unletterbox_boxes(np.zeros((0, 9)), (50, 80), (64, 64))
    assert out.shape[0] == 0


def test_ladder_size():
    assert [_ladder_size(n, 64) for n in (1, 2, 3, 5, 8, 33, 64)] == \
        [1, 2, 4, 8, 8, 64, 64]
    assert _ladder_size(7, 4) == 4


# ------------------------------------------------------------- batcher --
class _RecordingEngine:
    """Engine double: records batch shapes, returns per-image row counts
    derived from the image content so routing errors are visible."""

    def __init__(self):
        self.batches = []
        self.lock = threading.Lock()

    def __call__(self, images):
        with self.lock:
            self.batches.append(images.shape[0])
        # each image's "detections": one row carrying its mean pixel value
        return [np.full((1, 9), float(img.mean())) for img in images]


def test_batcher_coalesces_and_routes():
    eng = _RecordingEngine()
    b = DynamicBatcher(eng, (8, 8), max_batch=8, batch_timeout_ms=200.0)
    # stall the worker on a first probe batch so the next 3 submissions
    # queue up together, then assert they ride ONE padded batch
    b.start()
    try:
        b.submit(np.zeros((8, 8, 3), np.uint8)).result(timeout=10)
        futs = [b.submit(np.full((8, 8, 3), v, np.uint8))
                for v in (10, 20, 30)]
        results = [f.result(timeout=10) for f in futs]
        for v, rows in zip((10, 20, 30), results):
            assert abs(rows[0, 0] - v) < 1e-6, "routed to wrong request"
        # 3 queued submissions -> one ladder-padded batch of 4
        assert eng.batches[0] == 1
        assert 4 in eng.batches[1:]
    finally:
        b.stop()


def test_batcher_rejects_wrong_shape():
    b = DynamicBatcher(_RecordingEngine(), (8, 8), max_batch=4)
    with pytest.raises(ValueError):
        b.submit(np.zeros((9, 8, 3), np.uint8))


def test_batcher_failure_fails_all_waiters():
    class Boom:
        def __call__(self, images):
            raise RuntimeError("device fell over")

    b = DynamicBatcher(Boom(), (8, 8), max_batch=4, batch_timeout_ms=50.0)
    b.start()
    try:
        fut = b.submit(np.zeros((8, 8, 3), np.uint8))
        with pytest.raises(RuntimeError, match="device fell over"):
            fut.result(timeout=10)
    finally:
        b.stop()


def test_stats_snapshot():
    s = ServerStats()
    s.record_batch(3, 4)
    s.record_request(10.0)
    s.record_request(30.0, error=True)
    snap = s.snapshot()
    assert snap["batches"] == 1 and snap["images"] == 3
    assert snap["batch_size_histogram"] == {"4": 1}
    assert snap["requests"] == 2 and snap["errors"] == 1
    assert snap["latency_ms"]["p50"] in (10.0, 30.0)


# ------------------------------------------------- HTTP + model parity --
@pytest.fixture(scope="module")
def server_and_trainer(tmp_path_factory):
    from yolov3_tensorflow_tpu.train.trainer import YOLOv3Trainer
    cfg = _cfg()
    ckdir = str(tmp_path_factory.mktemp("serve_ck"))
    tr = YOLOv3Trainer(cfg, restore=False, checkpoint_dir=ckdir)
    srv = InferenceServer(cfg, tr.predict, port=0, max_batch=4,
                          batch_timeout_ms=20.0)
    srv.start(warmup=True)
    yield srv, tr, cfg
    srv.stop()


def _jpeg_bytes(arr):
    from PIL import Image
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="JPEG", quality=95)
    return buf.getvalue()


def _post(port, path, data, content_type):
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}{path}", data=data,
        headers={"Content-Type": content_type}, method="POST")
    with urllib.request.urlopen(req, timeout=60) as r:
        return r.status, json.loads(r.read().decode())


def test_http_healthz_and_predict_parity(server_and_trainer):
    srv, tr, cfg = server_and_trainer
    with urllib.request.urlopen(
            f"http://127.0.0.1:{srv.port}/healthz", timeout=30) as r:
        health = json.loads(r.read().decode())
    assert health["status"] == "ok" and health["input"] == [64, 64]

    rng = np.random.RandomState(7)
    img = rng.randint(0, 255, (48, 80, 3), np.uint8)  # non-square source
    status, resp = _post(srv.port, "/predict", _jpeg_bytes(img),
                         "image/jpeg")
    assert status == 200
    assert resp["image_size"] == [80, 48]
    assert resp["model_input"] == [64, 64]

    # parity: the same letterboxed pixels through the direct path.  JPEG
    # decode is in both paths (the request carried encoded bytes), so
    # compare against a decode of the SAME bytes.
    from PIL import Image
    decoded = np.asarray(
        Image.open(io.BytesIO(_jpeg_bytes(img))).convert("RGB"), np.uint8)
    boxed = letterbox_array(decoded, (64, 64), as_float=False)
    direct = srv.engine(boxed[None])[0]
    assert len(resp["detections"]) == len(direct)
    got = sorted(d["score"] for d in resp["detections"])
    want = sorted(float(r[7]) for r in direct)
    np.testing.assert_allclose(got, want, rtol=1e-5)
    # boxes stay inside the original image
    for d in resp["detections"]:
        x0, y0, x1, y1 = d["box"]
        assert 0 <= x0 <= x1 <= 80 and 0 <= y0 <= y1 <= 48
        assert d["head"] in (0, 1, 2)
        assert 0 <= d["class_id"] < cfg.class_num


def test_http_json_base64_and_errors(server_and_trainer):
    srv, _, _ = server_and_trainer
    import base64
    img = np.full((32, 32, 3), 128, np.uint8)
    payload = json.dumps(
        {"image": base64.b64encode(_jpeg_bytes(img)).decode()}).encode()
    status, resp = _post(srv.port, "/predict", payload, "application/json")
    assert status == 200 and "detections" in resp

    # malformed body -> 400 with an error message, server stays up
    try:
        _post(srv.port, "/predict", b"not an image", "image/jpeg")
        assert False, "expected HTTPError"
    except urllib.error.HTTPError as e:
        assert e.code == 400
        assert "error" in json.loads(e.read().decode())
    status, _ = _post(srv.port, "/predict", _jpeg_bytes(img), "image/jpeg")
    assert status == 200


def test_http_concurrent_requests_coalesce(server_and_trainer):
    srv, _, _ = server_and_trainer
    before = srv.stats.snapshot()
    rng = np.random.RandomState(3)
    images = [rng.randint(0, 255, (40, 40, 3), np.uint8) for _ in range(4)]
    results = [None] * 4

    def worker(i):
        _, resp = _post(srv.port, "/predict", _jpeg_bytes(images[i]),
                        "image/jpeg")
        results[i] = resp

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=60)
    assert all(r is not None and "detections" in r for r in results)
    after = srv.stats.snapshot()
    new_images = after["images"] - before["images"]
    new_batches = after["batches"] - before["batches"]
    assert new_images == 4
    # with a 20ms window and 4 single-core-contended client threads,
    # at least SOME coalescing must happen (batches < images)
    assert new_batches < 4, f"no coalescing: {after['batch_size_histogram']}"
    assert after["latency_ms"]["p50"] > 0


def test_cli_serve_fails_fast_without_checkpoint(tmp_path, monkeypatch):
    """serve mode from a fresh init would serve garbage boxes; the CLI
    refuses like test/predict do (cli.py step-0 gate)."""
    monkeypatch.chdir(tmp_path)
    import run as cli
    with pytest.raises(SystemExit, match="no checkpoint restored"):
        cli.main(["--mode", "serve", "--input_size", "64x64",
                  "--batch_size", "2", "--class_num", "3",
                  "--max_boxes", "4", "--num_devices", "1",
                  "--checkpoint_dir", str(tmp_path / "ck")])


def test_stats_endpoint(server_and_trainer):
    srv, _, _ = server_and_trainer
    with urllib.request.urlopen(
            f"http://127.0.0.1:{srv.port}/stats", timeout=30) as r:
        snap = json.loads(r.read().decode())
    assert snap["requests"] >= 1 and snap["batches"] >= 1
    with pytest.raises(urllib.error.HTTPError):
        urllib.request.urlopen(
            f"http://127.0.0.1:{srv.port}/nope", timeout=30)


def test_sim_engine_measured_table():
    """--sim's service-time model is the MEASURED ladder (VERDICT r4
    item 5 replaced the 2-point linear fit): exact lookup on measured
    shapes, linear interpolation between them, edge clamping."""
    from yolov3_tensorflow_tpu.tools.bench_server import _SimEngine
    eng = _SimEngine({"1": 5.0, "4": 6.0, "64": 15.0, "128": 21.0})
    assert eng.service_ms(1) == 5.0
    assert eng.service_ms(4) == 6.0
    assert eng.service_ms(128) == 21.0
    # between measured points: linear
    assert abs(eng.service_ms(96) - 18.0) < 1e-9
    # clamped at the edges
    assert eng.service_ms(256) == 21.0
    t0 = time.perf_counter()
    out = eng([None] * 4)
    dt = (time.perf_counter() - t0) * 1e3
    assert len(out) == 4 and dt >= 5.0


def test_sim_ladder_json_committed():
    """The committed measured ladder drives --sim without TPU access:
    both precision tables present, covering the compiled shape ladder."""
    import os

    from yolov3_tensorflow_tpu.tools.bench_server import LADDER_JSON
    assert os.path.exists(LADDER_JSON), LADDER_JSON
    with open(LADDER_JSON) as f:
        tables = json.load(f)
    for key in ("bf16", "int8"):
        pts = tables[key]
        assert {"1", "2", "4", "8", "16", "32", "64", "128"} <= set(pts)
        assert all(float(v) > 0 for v in pts.values())
