"""Dynamic-batching HTTP inference server (``run.py --mode serve``).

The reference stops at producing a TF-Serving SavedModel
(trainer.py:165-185) and leaves execution to an external server
(README.md's serving note); this framework ships the server itself,
built around the TPU serving pattern:

  * **Request coalescing.** Single-image HTTP requests are queued and
    assembled into batches (up to ``--max_batch``, waiting at most
    ``--batch_timeout_ms`` after the first request) so the MXU runs at
    batch efficiency — the measured gap on one v5e chip is ~4,400 img/s
    at batch 64 vs a fraction of that at batch 1 (PERF.md, inference
    section).
  * **Static shape ladder.** XLA compiles one program per input shape.
    Assembled batches are zero-padded up to the next power of two
    (capped at ``--max_batch``), so the server triggers at most
    ``log2(max_batch)+1`` compilations, all of which are optionally
    warmed up before the socket opens.  Padding rows are sliced off
    before post-processing.
  * **Device post-processing.** Score filter + NMS run on device
    (ops/nms.py) as part of the batch; the host only unmaps the final
    (k, 8) detection rows to each request's original pixel frame
    (inverting the exact letterbox geometry from data/loader.py).

Endpoints:
  * ``POST /predict`` — body is image bytes (``Content-Type: image/*``)
    or JSON ``{"image": "<base64>"}``.  Response:
    ``{"detections": [{"box": [x0, y0, x1, y1], "class_id": c,
    "score": s, "confidence": p_obj, "class_prob": p_cls, "head": h}],
    "image_size": [w, h], "model_input": [h, w]}`` with boxes in
    ORIGINAL image pixels.
  * ``GET /healthz`` — liveness + model identity.
  * ``GET /stats`` — request/batch counters, coalescing histogram,
    latency quantiles.

Works against either a live trainer checkpoint or a ``save_serving``
export (``--serving_dir``): both expose ``predict(uint8 batch) ->
raw heads`` (train/trainer.py, infer/export.py ServingModel).
"""
from __future__ import annotations

import base64
import io
import json
import logging
import queue
import threading
import time
from concurrent.futures import Future
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import List, Optional, Tuple

import numpy as np

from ..config import Config
from ..data.loader import letterbox_array, letterbox_geometry
from .postprocess import YOLOv3PostProcessor


def unletterbox_boxes(rows: np.ndarray, src_hw: Tuple[int, int],
                      dst_hw: Tuple[int, int]) -> np.ndarray:
    """Map normalized letterbox-frame corner boxes back to original-image
    pixels: invert the exact :func:`letterbox_geometry` placement (scale
    by the limiting axis, centre with floor-divided padding), then clamp
    to the image bounds.  rows: (k, >=4) with [x0 y0 x1 y1 ...]
    normalized to the model input frame."""
    if len(rows) == 0:
        return np.asarray(rows, np.float64).reshape(0, rows.shape[1]
                                                    if rows.ndim == 2 else 8)
    (rh, rw), (pt, pl) = letterbox_geometry(src_hw, dst_hw)
    sh, sw = src_hw
    dh, dw = dst_hw
    out = np.array(rows, np.float64)
    # normalized -> letterbox pixels
    out[:, 0:4] = out[:, 0:4] * np.array([dw, dh, dw, dh], np.float64)
    # remove padding, undo the resize ratio
    out[:, [0, 2]] = (out[:, [0, 2]] - pl) * (sw / rw)
    out[:, [1, 3]] = (out[:, [1, 3]] - pt) * (sh / rh)
    out[:, [0, 2]] = np.clip(out[:, [0, 2]], 0.0, float(sw))
    out[:, [1, 3]] = np.clip(out[:, [1, 3]], 0.0, float(sh))
    return out


class DetectionEngine:
    """Batch uint8 letterboxed images -> per-image detection rows.

    Bundles the model forward (trainer.predict / ServingModel.predict —
    raw 3-head outputs) with the device NMS + host conversion
    (YOLOv3PostProcessor).  Returns, per image, one (k, 8) float array of
    [x0 y0 x1 y1 conf cls_prob cls score] rows normalized to the model
    input frame (heads concatenated; the head index is appended as a 9th
    column for response labeling)."""

    def __init__(self, cfg: Config, predict_fn):
        self.cfg = cfg
        self.predict_fn = predict_fn
        self.post = YOLOv3PostProcessor(cfg)

    def __call__(self, images: np.ndarray) -> List[np.ndarray]:
        heads = self.predict_fn(images)
        per_image = self.post.process(heads)
        out = []
        for head_rows in per_image:
            rows = [np.concatenate(
                        [np.asarray(r, np.float64).reshape(-1, 8),
                         np.full((len(r), 1), float(h))], axis=1)
                    for h, r in enumerate(head_rows) if len(r)]
            out.append(np.concatenate(rows, axis=0) if rows
                       else np.zeros((0, 9), np.float64))
        return out


class ServerStats:
    """Lock-protected batching/latency counters for ``GET /stats``."""

    def __init__(self, latency_window: int = 1024):
        self._lock = threading.Lock()
        self.requests = 0
        self.images = 0
        self.batches = 0
        self.errors = 0
        self.batch_hist = {}
        self._lat_ms = []
        self._window = latency_window

    def record_batch(self, n_real: int, n_padded: int):
        with self._lock:
            self.batches += 1
            self.images += n_real
            key = str(n_padded)
            self.batch_hist[key] = self.batch_hist.get(key, 0) + 1

    def record_request(self, latency_ms: float, error: bool = False):
        with self._lock:
            self.requests += 1
            if error:
                self.errors += 1
            self._lat_ms.append(latency_ms)
            if len(self._lat_ms) > self._window:
                self._lat_ms = self._lat_ms[-self._window:]

    def snapshot(self) -> dict:
        with self._lock:
            lat = sorted(self._lat_ms)
            q = (lambda p: lat[min(len(lat) - 1,
                                   int(p * len(lat)))] if lat else 0.0)
            return {
                "requests": self.requests,
                "images": self.images,
                "batches": self.batches,
                "errors": self.errors,
                "batch_size_histogram": dict(self.batch_hist),
                "avg_coalesced": (self.images / self.batches
                                  if self.batches else 0.0),
                "latency_ms": {"p50": q(0.50), "p90": q(0.90),
                               "p99": q(0.99)},
            }


def _ladder_size(n: int, max_batch: int) -> int:
    """Next power of two >= n, capped at max_batch — the static-shape
    ladder keeps the compiled-program count at log2(max_batch)+1."""
    p = 1
    while p < n:
        p *= 2
    return min(p, max_batch)


class DynamicBatcher:
    """Coalesces single-image submissions into padded device batches.

    ``submit`` enqueues one letterboxed uint8 (H, W, 3) image and returns
    a Future resolving to that image's (k, 9) detection rows.  A worker
    thread blocks on the first queued item, keeps collecting until
    ``max_batch`` images or ``batch_timeout_ms`` elapse, zero-pads to the
    shape ladder, and runs the engine once for the whole batch."""

    def __init__(self, engine, input_hw: Tuple[int, int],
                 max_batch: int = 64, batch_timeout_ms: float = 2.0,
                 stats: Optional[ServerStats] = None):
        self.engine = engine
        self.input_hw = tuple(input_hw)
        self.max_batch = int(max_batch)
        self.timeout_s = float(batch_timeout_ms) / 1000.0
        self.stats = stats or ServerStats()
        self._q: "queue.Queue" = queue.Queue()
        self._running = False
        self._thread: Optional[threading.Thread] = None

    # ------------------------------------------------------------ api --
    def start(self):
        if self._running:
            return
        self._running = True
        self._thread = threading.Thread(target=self._loop, daemon=True,
                                        name="batcher")
        self._thread.start()

    def stop(self):
        self._running = False
        self._q.put(None)  # unblock the worker
        if self._thread is not None:
            self._thread.join(timeout=5.0)
            self._thread = None

    def submit(self, image: np.ndarray) -> Future:
        image = np.asarray(image, np.uint8)
        expect = self.input_hw + (3,)
        if image.shape != expect:
            raise ValueError(f"batcher expects letterboxed {expect}, "
                             f"got {image.shape}")
        fut: Future = Future()
        self._q.put((image, fut))
        return fut

    def warmup(self):
        """Compile every ladder shape before serving (first XLA compile
        is ~20-40s on TPU; without this the first requests pay it)."""
        n = 1
        shapes = []
        while True:
            shapes.append(n)
            if n >= self.max_batch:
                break
            n = min(n * 2, self.max_batch)
        for b in shapes:
            zeros = np.zeros((b,) + self.input_hw + (3,), np.uint8)
            t0 = time.monotonic()
            self.engine(zeros)
            logging.info("serve warmup: batch %d compiled in %.1fs",
                         b, time.monotonic() - t0)

    # --------------------------------------------------------- worker --
    def _collect(self):
        """One batch: block for the first item, then drain until the
        deadline or max_batch."""
        first = self._q.get()
        if first is None:
            return None
        items = [first]
        deadline = time.monotonic() + self.timeout_s
        while len(items) < self.max_batch:
            remain = deadline - time.monotonic()
            if remain <= 0:
                break
            try:
                nxt = self._q.get(timeout=remain)
            except queue.Empty:
                break
            if nxt is None:
                break
            items.append(nxt)
        return items

    def _loop(self):
        while self._running:
            items = self._collect()
            if not items:
                continue
            images = np.stack([im for im, _ in items])
            n = len(items)
            padded = _ladder_size(n, self.max_batch)
            if padded != n:
                pad = np.zeros((padded - n,) + images.shape[1:], np.uint8)
                images = np.concatenate([images, pad], axis=0)
            try:
                results = self.engine(images)[:n]
                self.stats.record_batch(n, padded)
                for (_, fut), rows in zip(items, results):
                    fut.set_result(rows)
            except Exception as e:  # noqa: BLE001 — fail every waiter
                logging.exception("serve batch failed")
                for _, fut in items:
                    if not fut.done():
                        fut.set_exception(e)


class InferenceServer:
    """HTTP front end over a :class:`DynamicBatcher`.

    Start with :meth:`start` (binds, warms up, spawns the serving
    thread), query ``.port`` (useful with port=0), stop with
    :meth:`stop`.  ``serve_forever`` blocks until SIGINT/SIGTERM for the
    CLI path."""

    def __init__(self, cfg: Config, predict_fn, host: str = "127.0.0.1",
                 port: int = 8000, max_batch: int = 64,
                 batch_timeout_ms: float = 2.0,
                 request_timeout_s: float = 120.0,
                 model_name: Optional[str] = None,
                 engine: Optional[DetectionEngine] = None):
        self.cfg = cfg
        self.input_hw = (int(cfg.input_image_size[0]),
                         int(cfg.input_image_size[1]))
        self.stats = ServerStats()
        # a caller-supplied engine keeps the jitted NMS cache warm
        # across server instances (the per-instance jit would otherwise
        # recompile the whole shape ladder — tools/bench_server sweeps
        # many configurations over one model)
        self.engine = engine or DetectionEngine(cfg, predict_fn)
        self.batcher = DynamicBatcher(self.engine, self.input_hw,
                                      max_batch=max_batch,
                                      batch_timeout_ms=batch_timeout_ms,
                                      stats=self.stats)
        self.request_timeout_s = float(request_timeout_s)
        self.model_name = model_name or getattr(cfg, "type", "yolov3")
        handler = _make_handler(self)
        self._httpd = ThreadingHTTPServer((host, port), handler)
        self._httpd.daemon_threads = True
        self._serve_thread: Optional[threading.Thread] = None

    @property
    def port(self) -> int:
        return self._httpd.server_address[1]

    def start(self, warmup: bool = True):
        self.batcher.start()
        if warmup:
            self.batcher.warmup()
        self._serve_thread = threading.Thread(
            target=self._httpd.serve_forever, daemon=True, name="http")
        self._serve_thread.start()
        logging.info("serving %s on http://%s:%d (input %dx%d, "
                     "max_batch %d, batch_timeout %.1fms)",
                     self.model_name, self._httpd.server_address[0],
                     self.port, self.input_hw[0], self.input_hw[1],
                     self.batcher.max_batch,
                     self.batcher.timeout_s * 1000.0)

    def stop(self):
        self._httpd.shutdown()
        self._httpd.server_close()
        if self._serve_thread is not None:
            self._serve_thread.join(timeout=5.0)
            self._serve_thread = None
        self.batcher.stop()

    def serve_forever(self):
        """Block until SIGINT/SIGTERM (CLI mode serve)."""
        import signal
        done = threading.Event()

        def _sig(signum, frame):  # noqa: ARG001
            logging.info("signal %d: shutting down", signum)
            done.set()

        prev_int = signal.signal(signal.SIGINT, _sig)
        prev_term = signal.signal(signal.SIGTERM, _sig)
        try:
            done.wait()
        finally:
            signal.signal(signal.SIGINT, prev_int)
            signal.signal(signal.SIGTERM, prev_term)
            self.stop()

    # -------------------------------------------------- request logic --
    def handle_predict(self, body: bytes, content_type: str) -> dict:
        from PIL import Image

        if content_type.startswith("application/json"):
            payload = json.loads(body.decode("utf-8"))
            if "image" not in payload:
                raise ValueError("JSON body must carry 'image' (base64)")
            body = base64.b64decode(payload["image"])
        arr = np.asarray(
            Image.open(io.BytesIO(body)).convert("RGB"), np.uint8)
        src_hw = arr.shape[:2]
        boxed = letterbox_array(arr, self.input_hw, as_float=False)
        rows = self.batcher.submit(boxed).result(
            timeout=self.request_timeout_s)
        rows = np.asarray(rows).reshape(-1, 9)
        pix = unletterbox_boxes(rows, src_hw, self.input_hw)
        detections = [{
            "box": [float(x) for x in r[0:4]],
            "confidence": float(r[4]),
            "class_prob": float(r[5]),
            "class_id": int(round(r[6])),
            "score": float(r[7]),
            "head": int(round(r[8])),
        } for r in pix]
        return {
            "detections": detections,
            "image_size": [int(src_hw[1]), int(src_hw[0])],
            "model_input": [self.input_hw[0], self.input_hw[1]],
        }


def _make_handler(server: InferenceServer):
    class Handler(BaseHTTPRequestHandler):
        protocol_version = "HTTP/1.1"

        def log_message(self, fmt, *args):  # route to the app logger
            logging.debug("http: " + fmt, *args)

        def _json(self, code: int, payload: dict):
            data = json.dumps(payload).encode("utf-8")
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(data)))
            self.end_headers()
            self.wfile.write(data)

        def do_GET(self):  # noqa: N802 — http.server API
            if self.path == "/healthz":
                self._json(200, {"status": "ok",
                                 "model": server.model_name,
                                 "input": list(server.input_hw)})
            elif self.path == "/stats":
                self._json(200, server.stats.snapshot())
            else:
                self._json(404, {"error": f"no route {self.path}"})

        def do_POST(self):  # noqa: N802 — http.server API
            if self.path != "/predict":
                self._json(404, {"error": f"no route {self.path}"})
                return
            t0 = time.monotonic()
            try:
                length = int(self.headers.get("Content-Length", "0"))
                body = self.rfile.read(length)
                ctype = self.headers.get("Content-Type", "")
                result = server.handle_predict(body, ctype)
                server.stats.record_request(
                    (time.monotonic() - t0) * 1000.0)
                self._json(200, result)
            except Exception as e:  # noqa: BLE001 — surface to client
                server.stats.record_request(
                    (time.monotonic() - t0) * 1000.0, error=True)
                logging.exception("predict request failed")
                self._json(400, {"error": str(e)})

    return Handler
