"""Load-test the dynamic-batching inference server on live hardware.

Round-3 verdict item 4: `--mode serve` shipped with coalescing, a
compiled-shape ladder and /stats quantiles, but its defaults
(--batch_timeout_ms 5, power-of-two ladder) were untuned guesses — no
number existed for p50/p99 latency or sustained img/s under concurrent
load.  This tool sweeps (batch_timeout_ms x max_batch) with N
concurrent clients against the REAL server stack and reports a table.

Two drive levels:
  * default — full HTTP: concurrent clients POST image bytes at
    /predict; measures the complete request path (HTTP, decode,
    letterbox, coalesce, device, un-letterbox).  NOTE on a 1-core
    host the per-request JPEG decode+HTTP dominates and the table
    measures THIS MACHINE's host ceiling, not the device path (same
    caveat as tools/bench_input).
  * ``--direct`` — drives DynamicBatcher.submit() with pre-decoded
    uint8 letterboxed frames from client threads: isolates the
    coalescing + shape-ladder + device dispatch path the knobs
    actually control.
  * ``--sim`` — the REAL DynamicBatcher against a simulated engine
    whose per-batch service time is the MEASURED device batch-time
    table (bench.py --infer ladder on one v5e chip).  This exists
    because THIS environment's tunneled axon relay moves host->device
    batches at ~25 MB/s with seconds of latency (PERF.md, transfer
    note) — a live load test here measures the tunnel, not the
    server.  The sim gives the queueing behavior (p50/p99 vs knobs) a
    production host with ~10 GB/s DMA would see; production numbers
    should re-run --direct on real hardware.

Usage:
  python -m yolov3_tensorflow_tpu.tools.bench_server
      [--timeouts 1,5,20] [--max_batches 16,64,128] [--clients 64]
      [--duration 8] [--direct] [--quant] [--checkpoint DIR]
      [--json OUT.json]
"""
from __future__ import annotations

import argparse
import io
import json
import tempfile
import threading
import time


def _build_engine(quant: bool, checkpoint: str | None):
    import jax  # noqa: F401  — device init
    import numpy as np

    from ..config import Config
    from ..train.trainer import YOLOv3Trainer

    cfg = Config(input_image_size=(416, 416, 3), batch_size=8,
                 max_boxes=32, num_devices=1, confidence_thresh=0.5,
                 quant="int8" if quant else "none")
    trainer = YOLOv3Trainer(cfg, restore=checkpoint is not None,
                            checkpoint_dir=checkpoint
                            or tempfile.mkdtemp())
    if quant:
        rng = np.random.RandomState(0)
        calib = np.ascontiguousarray(
            rng.randint(0, 255, (8, 416, 416, 3), dtype=np.uint8))
        import jax.numpy as jnp
        trainer.calibrate(jnp.asarray(calib))
    return cfg, trainer


def _drive_http(server, frame_bytes: bytes, clients: int,
                duration: float):
    """N threads in a closed loop posting the same image."""
    import http.client

    stop = time.perf_counter() + duration
    lat: list = []
    done = [0]
    lock = threading.Lock()
    errors = [0]

    def worker():
        conn = http.client.HTTPConnection("127.0.0.1", server.port,
                                          timeout=30)
        my_lat = []
        n = 0
        while time.perf_counter() < stop:
            t0 = time.perf_counter()
            try:
                conn.request("POST", "/predict", body=frame_bytes,
                             headers={"Content-Type": "image/jpeg"})
                r = conn.getresponse()
                r.read()
                ok = r.status == 200
            except Exception:
                ok = False
                conn.close()
                conn = http.client.HTTPConnection(
                    "127.0.0.1", server.port, timeout=30)
            my_lat.append((time.perf_counter() - t0) * 1e3)
            n += 1
            if not ok:
                with lock:
                    errors[0] += 1
        with lock:
            lat.extend(my_lat)
            done[0] += n
        conn.close()

    t0 = time.perf_counter()
    threads = [threading.Thread(target=worker) for _ in range(clients)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    dt = time.perf_counter() - t0
    return lat, done[0], errors[0], dt


def _drive_direct(batcher, frame, clients: int, duration: float):
    """N threads in a closed loop on DynamicBatcher.submit()."""
    stop = time.perf_counter() + duration
    lat: list = []
    done = [0]
    lock = threading.Lock()

    def worker():
        my_lat = []
        n = 0
        while time.perf_counter() < stop:
            t0 = time.perf_counter()
            batcher.submit(frame).result(timeout=60)
            my_lat.append((time.perf_counter() - t0) * 1e3)
            n += 1
        with lock:
            lat.extend(my_lat)
            done[0] += n

    t0 = time.perf_counter()
    threads = [threading.Thread(target=worker) for _ in range(clients)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    dt = time.perf_counter() - t0
    return lat, done[0], 0, dt


LADDER_JSON = __file__.replace("bench_server.py",
                               "service_ladder_v5e.json")


class _SimEngine:
    """Service-time model from the MEASURED per-shape ladder
    (``--measure`` on TPU writes tools/service_ladder_v5e.json: t(b)
    for every compiled ladder shape b in {1,2,...,128}, bf16 and
    int8).  Round-4's two-point linear fit t(b) = 8.2 + 0.1*b is gone
    (VERDICT r4 item 5): the measured curve is NOT linear — batch-
    quantization cliffs (b96 int8 loss, b128-vs-b96 nonmonotonicity)
    are exactly what this chip does at the shapes the server pads to.
    The batcher hands the engine ALREADY-PADDED batches, so a direct
    table lookup at len(images) is the real service time; non-ladder
    sizes (foreign max_batch caps) interpolate linearly between
    measured neighbors."""

    def __init__(self, table: dict):
        import threading
        self._lock = threading.Lock()
        self._pts = sorted((int(k), float(v)) for k, v in table.items())
        assert self._pts, "empty service-time table"

    def service_ms(self, b: int) -> float:
        pts = self._pts
        for n, t in pts:
            if n == b:
                return t
        if b <= pts[0][0]:
            return pts[0][1]
        if b >= pts[-1][0]:
            return pts[-1][1]
        for (n0, t0), (n1, t1) in zip(pts, pts[1:]):
            if n0 < b < n1:
                return t0 + (t1 - t0) * (b - n0) / (n1 - n0)
        raise AssertionError

    def __call__(self, images):
        import numpy as np
        b = len(images)
        with self._lock:  # the device runs one batch at a time
            time.sleep(self.service_ms(b) / 1e3)
        return [np.zeros((0, 9)) for _ in range(b)]


def _measure_ladder(quant: bool, checkpoint, reps: int = 30,
                    chain: int = 10):
    """Measure DEVICE service time t(b) for every ladder shape.

    The serving forward (model + decode + device NMS, the exact
    computation DetectionEngine dispatches) is jitted and timed with
    the batch ALREADY staged on device, syncing once per measurement
    via a scalar fetch, with ``chain`` dispatches per timing so the
    relay's ~3 ms per-dispatch overhead amortizes out.  Feeding numpy
    frames through DetectionEngine here would measure this
    environment's ~25 MB/s axon tunnel instead (b=64 is 33 MB ->
    ~1,050 ms of pure transfer; CLAUDE.md relay note) — production
    hosts move H2D at ~10 GB/s, adding ~0.1 ms/img on top of these
    numbers.  MIN over reps: the queueing-relevant service time."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ..models.detector import build_detector
    from ..ops.nms import BatchedNMS
    from ..train.trainer import _normalize_images

    cfg, trainer = _build_engine(quant, checkpoint)
    nms = BatchedNMS(cfg)
    model = build_detector(cfg, quant="int8") if quant else trainer.model

    @jax.jit
    def infer(state, qvars, images):
        variables = {"params": state.params,
                     "batch_stats": state.batch_stats}
        if quant:
            variables["quant"] = qvars
        return nms(model.apply(variables, _normalize_images(images),
                               train=False))

    rng = np.random.RandomState(0)
    table = {}
    for b in (1, 2, 4, 8, 16, 32, 64, 96, 128):
        images = jnp.asarray(rng.randint(0, 255, (b, 416, 416, 3),
                                         dtype=np.uint8))
        qvars = trainer.calibrate(images) if quant else 0
        _ = float(jnp.sum(infer(trainer.state, qvars, images)))

        def once():
            t0 = time.perf_counter()
            for _ in range(chain):
                d = infer(trainer.state, qvars, images)
            _ = float(jnp.sum(d))
            return (time.perf_counter() - t0) * 1e3 / chain

        once()  # warm every cache
        best = min(once() for _ in range(max(1, reps // chain)))
        table[str(b)] = round(best, 3)
        print(f"b={b:4d}  t={best:7.2f} ms  "
              f"({b / best * 1e3:7.0f} img/s)", flush=True)
    return table


def _pct(lat, p):
    lat = sorted(lat)
    return lat[min(len(lat) - 1, int(p / 100 * len(lat)))] if lat else 0


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--timeouts", default="1,5,20")
    ap.add_argument("--max_batches", default="16,64,128")
    ap.add_argument("--clients", type=int, default=64)
    ap.add_argument("--duration", type=float, default=8.0)
    ap.add_argument("--direct", action="store_true")
    ap.add_argument("--sim", action="store_true")
    ap.add_argument("--measure", action="store_true",
                    help="measure the per-shape service-time ladder on "
                         "the real device and write --ladder_json")
    ap.add_argument("--ladder_json", default=LADDER_JSON,
                    help="measured service-time table used by --sim "
                         "(written by --measure)")
    ap.add_argument("--quant", action="store_true")
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument("--json", default=None)
    args = ap.parse_args(argv)

    if args.measure:
        key = "int8" if args.quant else "bf16"
        try:
            with open(args.ladder_json) as f:
                tables = json.load(f)
        except (OSError, ValueError):
            tables = {}
        tables[key] = _measure_ladder(args.quant, args.checkpoint)
        with open(args.ladder_json, "w") as f:
            json.dump(tables, f, indent=1)
        print(f"wrote {key} ladder -> {args.ladder_json}")
        return 0

    import numpy as np
    from PIL import Image

    from ..infer.server import (DetectionEngine, DynamicBatcher,
                                InferenceServer)

    rng = np.random.RandomState(0)
    frame = rng.randint(0, 255, (416, 416, 3), dtype=np.uint8)
    buf = io.BytesIO()
    Image.fromarray(frame).save(buf, "JPEG", quality=90)
    frame_bytes = buf.getvalue()

    rows = []
    if args.sim:
        args.direct = True
        with open(args.ladder_json) as f:
            tables = json.load(f)
        engine = _SimEngine(tables["int8" if args.quant else "bf16"])
    else:
        cfg, trainer = _build_engine(args.quant, args.checkpoint)
        # ONE engine across every configuration: its jitted NMS cache
        # holds the compiled shape ladder, so each config pays zero
        # recompilation (the ladder shapes are shared)
        engine = DetectionEngine(cfg, trainer.predict)
    for mb in [int(v) for v in args.max_batches.split(",")]:
        for to in [float(v) for v in args.timeouts.split(",")]:
            if args.direct:
                b = DynamicBatcher(engine, (416, 416), max_batch=mb,
                                   batch_timeout_ms=to)
                b.start()
                b.warmup()
                lat, n, errs, dt = _drive_direct(
                    b, frame, args.clients, args.duration)
                b.stop()
            else:
                srv = InferenceServer(cfg, trainer.predict,
                                      port=0, max_batch=mb,
                                      batch_timeout_ms=to,
                                      engine=engine)
                srv.start(warmup=True)
                try:
                    lat, n, errs, dt = _drive_http(
                        srv, frame_bytes, args.clients, args.duration)
                finally:
                    srv.stop()
            row = {
                "max_batch": mb, "batch_timeout_ms": to,
                "img_s": round(n / dt, 1),
                "p50_ms": round(_pct(lat, 50), 2),
                "p90_ms": round(_pct(lat, 90), 2),
                "p99_ms": round(_pct(lat, 99), 2),
                "requests": n, "errors": errs,
                "clients": args.clients,
                "mode": ("sim" if args.sim
                         else "direct" if args.direct else "http"),
                "quant": bool(args.quant),
            }
            rows.append(row)
            print(f"max_batch={mb:4d} timeout={to:5.1f}ms  "
                  f"{row['img_s']:8.1f} img/s  p50={row['p50_ms']:7.2f} "
                  f"p90={row['p90_ms']:7.2f} p99={row['p99_ms']:7.2f} "
                  f"ms  ({n} reqs, {errs} errs)")
    if args.json:
        with open(args.json, "w") as f:
            json.dump(rows, f, indent=1)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
