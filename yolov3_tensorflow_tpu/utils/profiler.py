"""Profiling / tracing hooks.

The reference's only tracing is wall-clock seconds per epoch
(utils/logger_callback.py:100-101) and a TB graph dump
(utils/board_callback.py:42-43).  Here: real ``jax.profiler`` traces plus a
step timer, strictly more capability (SURVEY §5).

Usage::

    with trace_steps("/tmp/trace"):
        for _ in range(3):
            state, m = trainer.train_step(state, images, labels)
        float(m["total_loss"])   # sync

    t = StepTimer()
    ...
    t.step(images_in_batch)  # each step
    print(t.summary())
"""
from __future__ import annotations

import contextlib
import time
import numpy as np


@contextlib.contextmanager
def trace_steps(log_dir: str):
    """jax.profiler trace context; view with TensorBoard or xprof."""
    import jax

    with jax.profiler.trace(log_dir):
        yield


def annotate(name: str):
    """Named trace span for host-side phases (data loading etc.)."""
    import jax

    return jax.profiler.TraceAnnotation(name)


def _gviz_rows(table: dict) -> list[dict]:
    """gviz JSON table ({"cols": [...], "rows": [{"c": [...]}]}) ->
    list of {col_id: value} dicts."""
    ids = [c["id"] for c in table["cols"]]
    return [dict(zip(ids, [c["v"] if c else None for c in r["c"]]))
            for r in table["rows"]]


def aggregate_hlo_stats(table):
    """Aggregate an xprof 'hlo_stats' gviz table (or a pre-extracted
    list of row dicts as returned by :func:`hlo_stats_rows`).

    Returns ``(by_category, ops)``: by_category maps op category ->
    total self time in us; ops is a list of
    (time_us, category, name, gflops_rate, occurrences, expression)
    sorted by time descending."""
    def fget(r, key):
        try:
            return float(r.get(key) or 0)
        except (TypeError, ValueError):
            return 0.0

    rows = table if isinstance(table, list) else _gviz_rows(table)
    by_cat: dict[str, float] = {}
    ops = []
    for r in rows:
        t = fget(r, "total_time")  # us
        cat = r.get("category") or "?"
        by_cat[cat] = by_cat.get(cat, 0.0) + t
        ops.append((t, cat, r.get("hlo_op_name") or "?",
                    fget(r, "model_flop_rate"), fget(r, "occurrences"),
                    r.get("hlo_op_expression") or ""))
    ops.sort(key=lambda o: -o[0])
    return by_cat, ops


def hlo_stats_rows(trace_dir: str) -> list[dict]:
    """Parse a ``jax.profiler.trace`` directory into raw per-op
    hlo_stats rows (list of ``{col_id: value}`` dicts — every xprof
    column, incl. ``hbm_bw``/``operational_intensity``/``bound_by``,
    which the roofline audit consumes).  Raises RuntimeError when the
    trace has no xplane files or no HLO rows (host-only CPU traces)."""
    import glob
    import json
    import os

    files = glob.glob(trace_dir + "/**/*.xplane.pb", recursive=True)
    if not files:
        raise RuntimeError(f"no xplane.pb under {trace_dir}")
    # jax.profiler.trace writes one plugins/profile/<timestamp>/ run
    # subdir per trace; a reused trace_dir holds several.  Aggregate
    # ONLY the newest run — summing across runs silently doubles (or
    # cross-mixes) the per-step figures these tables exist to compare.
    by_run = {}
    for f in files:
        by_run.setdefault(os.path.dirname(f), []).append(f)
    if len(by_run) > 1:
        newest = max(by_run, key=lambda d: max(os.path.getmtime(f)
                                               for f in by_run[d]))
        files = by_run[newest]
    from xprof.convert import raw_to_tool_data as rtd
    data, _ = rtd.xspace_to_tool_data(files, "hlo_stats", {})
    if isinstance(data, bytes):
        data = data.decode()
    table = json.loads(data)
    if not table.get("rows"):
        raise RuntimeError("hlo_stats returned no rows "
                           "(host-only trace?)")
    return _gviz_rows(table)


def hlo_op_table(trace_dir: str):
    """Parse a ``jax.profiler.trace`` directory into per-op HLO times
    via xprof's hlo_stats tool (the workflow that drove the round-2/3
    kernel decisions, PERF.md).  Returns ``(by_category, ops)`` as in
    :func:`aggregate_hlo_stats`; raises RuntimeError when the trace has
    no xplane files or no HLO rows (e.g. host-only CPU traces)."""
    return aggregate_hlo_stats(hlo_stats_rows(trace_dir))


def format_op_table(by_cat, ops, top_n: int = 30,
                    steps: int = 1) -> str:
    """Human-readable per-op report; ``steps`` divides times into
    per-step figures."""
    # max(total, eps): a truncated/host-skewed capture can yield rows
    # whose times are all zero — report 0% rather than lose the table
    # to a ZeroDivisionError after the (expensive) traced run.
    total = max(sum(by_cat.values()), 1e-12)
    lines = [f"== by category (total {total/1e3:.2f} ms across trace, "
             f"{total/1e3/steps:.2f} ms/step) =="]
    for cat, t in sorted(by_cat.items(), key=lambda kv: -kv[1]):
        lines.append(f"  {t/1e3/steps:9.3f} ms/step  "
                     f"{100*t/total:5.1f}%  {cat}")
    lines.append(f"== top {top_n} ops ==")
    for t, cat, name, rate, occ, expr in ops[:top_n]:
        r = f"  {rate:8.1f} GFLOP/s" if rate else ""
        lines.append(f"  {t/1e3/steps:9.3f} ms/step x{occ:3.0f} "
                     f"[{cat}] {name[:70]}{r}")
        if expr:
            lines.append(f"      {expr[:150]}")
    return "\n".join(lines)


class StepTimer:
    """Host-side step timing with throughput stats.

    NOTE (axon relay): ``jax.block_until_ready`` may not actually block;
    call ``float()`` on a step output before ``step()`` for true timing.
    """

    def __init__(self, warmup: int = 2):
        self.warmup = warmup
        self._times = []
        self._images = []
        self._last = time.perf_counter()

    def reset(self):
        """Full reset: clears accumulated samples AND re-bases the clock
        (previously only the clock, leaking phase-1 samples into a
        phase-2 summary)."""
        self._times = []
        self._images = []
        self._last = time.perf_counter()

    def step(self, images: int = 0):
        now = time.perf_counter()
        self._times.append(now - self._last)
        self._images.append(images)
        self._last = now

    def summary(self) -> dict:
        times = np.asarray(self._times[self.warmup:])
        images = np.asarray(self._images[self.warmup:])
        if len(times) == 0:
            return {}
        return {
            "steps": int(len(times)),
            "mean_ms": float(times.mean() * 1e3),
            "p50_ms": float(np.percentile(times, 50) * 1e3),
            "p95_ms": float(np.percentile(times, 95) * 1e3),
            "images_per_sec": float(images.sum() / times.sum())
            if images.sum() else None,
        }
