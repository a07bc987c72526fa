"""Per-fusion roofline audit of the compiled train / inference step.

For every device op in an xprof trace this reports measured time against
the op's OWN speed-of-light bound ``max(flops/flop_peak,
hbm_bytes/hbm_peak)`` — flops and HBM bytes are recovered from xprof's
measured per-op counters (``model_flop_rate`` × time and ``hbm_bw`` ×
time), so the bound is per-op and measured, not a whole-program
aggregate.  It also decomposes the program's HBM traffic per TENSOR
STREAM by parsing the operand/output shapes out of each op's HLO
expression (buffers pinned to VMEM by memory-space assignment carry an
``S(1)`` layout suffix and are excluded), answering "which bytes are
algorithmically necessary" at the granularity PERF.md's aggregate
45 GB/step figure could not.

The reference has no profiling beyond wall-clock epoch seconds
(utils/logger_callback.py:100-101); this tool exists to close the
round-3 verdict's open question — whether the measured single-chip
throughput is a true local optimum — fusion by fusion.

Usage:
  python -m yolov3_tensorflow_tpu.tools.roofline --mode train
      [--batch 128] [--steps 5] [--top 25] [--threshold 0.85]
      [--flop_peak 197] [--hbm_peak 819] [--trace_dir DIR]
      [--conv_backend xla] [--stem_backend auto] [--json OUT.json]
"""
from __future__ import annotations

import argparse
import json
import re
import tempfile
import time

# v5e per-chip peaks: 197 TFLOP/s bf16 MXU, 819 GB/s HBM.
FLOP_PEAK_TFLOPS = 197.0
HBM_PEAK_GBS = 819.0

_SHAPE_RE = re.compile(
    r"(pred|[su](?:4|8|16|32|64)|bf16|f16|f32|f64)"
    r"\[([0-9,]*)\](\{[^}]*\})?")
_DTYPE_BYTES = {"pred": 1, "s4": 0.5, "u4": 0.5, "s8": 1, "u8": 1,
                "bf16": 2, "f16": 2, "s16": 2, "u16": 2,
                "f32": 4, "s32": 4, "u32": 4, "f64": 8, "s64": 8,
                "u64": 8}


def _shape_bytes(dtype: str, dims: str) -> float:
    n = 1
    for d in dims.split(","):
        if d:
            n *= int(d)
    return n * _DTYPE_BYTES[dtype]


def _balanced(s: str) -> str:
    """The prefix of ``s`` up to the paren that closes ``s[0]``
    (layout annotations like ``T(8,128)(2,1)`` nest but stay
    balanced)."""
    depth = 0
    for i, ch in enumerate(s):
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
            if depth == 0:
                return s[:i + 1]
    return s


def parse_expression_streams(expr: str):
    """HLO op expression -> list of tensor streams
    ``(direction, dtype, dims, bytes, in_vmem)``.

    ``direction`` is 'out' for the op's result(s), 'in' for operands.
    ``in_vmem`` marks buffers whose layout carries a non-default
    memory space (``S(k)``) — pinned to VMEM by XLA's memory-space
    assignment, hence not HBM traffic."""
    if " = " not in expr:
        return []
    rhs = expr.split(" = ", 1)[1]
    if rhs.startswith("("):  # tuple-shaped result
        out_region = _balanced(rhs)
    else:
        m = _SHAPE_RE.match(rhs)
        out_region = m.group(0) if m else ""
    rest = rhs[len(out_region):]
    paren = rest.find("(")
    in_region = _balanced(rest[paren:]) if paren >= 0 else ""
    streams = []
    for region, direction in ((out_region, "out"), (in_region, "in")):
        for m in _SHAPE_RE.finditer(region):
            dtype, dims, layout = m.group(1), m.group(2), m.group(3)
            vmem = bool(layout and re.search(r"S\(\d+\)", layout))
            streams.append((direction, dtype, dims,
                            _shape_bytes(dtype, dims), vmem))
    return streams


def roofline_report(rows: list[dict], steps: int,
                    flop_peak_tflops: float = FLOP_PEAK_TFLOPS,
                    hbm_peak_gbs: float = HBM_PEAK_GBS) -> dict:
    """Pure computation: hlo_stats rows -> roofline audit dict.

    Keeps only the dominant program (the traced step — a trace also
    captures scalar-fetch conversions etc. as separate tiny programs).
    Returns ``{"ops": [...], "totals": {...}, "streams": [...]}``;
    ops are per-step figures sorted by time descending, each with
    ``pct_of_bound`` = its own roofline bound / measured time."""
    def fget(r, key):
        try:
            return float(r.get(key) or 0)
        except (TypeError, ValueError):
            return 0.0

    by_prog: dict[str, float] = {}
    for r in rows:
        pid = str(r.get("program_id"))
        by_prog[pid] = by_prog.get(pid, 0.0) + fget(r, "total_self_time")
    if not by_prog:
        raise RuntimeError("no hlo_stats rows")
    main_prog = max(by_prog, key=by_prog.get)

    ops = []
    stream_agg: dict[tuple, dict] = {}
    tot_t = tot_flops = tot_bytes = 0.0
    for r in rows:
        if str(r.get("program_id")) != main_prog:
            continue
        t_us = fget(r, "total_self_time") / steps
        if t_us <= 0:
            continue
        occ = fget(r, "occurrences") / steps
        # rate x time recovers the op's counted flops / HBM bytes.
        # Use total_SELF_time — the same clock t_us and the
        # pct_of_bound denominator use — so an op whose total_time
        # includes child/nested time cannot overstate its own bound
        # and push pct_of_sum_bound past 100% (ADVICE r4).  For leaf
        # fusions (every row in this step's traces) self == total and
        # the recovery is exact (verified on a clean conv, PERF.md).
        flops = fget(r, "model_flop_rate") * 1e9 \
            * fget(r, "total_self_time") * 1e-6 / steps
        hbm_gb = fget(r, "hbm_bw") * (2 ** 30) \
            * fget(r, "total_self_time") * 1e-6 / steps / 1e9
        t_flop_us = flops / (flop_peak_tflops * 1e12) * 1e6
        t_hbm_us = hbm_gb * 1e9 / (hbm_peak_gbs * 1e9) * 1e6
        # max(): roofline with perfect DMA/MXU overlap.  sum(): the
        # serial-phase model — measured conv fusions on this backend
        # sit almost exactly on the SUM (they do not overlap their
        # compute and memory phases), so an op at ~100% of sum-bound
        # but below max-bound is improved by REMOVING BYTES OR FLOPS,
        # not by scheduling.
        t_bound_us = max(t_flop_us, t_hbm_us)
        t_sum_us = t_flop_us + t_hbm_us
        expr = r.get("hlo_op_expression") or ""
        streams = parse_expression_streams(expr)
        ops.append({
            "name": r.get("hlo_op_name") or "?",
            "category": r.get("category") or "?",
            "occurrences": occ,
            "ms": t_us / 1e3,
            "tflops_rate": flops / (t_us * 1e-6) / 1e12 if t_us else 0,
            "gb": hbm_gb,
            "hbm_gbs": hbm_gb * 1e9 / (t_us * 1e-6) / 1e9
            if t_us else 0,
            "bound_by": r.get("bound_by") or "?",
            "bound_ms": t_bound_us / 1e3,
            "pct_of_bound": (t_bound_us / t_us if t_us else 0.0),
            "sum_bound_ms": t_sum_us / 1e3,
            "pct_of_sum_bound": (t_sum_us / t_us if t_us else 0.0),
            "expression": expr,
        })
        tot_t += t_us
        tot_flops += flops
        tot_bytes += hbm_gb
        # analytic per-stream attribution: measured hbm bytes are the
        # op total; the expression says WHICH tensors those bytes are
        ana = [s for s in streams if not s[4]]
        ana_total = sum(s[3] for s in ana) * occ
        for direction, dtype, dims, nbytes, _ in ana:
            key = (dtype, dims, direction)
            e = stream_agg.setdefault(
                key, {"gb": 0.0, "ops": 0, "measured_gb": 0.0})
            e["gb"] += nbytes * occ / 1e9
            e["ops"] += 1
            # scale the op's measured bytes onto its streams
            # proportionally to their analytic sizes
            if ana_total > 0:
                e["measured_gb"] += hbm_gb * (nbytes * occ / ana_total)

    ops.sort(key=lambda o: -o["ms"])
    streams = [{"dtype": k[0], "dims": k[1], "direction": k[2], **v}
               for k, v in stream_agg.items()]
    streams.sort(key=lambda s: -s["measured_gb"])
    totals = {
        "device_ms": tot_t / 1e3,
        "tflop": tot_flops / 1e12,
        "gb": tot_bytes,
        "mxu_pct": tot_flops / (tot_t * 1e-6)
        / (flop_peak_tflops * 1e12) * 100 if tot_t else 0,
        "hbm_pct": tot_bytes * 1e9 / (tot_t * 1e-6)
        / (hbm_peak_gbs * 1e9) * 100 if tot_t else 0,
        "bound_ms": sum(o["bound_ms"] for o in ops),
        "sum_bound_ms": sum(o["sum_bound_ms"] for o in ops),
    }
    return {"ops": ops, "totals": totals, "streams": streams}


def format_report(rep: dict, top: int = 25, threshold: float = 0.85,
                  stream_top: int = 20) -> str:
    t = rep["totals"]
    lines = [
        f"== program totals ==",
        f"  device {t['device_ms']:.2f} ms/step, {t['tflop']:.2f} "
        f"TFLOP/step ({t['mxu_pct']:.0f}% MXU), {t['gb']:.1f} GB/step "
        f"({t['hbm_pct']:.0f}% HBM)",
        f"  sum of per-op roofline bounds: {t['bound_ms']:.2f} ms/step "
        f"(program at {100 * t['bound_ms'] / t['device_ms']:.0f}% of "
        f"its per-op speed of light); serial-phase bounds "
        f"{t['sum_bound_ms']:.2f} ms/step "
        f"({100 * t['sum_bound_ms'] / t['device_ms']:.0f}%)",
        f"== top {top} ops vs their own roofline ==",
        f"  {'ms':>7} {'GB':>6} {'TFLOP/s':>8} {'GB/s':>5} "
        f"{'bound':>7} {'ofSoL':>5} {'ofSum':>5}  op",
    ]
    for o in rep["ops"][:top]:
        flag = ("  <-- attack"
                if o["pct_of_sum_bound"] < threshold else "")
        lines.append(
            f"  {o['ms']:7.3f} {o['gb']:6.2f} {o['tflops_rate']:8.1f} "
            f"{o['hbm_gbs']:5.0f} {o['bound_ms']:7.3f} "
            f"{100 * o['pct_of_bound']:4.0f}% "
            f"{100 * o['pct_of_sum_bound']:4.0f}%  "
            f"[{o['bound_by']}] {o['name'][:40]} "
            f"x{o['occurrences']:.0f}{flag}")
    # attack list keys off the SUM bound: an op at >=threshold of the
    # serial-phase bound is limited by its byte/flop counts, not by
    # codegen inefficiency — improving it means removing work
    below = [o for o in rep["ops"]
             if o["pct_of_sum_bound"] < threshold]
    slack = sum(o["ms"] - o["sum_bound_ms"] for o in below)
    lines.append(
        f"== {len(below)} ops below {100 * threshold:.0f}% of their "
        f"serial-phase (sum) bound; total slack {slack:.2f} "
        f"ms/step ==")
    below.sort(key=lambda o: o["sum_bound_ms"] - o["ms"])
    for o in below[:top]:
        lines.append(f"  {o['ms'] - o['sum_bound_ms']:7.3f} ms slack  "
                     f"{o['name'][:60]}")
        if o["expression"]:
            lines.append(f"      {o['expression'][:140]}")
    lines.append(f"== HBM traffic by tensor stream (top {stream_top}, "
                 f"measured GB/step attributed by shape) ==")
    for s in rep["streams"][:stream_top]:
        lines.append(
            f"  {s['measured_gb']:7.2f} GB {s['direction']:>3} "
            f"{s['dtype']}[{s['dims']}] across {s['ops']} ops "
            f"(analytic {s['gb']:.2f})")
    return "\n".join(lines)


def main(argv=None):
    ap = argparse.ArgumentParser(
        description=__doc__.splitlines()[0])
    ap.add_argument("--mode", choices=("train", "infer"),
                    default="train")
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--steps", type=int, default=5)
    ap.add_argument("--top", type=int, default=25)
    ap.add_argument("--threshold", type=float, default=0.85,
                    help="flag ops below this fraction of their own "
                         "roofline bound")
    ap.add_argument("--flop_peak", type=float, default=FLOP_PEAK_TFLOPS,
                    help="chip peak, TFLOP/s (bf16)")
    ap.add_argument("--hbm_peak", type=float, default=HBM_PEAK_GBS,
                    help="chip HBM peak, GB/s")
    ap.add_argument("--trace_dir", default=None)
    ap.add_argument("--conv_backend", default="xla")
    ap.add_argument("--stem_backend", default="auto")
    ap.add_argument("--augment_backend", default="auto")
    ap.add_argument("--backbone", default="resnet-18")
    ap.add_argument("--json", default=None,
                    help="also dump the full report as JSON")
    args = ap.parse_args(argv)

    from ..utils.profiler import hlo_stats_rows, trace_steps
    from .profile_step import _flagship

    run_steps = _flagship(args.mode, args.batch, args.conv_backend,
                          args.stem_backend, args.augment_backend,
                          backbone=args.backbone)
    run_steps(3)  # compile + warmup
    t0 = time.perf_counter()
    run_steps(args.steps)
    dt = time.perf_counter() - t0
    print(f"untraced: {dt / args.steps * 1e3:.1f} ms/step, "
          f"{args.batch * args.steps / dt:.0f} img/s at b{args.batch} "
          f"({args.mode})")
    trace_dir = args.trace_dir or tempfile.mkdtemp(prefix="roofline_")
    with trace_steps(trace_dir):
        run_steps(args.steps)
    print(f"trace: {trace_dir}")
    rows = hlo_stats_rows(trace_dir)
    rep = roofline_report(rows, args.steps,
                          flop_peak_tflops=args.flop_peak,
                          hbm_peak_gbs=args.hbm_peak)
    print(format_report(rep, top=args.top, threshold=args.threshold))
    if args.json:
        with open(args.json, "w") as f:
            json.dump(rep, f, indent=1)
        print(f"json: {args.json}")


if __name__ == "__main__":
    main()
