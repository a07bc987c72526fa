"""Parse an xprof trace directory into a per-op HLO time table.

Thin CLI over ``yolov3_tensorflow_tpu.utils.profiler`` (the committed
hlo_stats parser, which aggregates ONLY the newest plugins/profile/<ts>/
run subdir — a reused --trace_dir holds several, and summing across runs
silently doubles or cross-mixes the per-op figures these tables exist to
compare).  Replaces the ad-hoc /tmp parser used in rounds 2-3.

Usage: python experiments/parse_hlo_stats.py /tmp/tr_r3 [top_n] [steps]
(``steps`` divides the trace totals into per-step figures).
"""
import os
import sys

# Running a script puts ITS directory (experiments/) on sys.path, not the
# cwd — bootstrap the repo root so the package imports regardless of cwd.
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    trace_dir = sys.argv[1]
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 40
    steps = int(sys.argv[3]) if len(sys.argv) > 3 else 1
    from yolov3_tensorflow_tpu.utils.profiler import (format_op_table,
                                                      hlo_op_table)
    by_cat, ops = hlo_op_table(trace_dir)
    print(format_op_table(by_cat, ops, top_n=top_n, steps=steps))


if __name__ == "__main__":
    main()
