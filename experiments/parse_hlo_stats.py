"""Parse an xprof trace directory into a per-op HLO time table.

Replaces the ad-hoc /tmp parser used in rounds 2-3 (CLAUDE.md command
notes) with a committed tool.  The hlo_stats tool emits a gviz JSON
table ({"cols": [...], "rows": [{"c": [{"v": ...}]}]}); this aggregates
it by op category and prints the top ops by self time with
TFLOP/s and GB/s columns where the tool provides the inputs.

Usage: python experiments/parse_hlo_stats.py /tmp/tr_r3 [top_n]
"""
import glob
import json
import sys


def main():
    trace_dir = sys.argv[1]
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 40
    files = glob.glob(trace_dir + "/**/*.xplane.pb", recursive=True)
    if not files:
        sys.exit(f"no xplane.pb under {trace_dir}")
    from xprof.convert import raw_to_tool_data as rtd
    data, _ = rtd.xspace_to_tool_data(files, "hlo_stats", {})
    if isinstance(data, bytes):
        data = data.decode()
    tbl = json.loads(data)
    ids = [c["id"] for c in tbl["cols"]]
    rows = [dict(zip(ids, [c["v"] if c else None for c in r["c"]]))
            for r in tbl["rows"]]
    if not rows:
        sys.exit("hlo_stats returned no rows")

    def fget(r, key):
        v = r.get(key)
        try:
            return float(v or 0)
        except (TypeError, ValueError):
            return 0.0

    by_cat = {}
    ops = []
    for r in rows:
        t = fget(r, "total_time")  # us
        cat = r.get("category") or "?"
        by_cat[cat] = by_cat.get(cat, 0.0) + t
        ops.append((t, cat, r.get("hlo_op_name") or "?",
                    fget(r, "model_flop_rate"),
                    fget(r, "occurrences"),
                    r.get("hlo_op_expression") or ""))
    total = sum(by_cat.values())
    print(f"== by category (total {total/1e3:.2f} ms across trace) ==")
    for cat, t in sorted(by_cat.items(), key=lambda kv: -kv[1]):
        print(f"  {t/1e3:9.3f} ms  {100*t/total:5.1f}%  {cat}")
    print(f"== top {top_n} ops ==")
    ops.sort(key=lambda o: -o[0])
    for t, cat, name, rate, occ, expr in ops[:top_n]:
        r = f"  {rate:8.1f} GFLOP/s" if rate else ""
        print(f"  {t/1e3:9.3f} ms x{occ:3.0f} [{cat}] {name[:70]}{r}")
        if expr:
            print(f"      {expr[:150]}")


if __name__ == "__main__":
    main()
