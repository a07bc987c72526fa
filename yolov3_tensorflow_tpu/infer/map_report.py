"""Cartucho-style mAP report artifacts.

The reference computes no metric in-repo: ``run.py:78-79`` points users
at the external Cartucho/mAP tool (README.md:137), whose ``output/``
directory holds a results text file, one precision-recall plot per
class, a per-class AP bar chart, and a ground-truth count chart.  This
module writes the equivalent artifacts from :mod:`infer.evaluator`
reports, making the delegated workflow first-class:

    yolov3-tpu --mode test --map_report_dir out/ \
        [--class_name_path dataset/test_sample/class.txt]

Artifacts written under ``--map_report_dir``:
  * ``results.txt``      — per-class AP, mAP, GT counts, FP-only classes
  * ``classes/<name>.png`` — precision-recall curve per class (present
    when the report carries ``pr_curves``, i.e. ``with_curves=True``)
  * ``mAP.png``          — per-class AP bar chart
  * ``ground-truth-info.png`` — GT object count per class

Class names follow the ``class.txt`` convention (one name per line,
line k = class k — dataset/test_sample/class.txt); ids without a name
fall back to ``class_<id>``.
"""
from __future__ import annotations

import math
import os
import re
from typing import Dict, List, Optional, Sequence

# single-hue marks on a light surface: these plots encode magnitude of
# one series per panel, so one accent + neutral ink is the whole palette
_ACCENT = "#3b6fb6"
_INK = "#39424e"
_GRID = "#d9dee4"


def load_class_names(path: str) -> List[str]:
    """Read class.txt-convention names: one per line, line k = class k.
    Blank lines are preserved as positional padding only when interior
    (trailing whitespace-only lines are dropped)."""
    with open(path, "r", encoding="utf-8") as f:
        names = [ln.strip() for ln in f]
    while names and not names[-1]:
        names.pop()
    return names


def class_label(cls: int, class_names: Optional[Sequence[str]]) -> str:
    if class_names is not None and 0 <= cls < len(class_names):
        name = str(class_names[cls]).strip()
        if name:
            return name
    return f"class_{cls}"


def _safe_filename(name: str) -> str:
    return re.sub(r"[^A-Za-z0-9._-]+", "_", name) or "class"


def format_results_txt(report: Dict,
                       class_names: Optional[Sequence[str]] = None) -> str:
    """The results.txt body (Cartucho/mAP's output.txt layout: one
    'xx.xx% = <class> AP' line per class, then the mAP line)."""
    lines = ["# AP per class", ""]
    per_class = report.get("per_class", {})
    for cls in sorted(per_class):
        ap = per_class[cls]
        label = class_label(int(cls), class_names)
        if isinstance(ap, float) and math.isnan(ap):
            lines.append(f"  n/a  = {label} AP (no ground truth)")
        else:
            lines.append(f"{100.0 * ap:6.2f}% = {label} AP")
    lines += ["", "# mAP of all classes", "",
              f"mAP = {100.0 * report.get('mAP', 0.0):.2f}%"]
    for key in ("mAP@0.5", "mAP@0.75"):
        if key in report:
            lines.append(f"{key} = {100.0 * report[key]:.2f}%")
    num_gt = report.get("num_gt", {})
    if num_gt:
        lines += ["", "# Number of ground-truth objects per class", ""]
        for cls in sorted(num_gt):
            lines.append(f"{class_label(int(cls), class_names)}: "
                         f"{int(num_gt[cls])}")
    fp_only = report.get("false_positive_classes", {})
    if fp_only:
        lines += ["", "# Classes detected but absent from the ground "
                  "truth (excluded from mAP)", ""]
        for cls in sorted(fp_only):
            lines.append(f"{class_label(int(cls), class_names)}: "
                         f"{int(fp_only[cls])} detections")
    return "\n".join(lines) + "\n"


def _style_axes(ax):
    ax.grid(True, color=_GRID, linewidth=0.6)
    ax.set_axisbelow(True)
    for side in ("top", "right"):
        ax.spines[side].set_visible(False)
    for side in ("left", "bottom"):
        ax.spines[side].set_color(_GRID)
    ax.tick_params(colors=_INK, labelsize=9)


def write_map_report(report: Dict, out_dir: str,
                     class_names: Optional[Sequence[str]] = None
                     ) -> List[str]:
    """Write all report artifacts; returns the written paths."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    os.makedirs(out_dir, exist_ok=True)
    written = []

    path = os.path.join(out_dir, "results.txt")
    with open(path, "w", encoding="utf-8") as f:
        f.write(format_results_txt(report, class_names))
    written.append(path)

    per_class = {int(c): v for c, v in report.get("per_class", {}).items()
                 if not (isinstance(v, float) and math.isnan(v))}
    labels = {c: class_label(c, class_names) for c in per_class}

    # one PR panel per class: single series, so the title names it (no
    # legend); AP value rides the title instead of a point-label spray
    curves = report.get("pr_curves", {})
    if curves:
        cls_dir = os.path.join(out_dir, "classes")
        os.makedirs(cls_dir, exist_ok=True)
        iou = report.get("pr_curves_iou", 0.5)
        for cls, curve in sorted(curves.items()):
            cls = int(cls)
            label = class_label(cls, class_names)
            fig, ax = plt.subplots(figsize=(5, 4))
            _style_axes(ax)
            r = [0.0] + list(curve["recall"])
            p = [1.0] + list(curve["precision"])
            ax.plot(r, p, color=_ACCENT, linewidth=2)
            ax.fill_between(r, p, color=_ACCENT, alpha=0.12)
            ax.set_xlim(0, 1.05)
            ax.set_ylim(0, 1.05)
            ax.set_xlabel("recall", color=_INK)
            ax.set_ylabel("precision", color=_INK)
            ap = per_class.get(cls)
            ap_txt = f"AP {100.0 * ap:.2f}%" if ap is not None else ""
            ax.set_title(f"{label} — {ap_txt} (IOU {iou:g})",
                         color=_INK, fontsize=11)
            fig.tight_layout()
            out = os.path.join(cls_dir, f"{_safe_filename(label)}.png")
            fig.savefig(out, dpi=120)
            plt.close(fig)
            written.append(out)

    def _barh(values: Dict[int, float], title: str, fname: str,
              as_pct: bool):
        if not values:
            return
        order = sorted(values, key=lambda c: values[c])
        y = range(len(order))
        vals = [values[c] for c in order]
        fig, ax = plt.subplots(
            figsize=(7, max(2.0, 0.38 * len(order) + 1.2)))
        _style_axes(ax)
        ax.barh(list(y), vals, color=_ACCENT, height=0.62)
        ax.set_yticks(list(y))
        ax.set_yticklabels([labels.get(c, class_label(c, class_names))
                            for c in order], color=_INK, fontsize=9)
        span = max(vals) if vals else 1.0
        for yi, v in zip(y, vals):
            txt = f"{100.0 * v:.2f}%" if as_pct else f"{int(v)}"
            ax.text(v + 0.01 * max(span, 1e-9), yi, txt, va="center",
                    color=_INK, fontsize=9)
        ax.set_xlim(0, span * 1.18 if span else 1.0)
        ax.set_title(title, color=_INK, fontsize=11)
        fig.tight_layout()
        out = os.path.join(out_dir, fname)
        fig.savefig(out, dpi=120)
        plt.close(fig)
        written.append(out)

    _barh(per_class, f"mAP = {100.0 * report.get('mAP', 0.0):.2f}%",
          "mAP.png", as_pct=True)
    _barh({int(c): float(n) for c, n in report.get("num_gt", {}).items()},
          "ground-truth objects per class", "ground-truth-info.png",
          as_pct=False)
    return written
