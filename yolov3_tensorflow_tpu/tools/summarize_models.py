"""Model summaries — the ``model.summary()`` / ``plot_model`` equivalent of
the reference's detector __main__ (yolov3/yolov3_detector.py:154-165).

Prints, for each backbone: head output shapes, parameter count, parameter
bytes, and the per-module parameter breakdown.  ``--svg_dir DIR`` also
renders one architecture diagram per backbone (the reference commits
``plot_model`` SVGs for all five, images/*.svg) — every layer box comes
from the ACTUAL flax module tree via ``capture_intermediates`` under
``jax.eval_shape`` (zero FLOPs), so shapes/params can never drift from
the code the way a hand-drawn figure would.
"""
from __future__ import annotations

import argparse
import html
import os
import re


def summarize(backbone: str, input_hw=(384, 480), class_num: int = 20):
    import jax
    import jax.numpy as jnp

    from ..config import Config
    from ..models.detector import build_detector

    cfg = Config(input_image_size=(input_hw[0], input_hw[1], 3),
                 class_num=class_num, model_backbone=backbone)
    model = build_detector(cfg)
    x = jnp.zeros((1, input_hw[0], input_hw[1], 3))
    variables = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), x, train=False))
    params = variables["params"]

    print(f"backbone: {backbone}  input: {input_hw}  "
          f"class_num: {class_num}")
    heads = jax.eval_shape(
        lambda v: model.apply(v, x, train=False), variables)
    for name, h in zip(cfg.head_names, heads):
        print(f"  {name}: {tuple(h.shape)}")

    total = 0
    by_module = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        keys = [str(getattr(p, "key", p)) for p in path]
        n = 1
        for d in leaf.shape:
            n *= d
        total += n
        top = keys[0]
        by_module[top] = by_module.get(top, 0) + n
    for mod, n in sorted(by_module.items(), key=lambda kv: -kv[1]):
        print(f"  {mod:28s} {n:>12,d} params")
    print(f"  {'TOTAL':28s} {total:>12,d} params "
          f"({total * 4 / 1e6:.1f} MB fp32)")
    print("=" * 64)


def _layer_rows(backbone: str, input_hw, class_num: int):
    """(scope, layer, out_shape, params) rows in creation order, from
    the flax module tree under eval_shape (no compute)."""
    import jax
    import jax.numpy as jnp

    from ..config import Config
    from ..models.detector import build_detector

    cfg = Config(input_image_size=(input_hw[0], input_hw[1], 3),
                 class_num=class_num, model_backbone=backbone)
    model = build_detector(cfg)
    x = jnp.zeros((1, input_hw[0], input_hw[1], 3))
    variables = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), x, train=False))
    _, mut = jax.eval_shape(
        lambda v: model.apply(v, x, train=False,
                              capture_intermediates=True,
                              mutable=["intermediates"]), variables)

    def walk(t, p=()):
        if isinstance(t, dict):
            for k, v in t.items():
                yield from walk(v, p + (k,))
        else:
            yield p, t

    def first_shape(v):
        while isinstance(v, (tuple, list)):
            if not v:
                return None
            v = v[0]
        return tuple(v.shape) if hasattr(v, "shape") else None

    # per-layer param counts, keyed by path prefix ("backbone/Conv_0")
    pcount: dict = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(
            variables["params"])[0]:
        keys = [str(getattr(k, "key", k)) for k in path]
        n = 1
        for d in leaf.shape:
            n *= d
        for depth in (1, 2):
            pref = "/".join(keys[:depth])
            pcount[pref] = pcount.get(pref, 0) + n

    rows = []
    for p, v in walk(mut["intermediates"]):
        if p[-1] != "__call__" or len(p) < 2:
            continue
        # skip container modules (their __call__ yields a tuple of
        # taps — e.g. the backbone itself); keep leaf layers only
        if isinstance(v, (tuple, list)) and v and \
                isinstance(v[0], (tuple, list)):
            continue
        name = "/".join(p[:-1])
        scope = p[0] if len(p) > 2 or p[0] == "backbone" else "detector"
        shape = first_shape(v)
        if shape is None:
            continue
        rows.append((scope, name, shape, pcount.get(name, 0)))

    def order(row):
        m = re.search(r"_(\d+)$", row[1])
        idx = int(m.group(1)) if m else 10 ** 6
        scope_rank = {"backbone": 0, "detector": 1}.get(row[0], 2)
        return (scope_rank, row[1].rsplit("_", 1)[0]
                if m else row[1], idx)

    rows.sort(key=order)
    return rows


# neutral palette keyed by layer kind
_SVG_FILL = {"Conv": "#cfe3f5", "FusedBatchNorm": "#e8e8e8",
             "head": "#f5d9c8", "input": "#dff0d8"}


def render_svg(backbone: str, input_hw, rows) -> str:
    """Vertical layer-flow diagram: one box per parameterized layer
    (BatchNorms are folded onto their conv's row), heads at the
    bottom."""
    convs = [r for r in rows if "FusedBatchNorm" not in r[1]
             and not r[1].startswith("head_out")]
    bn_names = {r[1].replace("FusedBatchNorm", "Conv"): True
                for r in rows if "FusedBatchNorm" in r[1]}
    heads = [r for r in rows if r[1].startswith("head_out")]

    bw, bh, gap, x0, y0 = 300, 26, 10, 130, 56
    width = bw + 300
    height = y0 + (len(convs) + 1) * (bh + gap) + \
        (bh + gap) + 70
    out = [f'<svg xmlns="http://www.w3.org/2000/svg" width="{width}" '
           f'height="{height}" font-family="Helvetica,Arial,sans-serif" '
           f'font-size="12">',
           f'<text x="{x0}" y="20" font-size="16" font-weight="bold">'
           f'{html.escape(backbone)} YOLOv3 — input '
           f'{input_hw[0]}x{input_hw[1]}x3</text>']

    def box(x, y, w, h, fill, label, right=""):
        out.append(f'<rect x="{x}" y="{y}" width="{w}" height="{h}" '
                   f'rx="4" fill="{fill}" stroke="#666"/>')
        out.append(f'<text x="{x + 8}" y="{y + h - 8}">'
                   f'{html.escape(label)}</text>')
        if right:
            out.append(f'<text x="{x + w + 8}" y="{y + h - 8}" '
                       f'fill="#444">{html.escape(right)}</text>')

    y = y0
    box(x0, y - bh - gap + 4, bw, bh, _SVG_FILL["input"],
        f"input  1x{input_hw[0]}x{input_hw[1]}x3")
    prev_scope = None
    for scope, name, shape, params in convs:
        if scope != prev_scope:
            out.append(f'<text x="10" y="{y + bh - 8}" fill="#888" '
                       f'font-style="italic">{html.escape(scope)}'
                       f'</text>')
            prev_scope = scope
        kind = name.split("/")[-1].rsplit("_", 1)[0]
        fill = _SVG_FILL.get(kind, "#ffffff")
        label = name + (" +BN" if name in bn_names else "")
        shp = "x".join(str(d) for d in shape[1:])
        box(x0, y, bw, bh, fill, label,
            f"{shp}   {params:,d} params" if params else shp)
        out.append(f'<line x1="{x0 + bw // 2}" y1="{y - gap}" '
                   f'x2="{x0 + bw // 2}" y2="{y}" stroke="#666" '
                   f'marker-end="url(#a)"/>')
        y += bh + gap
    # heads fan out on one row
    hw3 = (bw - 2 * gap) // 3 if heads else bw
    out.append(f'<defs><marker id="a" viewBox="0 0 10 10" refX="9" '
               f'refY="5" markerWidth="6" markerHeight="6" '
               f'orient="auto-start-reverse">'
               f'<path d="M 0 0 L 10 5 L 0 10 z" fill="#666"/>'
               f'</marker></defs>')
    for i, (scope, name, shape, params) in enumerate(sorted(heads)):
        hx = x0 + i * (hw3 + gap)
        out.append(f'<line x1="{x0 + bw // 2}" y1="{y - gap}" '
                   f'x2="{hx + hw3 // 2}" y2="{y + 14}" '
                   f'stroke="#666" marker-end="url(#a)"/>')
        shp = "x".join(str(d) for d in shape[1:])
        box(hx, y + 14, hw3, bh, _SVG_FILL["head"], name, "")
        out.append(f'<text x="{hx + 4}" y="{y + 14 + 2 * bh}" '
                   f'fill="#444" font-size="11">{shp}</text>')
    out.append("</svg>")
    return "\n".join(out)


def main(argv=None):
    from ..config import ALL_BACKBONES
    p = argparse.ArgumentParser()
    p.add_argument("--backbone", default=None,
                   help="one backbone; default: all")
    p.add_argument("--input", default="384x480")
    p.add_argument("--class_num", type=int, default=20)
    p.add_argument("--svg_dir", default=None,
                   help="also write <backbone>.svg architecture "
                        "diagrams here (plot_model parity, "
                        "reference images/*.svg)")
    a = p.parse_args(argv)
    h, w = (int(v) for v in a.input.split("x"))
    names = [a.backbone] if a.backbone else list(ALL_BACKBONES)
    for name in names:
        summarize(name, (h, w), a.class_num)
        if a.svg_dir:
            os.makedirs(a.svg_dir, exist_ok=True)
            rows = _layer_rows(name, (h, w), a.class_num)
            path = os.path.join(a.svg_dir, f"{name}.svg")
            with open(path, "w") as f:
                f.write(render_svg(name, (h, w), rows))
            print(f"  svg: {path}")


if __name__ == "__main__":
    main()
