"""Model summaries — the ``model.summary()`` / ``plot_model`` equivalent of
the reference's detector __main__ (yolov3/yolov3_detector.py:154-165).

Prints, for each backbone: head output shapes, parameter count, parameter
bytes, and the per-module parameter breakdown.
"""
from __future__ import annotations

import argparse


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


def main(argv=None):
    from ..config import ALL_BACKBONES
    p = argparse.ArgumentParser()
    p.add_argument("--backbone", default=None,
                   help="one backbone; default: all")
    p.add_argument("--input", default="384x480")
    p.add_argument("--class_num", type=int, default=20)
    a = p.parse_args(argv)
    h, w = (int(v) for v in a.input.split("x"))
    names = [a.backbone] if a.backbone else list(ALL_BACKBONES)
    for name in names:
        summarize(name, (h, w), a.class_num)


if __name__ == "__main__":
    main()
