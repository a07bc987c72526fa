"""Automated learning-rate range test.

The reference documents a MANUAL LR-range-finding protocol: swap the
schedule arrays for ``check_epochs``/``check_learning_rates``
(reference configs.py:14-15; mirrored as Config.check_step_epoch /
check_step_lr), train a few epochs per decade, and eyeball the
TensorBoard loss curves (reference README.md:30-32).  This tool
automates it with the standard exponential-ramp range test: run N
train steps while the learning rate sweeps min_lr -> max_lr
geometrically, record the loss at every step, smooth, and report

  * ``lr_at_min``   — lr of the minimum smoothed loss (the cliff edge)
  * ``suggested``   — one decade below lr_at_min (the usual range-test
                      convention: train in the steepest-descent region,
                      not at the edge of divergence)
  * ``diverged_at`` — first lr where the smoothed loss exceeds
                      ``divergence_ratio x`` the best seen (sweep stops)

plus a CSV of (step, lr, loss, smoothed) for plotting.

The rectified coordinate warmup is disabled for the sweep by default
(--rectified to keep it): its t^2 term decays with the image counter on
a schedule of its own, which confounds the loss-vs-lr signal.

Usage (defaults target the bundled reference sample):
  python -m yolov3_tensorflow_tpu.tools.lr_range_test \
      --label_path dataset/test_sample/label.txt \
      --image_dir dataset/test_sample/images --class_num 13 \
      --min_lr 1e-8 --max_lr 1e-2 --steps 200 --out /tmp/lr_range.csv
"""
from __future__ import annotations

import argparse
import logging
import tempfile

import numpy as np


def smooth(losses, window: int):
    """Trailing moving average (full windows only at the tail end)."""
    out = np.empty(len(losses))
    for i in range(len(losses)):
        lo = max(0, i - window + 1)
        out[i] = np.mean(losses[lo:i + 1])
    return out


def analyze(lrs, losses, window: int, divergence_ratio: float):
    """-> dict(lr_at_min, suggested, diverged_at, smoothed)."""
    sm = smooth(np.asarray(losses, float), window)
    best = int(np.argmin(sm))
    diverged_at = None
    for i in range(best, len(sm)):
        if sm[i] > divergence_ratio * sm[best]:
            diverged_at = float(lrs[i])
            break
    return {
        "lr_at_min": float(lrs[best]),
        "suggested": float(lrs[best]) / 10.0,
        "diverged_at": diverged_at,
        "smoothed": sm,
    }


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--label_path", default="dataset/test_sample/label.txt")
    p.add_argument("--image_dir", default="dataset/test_sample/images")
    p.add_argument("--class_num", type=int, default=13)
    p.add_argument("--backbone", default="resnet-18")
    p.add_argument("--optimizer", default="radam")
    p.add_argument("--batch_size", type=int, default=4)
    p.add_argument("--num_devices", type=int, default=0,
                   help="data-parallel mesh size (0 = all devices; "
                        "batch_size must divide it)")
    p.add_argument("--input_size", default="416x416")
    p.add_argument("--min_lr", type=float, default=1e-8)
    p.add_argument("--max_lr", type=float, default=1e-2)
    p.add_argument("--steps", type=int, default=200)
    p.add_argument("--window", type=int, default=0,
                   help="smoothing window (default: steps/20)")
    p.add_argument("--divergence_ratio", type=float, default=4.0,
                   help="stop when smoothed loss exceeds this multiple "
                        "of the best seen")
    p.add_argument("--rectified", action="store_true",
                   help="keep the rectified coord warmup on during the "
                        "sweep (default off: its decaying t^2 term "
                        "confounds the loss-vs-lr signal)")
    p.add_argument("--no_augment", action="store_true")
    p.add_argument("--out", default="lr_range.csv",
                   help="CSV output: step, lr, loss, smoothed")
    p.add_argument("--plot", default="",
                   help="also write a loss-vs-lr plot (PNG) here")
    a = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from ..config import Config
    from ..data.loader import Dataset
    from ..train.optimizers import make_optimizer
    from ..train.trainer import YOLOv3Trainer

    logging.basicConfig(level=logging.INFO)
    h, w = (int(v) for v in a.input_size.split("x"))
    kw = {} if a.rectified else dict(rectified_coord_num=-1)
    cfg = Config(
        train_label_path=a.label_path, train_set_dir=a.image_dir,
        batch_size=a.batch_size, class_num=a.class_num,
        model_backbone=a.backbone, optimizer=a.optimizer,
        input_image_size=(h, w, 3), num_devices=a.num_devices,
        is_augment=not a.no_augment, **kw)
    trainer = YOLOv3Trainer(cfg, restore=False,
                            checkpoint_dir=tempfile.mkdtemp())

    total = max(2, a.steps)
    ratio = a.max_lr / a.min_lr

    def ramp(step):
        # geometric min_lr -> max_lr over `total` steps (jit-traceable)
        frac = jnp.asarray(step, jnp.float32) / float(total - 1)
        return a.min_lr * jnp.power(ratio, frac)

    trainer.tx, trainer.schedule = make_optimizer(cfg, schedule=ramp)
    trainer._build_steps()

    ds = Dataset(cfg, a.label_path, a.image_dir)
    it = ds.device_prefetch(shardings=trainer.input_shardings)

    lrs, losses = [], []
    window = a.window or max(1, total // 20)
    best = float("inf")
    for step in range(total):
        batch = next(it)
        trainer.state, m = trainer.train_step(
            trainer.state, jnp.asarray(batch.images),
            jnp.asarray(batch.labels))
        loss = float(m["total_loss"])
        lrs.append(float(m["lr"]))
        losses.append(loss)
        if not np.isfinite(loss):
            logging.info("loss went non-finite at lr=%.3g — stopping",
                         lrs[-1])
            break
        sm_now = float(np.mean(losses[max(0, len(losses) - window):]))
        best = min(best, sm_now)
        if sm_now > a.divergence_ratio * best:
            logging.info("diverged at lr=%.3g (smoothed %.3f > %.1fx "
                         "best %.3f) — stopping", lrs[-1], sm_now,
                         a.divergence_ratio, best)
            break

    finite = np.isfinite(np.asarray(losses, float))
    r = analyze(np.asarray(lrs)[finite],
                np.asarray(losses, float)[finite],
                window, a.divergence_ratio)
    with open(a.out, "w") as f:
        f.write("step,lr,loss,smoothed\n")
        si = 0
        for i, (lr, lo) in enumerate(zip(lrs, losses)):
            sm = r["smoothed"][si] if finite[i] else float("nan")
            si += int(finite[i])
            f.write(f"{i},{lr:.6g},{lo:.6g},{sm:.6g}\n")

    if a.plot:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        fig, ax = plt.subplots(figsize=(7, 4))
        ax.plot(np.asarray(lrs)[finite],
                np.asarray(losses, float)[finite],
                alpha=0.35, label="loss")
        ax.plot(np.asarray(lrs)[finite], r["smoothed"],
                label=f"smoothed (w={window})")
        ax.axvline(r["lr_at_min"], ls="--", c="tab:red", label="lr_at_min")
        ax.axvline(r["suggested"], ls="--", c="tab:green",
                   label="suggested")
        ax.set_xscale("log")
        ax.set_xlabel("learning rate")
        ax.set_ylabel("train loss")
        ax.legend()
        fig.tight_layout()
        fig.savefig(a.plot, dpi=120)
        logging.info("plot written to %s", a.plot)

    div = (f"{r['diverged_at']:.3g}" if r["diverged_at"] is not None
           else "never (raise --max_lr)")
    print(f"lr range test ({len(losses)} steps, {a.optimizer}): "
          f"min smoothed loss at lr={r['lr_at_min']:.3g}; "
          f"suggested init_lr={r['suggested']:.3g}; "
          f"diverged at {div}; data in {a.out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
