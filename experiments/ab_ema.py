"""A/B: train-step throughput with weight EMA on vs off (TPU).

Usage: python experiments/ab_ema.py [batch] [steps]

The EMA update is one elementwise pass over the param tree per step
(~24 MB read + ~12 MB write for resnet-18 YOLOv3 f32 params) — the
expected cost at b128 is well under 0.5 ms/step against a ~70 ms step.
This measures the real number for PERF.md.
"""
import json
import sys
import tempfile
import time

import jax.numpy as jnp
import numpy as np

from yolov3_tensorflow_tpu.config import Config
from yolov3_tensorflow_tpu.train.trainer import YOLOv3Trainer


def run(batch, steps, ema_decay):
    cfg = Config(input_image_size=(416, 416, 3), batch_size=batch,
                 max_boxes=32, model_backbone="resnet-18",
                 optimizer="radam", is_augment=True,
                 rectified_coord_num=-1, num_devices=1,
                 ema_decay=ema_decay)
    trainer = YOLOv3Trainer(cfg, restore=False,
                            checkpoint_dir=tempfile.mkdtemp())
    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.randint(0, 255, (batch, 416, 416, 3),
                                     dtype=np.uint8))
    labels = -np.ones((batch, 32, 5), np.float32)
    labels[:, 0] = [0.5, 0.5, 0.3, 0.3, 0]
    labels = jnp.asarray(labels)
    state = trainer.state
    for _ in range(3):
        state, metrics = trainer.train_step(state, images, labels)
    float(metrics["total_loss"])  # sync (relay: block_until_ready unreliable)
    t0 = time.perf_counter()
    for _ in range(steps):
        state, metrics = trainer.train_step(state, images, labels)
    float(metrics["total_loss"])
    dt = time.perf_counter() - t0
    return batch * steps / dt


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    out = {}
    for label, d in (("ema_off", 0.0), ("ema_0.999", 0.999)):
        best = 0.0
        for _ in range(2):
            best = max(best, run(batch, steps, d))
        out[label] = round(best, 1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
