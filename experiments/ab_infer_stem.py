"""A/B the inference path's stem backend (xla vs fused eval kernel).

Measures the full infer step (forward + decode + batched NMS) per
backend, several repeats, chained dispatches, scalar-fetch sync.

Usage: python experiments/ab_infer_stem.py [batch] [steps] [reps]
"""
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def measure(backend, batch, steps, reps):
    import jax
    import jax.numpy as jnp
    from yolov3_tensorflow_tpu.config import Config
    from yolov3_tensorflow_tpu.ops.nms import BatchedNMS
    from yolov3_tensorflow_tpu.train.trainer import YOLOv3Trainer

    cfg = Config(input_image_size=(416, 416, 3), batch_size=batch,
                 max_boxes=32, num_devices=1, confidence_thresh=0.5,
                 stem_backend=backend)
    trainer = YOLOv3Trainer(cfg, restore=False,
                            checkpoint_dir=tempfile.mkdtemp())
    nms = BatchedNMS(cfg)

    @jax.jit
    def infer(state, images):
        heads = trainer.model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            images.astype(jnp.float32) / 255.0, train=False)
        return nms(heads)

    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.randint(0, 255, (batch, 416, 416, 3),
                                     dtype=np.uint8))
    det = infer(trainer.state, images)
    _ = float(jnp.sum(det))
    best = 0.0
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(steps):
            det = infer(trainer.state, images)
        _ = float(jnp.sum(det))
        dt = time.perf_counter() - t0
        best = max(best, batch * steps / dt)
    return best


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 30
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 4
    for backend in ("xla", "fused"):
        r = measure(backend, batch, steps, reps)
        print(f"stem={backend}: best {r:.0f} img/s at b{batch}")


if __name__ == "__main__":
    main()
