"""Capture a jax.profiler trace of the train step and aggregate device op
times by category from the .xplane.pb protobuf.

Usage: python experiments/trace_step.py [batch] [steps]
"""
import glob
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    import jax
    import jax.numpy as jnp
    from yolov3_tensorflow_tpu.config import Config
    from yolov3_tensorflow_tpu.train.trainer import YOLOv3Trainer

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    backend = sys.argv[4] if len(sys.argv) > 4 else "xla"
    cfg = Config(input_image_size=(416, 416, 3), batch_size=batch,
                 max_boxes=32, model_backbone="resnet-18",
                 optimizer="radam", is_augment=True,
                 rectified_coord_num=-1, num_devices=1,
                 conv_backend=backend)
    trainer = YOLOv3Trainer(cfg, restore=False,
                            checkpoint_dir=tempfile.mkdtemp())
    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.rand(batch, 416, 416, 3).astype(np.float32))
    labels = -np.ones((batch, 32, 5), np.float32)
    labels[:, 0] = [0.5, 0.5, 0.3, 0.3, 0]
    labels = jnp.asarray(labels)
    state = trainer.state
    for _ in range(3):
        state, metrics = trainer.train_step(state, images, labels)
    float(metrics["total_loss"])

    trace_dir = sys.argv[3] if len(sys.argv) > 3 else "/tmp/trace_step"
    with jax.profiler.trace(trace_dir):
        for _ in range(steps):
            state, metrics = trainer.train_step(state, images, labels)
        float(metrics["total_loss"])
    t0 = time.perf_counter()
    for _ in range(steps):
        state, metrics = trainer.train_step(state, images, labels)
    float(metrics["total_loss"])
    dt = time.perf_counter() - t0
    print(f"untraced: {dt/steps*1e3:.1f} ms/step, "
          f"{batch*steps/dt:.0f} img/s")
    print("trace dir:", trace_dir)
    files = glob.glob(trace_dir + "/**/*.xplane.pb", recursive=True)
    print("xplane files:", files)


if __name__ == "__main__":
    main()
