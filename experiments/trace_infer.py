"""Trace the full inference path (forward + decode + batched NMS) and
aggregate device op times — where does the 416x416 infer step spend?

Usage: python experiments/trace_infer.py [batch] [steps] [trace_dir]
Then: python experiments/parse_hlo_stats.py <trace_dir>
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
    from yolov3_tensorflow_tpu.ops.nms import BatchedNMS
    from yolov3_tensorflow_tpu.train.trainer import YOLOv3Trainer

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    trace_dir = sys.argv[3] if len(sys.argv) > 3 else "/tmp/trace_infer"
    cfg = Config(input_image_size=(416, 416, 3), batch_size=batch,
                 max_boxes=32, num_devices=1, confidence_thresh=0.5)
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
    with jax.profiler.trace(trace_dir):
        for _ in range(steps):
            det = infer(trainer.state, images)
        _ = float(jnp.sum(det))
    t0 = time.perf_counter()
    for _ in range(steps):
        det = infer(trainer.state, images)
    _ = float(jnp.sum(det))
    dt = time.perf_counter() - t0
    print(f"untraced: {dt/steps*1e3:.1f} ms/step, "
          f"{batch*steps/dt:.0f} img/s at b{batch}")
    files = glob.glob(trace_dir + "/**/*.xplane.pb", recursive=True)
    print("xplane files:", files)


if __name__ == "__main__":
    main()
