"""Measure the infer step with dispatches chained INSIDE one jit
(lax.scan over steps) vs the per-step dispatch loop — quantifies the
axon-relay per-dispatch gap on the inference path (CLAUDE.md: ~3 ms;
the train bench's state dependency hides it, infer's independent
dispatches do not).

Usage: python experiments/infer_chain.py [batch] [steps] [reps]
"""
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

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 4
    cfg = Config(input_image_size=(416, 416, 3), batch_size=batch,
                 max_boxes=32, num_devices=1, confidence_thresh=0.5)
    trainer = YOLOv3Trainer(cfg, restore=False,
                            checkpoint_dir=tempfile.mkdtemp())
    nms = BatchedNMS(cfg)

    def one(state, images):
        heads = trainer.model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            images.astype(jnp.float32) / 255.0, train=False)
        return nms(heads)

    infer = jax.jit(one)

    @jax.jit
    def infer_chain(state, images):
        def body(carry, _):
            # fold a det-derived byte into the input so the step is
            # truly loop-carried (a constant carry gets hoisted by
            # XLA's loop-invariant motion — measured 8x bogus speedup)
            det = one(state, jnp.bitwise_xor(images, carry))
            s = jnp.sum(det)
            nxt = jnp.where(jnp.isfinite(s) & (s != 1.5),
                            jnp.uint8(0), jnp.uint8(1))
            return nxt, s
        _, sums = jax.lax.scan(body, jnp.uint8(0), None, length=steps)
        return sums

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
        best = max(best, batch * steps / (time.perf_counter() - t0))
    print(f"per-step dispatch loop: {best:.0f} img/s at b{batch}")

    sums = infer_chain(trainer.state, images)
    _ = float(jnp.sum(sums))
    best = 0.0
    for _ in range(reps):
        t0 = time.perf_counter()
        sums = infer_chain(trainer.state, images)
        _ = float(jnp.sum(sums))
        best = max(best, batch * steps / (time.perf_counter() - t0))
    print(f"scan-chained in one jit:  {best:.0f} img/s at b{batch}")


if __name__ == "__main__":
    main()
