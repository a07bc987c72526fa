"""Dump the TPU-compiled train step's optimized HLO + cost analysis.

Usage: python experiments/profile_step.py [batch] [out_prefix]
Writes <out_prefix>.hlo.txt and prints aggregate cost analysis.
"""
import sys
import tempfile

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from yolov3_tensorflow_tpu.config import Config
from yolov3_tensorflow_tpu.train.trainer import YOLOv3Trainer


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    prefix = sys.argv[2] if len(sys.argv) > 2 else "/tmp/step"
    cfg = Config(input_image_size=(416, 416, 3), batch_size=batch,
                 max_boxes=32, model_backbone="resnet-18",
                 optimizer="radam", is_augment=True,
                 rectified_coord_num=-1, num_devices=1)
    trainer = YOLOv3Trainer(cfg, restore=False,
                            checkpoint_dir=tempfile.mkdtemp())
    img = jax.ShapeDtypeStruct((batch, 416, 416, 3), jnp.float32)
    lab = jax.ShapeDtypeStruct((batch, 32, 5), jnp.float32)
    sds = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(jnp.shape(x), jnp.asarray(x).dtype),
        trainer.state)
    lowered = trainer.train_step.lower(sds, img, lab)
    compiled = lowered.compile()
    ca = compiled.cost_analysis()
    flops = ca.get("flops", 0.0)
    bytes_acc = ca.get("bytes accessed", 0.0)
    print(f"flops/step:   {flops/1e12:.3f} TFLOP")
    print(f"bytes/step:   {bytes_acc/1e9:.2f} GB")
    for k in sorted(ca):
        if k.startswith("bytes accessed") and ca[k] > 1e8:
            print(f"  {k}: {ca[k]/1e9:.2f} GB")
    txt = compiled.as_text()
    with open(prefix + ".hlo.txt", "w") as fh:
        fh.write(txt)
    print(f"wrote {prefix}.hlo.txt ({len(txt)} chars)")


if __name__ == "__main__":
    main()
