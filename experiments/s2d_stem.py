"""REJECTED (round 3, measured end-to-end): space-to-depth stem conv.

The 3x3/stride-2 SAME stem convolution computed exactly as a 2x2/s1
convolution on the space-to-depth input view: tap a of the 2x2 conv
reads s2d row i+a covering original rows {2i+2a+p}, so
k2[a,b,(p,q,c)] = k3[2a+p, 2b+q, c] with the (a,p)=(1,1) entries zero;
SAME padding for even H/W (pad-after: lo=0, hi=1) maps to
[(0,1),(0,1)] on the s2d image.  Verified exact: f32 values to 1e-6,
weight gradient bit-identical (the wgrad flows through the
pad/reshape/transpose of the tiny kernel tensor).

Motivation was the per-op trace's low stem MXU rates (fwd 15 TFLOP/s,
wgrad 9.9 — Cin=3 fills 27/128 contraction rows; s2d lifts both to 48).
MEASURED END-TO-END (trace harness, b128, fused-stem config):

  | op                    | direct        | s2d            |
  |-----------------------|---------------|----------------|
  | stem conv fwd + stats | 1.35 ms @ 15.1| 1.40 ms @ 25.1 |
  | stem conv wgrad       | 2.10 ms @ 9.9 | 2.17 ms @ 16.4 |
  | data formatting       | 2.96 ms       | 4.98 ms        |
  | device total /step    | 65.6 ms       | 66.1 ms        |

The TFLOP/s rates were a red herring: both stem convs are BANDWIDTH
bound on the 208^2 x 64 x 128 y/dy tensors (~708 MB each at bf16;
~1 ms floor at 819 GB/s), so quadrupling the contraction rows raises
the rate exactly in proportion to the extra (zero-padded) FLOPs and
leaves wall time unchanged — while the s2d input transpose
materializes a +2.0 ms data-formatting pass that nothing absorbs.
Net: -0.5 ms/step END-TO-END LOSS.  This confirms round 2's
standalone rejection with the correct mechanism; folding the s2d
write into the augmentation epilogue would at best reach parity.

Run: PYTHONPATH=/root/repo:/root/.axon_site python experiments/s2d_stem.py
(CPU equivalence checks; see experiments/trace_step.py for the
end-to-end harness used for the table above.)
"""
from typing import Any

import numpy as np

import jax
import jax.numpy as jnp
from flax import linen as nn


class S2dStemConv(nn.Module):
    """Exact s2d rewrite of the 3x3/s2 SAME stem conv (see module doc).

    The parameter keeps the reference-shaped (3,3,Cin,features) kernel
    so checkpoints would be interchangeable with the direct-conv stem.
    Requires even H and W.
    """

    features: int
    out_hwcn: bool = False
    kernel_init: Any = nn.initializers.he_normal()
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        n, h, w, cin = x.shape
        kernel = self.param("kernel", self.kernel_init,
                            (3, 3, cin, self.features), self.param_dtype)
        x = x.astype(self.dtype)
        # space-to-depth: (N,H,W,C) -> (N,H/2,W/2,4C), channel index
        # (p*2+q)*C + c with p,q the row/col parities
        xs = x.reshape(n, h // 2, 2, w // 2, 2, cin)
        xs = xs.transpose(0, 1, 3, 2, 4, 5).reshape(n, h // 2, w // 2,
                                                    4 * cin)
        # kernel: pad 3x3 taps to 4x4 so r -> (a=r//2, p=r%2) is a
        # plain reshape, then interleave to (a,b,(p,q,c),o)
        k4 = jnp.pad(kernel, ((0, 1), (0, 1), (0, 0), (0, 0)))
        k2 = k4.reshape(2, 2, 2, 2, cin, self.features)
        k2 = k2.transpose(0, 2, 1, 3, 4, 5).reshape(2, 2, 4 * cin,
                                                    self.features)
        dn = ("NHWC", "HWIO", "HWCN" if self.out_hwcn else "NHWC")
        return jax.lax.conv_general_dilated(
            xs, k2.astype(self.dtype), window_strides=(1, 1),
            padding=((0, 1), (0, 1)), dimension_numbers=dn,
            preferred_element_type=self.dtype)


def main():
    jax.config.update("jax_platforms", "cpu")
    import sys
    sys.path.insert(0, "/root/repo")
    from yolov3_tensorflow_tpu.models.layers import HwcnConv

    rng = np.random.RandomState(0)
    for (h, w, dt) in [(416, 416, jnp.float32), (416, 416, jnp.bfloat16),
                       (20, 12, jnp.float32)]:
        x = jnp.asarray(rng.randn(2, h, w, 3).astype(np.float32))
        m1 = S2dStemConv(features=64, out_hwcn=True, dtype=dt)
        m2 = HwcnConv(features=64, kernel_size=(3, 3), strides=(2, 2),
                      out_hwcn=True, dtype=dt)
        v = m1.init(jax.random.PRNGKey(0), x)
        y1, y2 = m1.apply(v, x), m2.apply(v, x)
        err = float(jnp.max(jnp.abs(y1.astype(jnp.float32)
                                    - y2.astype(jnp.float32))))
        print(f"{h}x{w} {jnp.dtype(dt).name}: maxerr {err:.3e}")

    x = jnp.asarray(rng.randn(2, 64, 64, 3).astype(np.float32))
    dy = jnp.asarray(rng.randn(32, 32, 16, 2).astype(np.float32))
    m1 = S2dStemConv(features=16, out_hwcn=True, dtype=jnp.float32)
    m2 = HwcnConv(features=16, kernel_size=(3, 3), strides=(2, 2),
                  out_hwcn=True, dtype=jnp.float32)
    v = m1.init(jax.random.PRNGKey(1), x)
    g1 = jax.grad(lambda p: jnp.vdot(m1.apply(p, x), dy))(v)
    g2 = jax.grad(lambda p: jnp.vdot(m2.apply(p, x), dy))(v)
    k1 = jax.tree_util.tree_leaves(g1)[0]
    k2 = jax.tree_util.tree_leaves(g2)[0]
    print("wgrad maxerr", float(jnp.max(jnp.abs(k1 - k2))))


if __name__ == "__main__":
    main()
