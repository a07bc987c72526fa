"""Block-diagonal dense grouped conv (models/layers.py BlockDiagConv)
vs XLA's feature_group_count path: same params, same math.

The dense formulation is the round-5 pure-XLA probe for ResNeXt's
grouped buckets (reference backbone/resnext.py:52-62; VERDICT r4 item 1):
values must match the grouped conv up to reduction order, gradients must
land on the same (block-diagonal) kernel entries, and checkpoints must
load on either path unchanged.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from yolov3_tensorflow_tpu.config import Config
from yolov3_tensorflow_tpu.models.detector import build_detector
from yolov3_tensorflow_tpu.models.layers import BlockDiagConv


@pytest.mark.parametrize("groups,kernel", [(4, (3, 3)), (2, (5, 5))])
def test_blockdiag_matches_grouped(groups, kernel):
    cin, cout = 16, 16
    x = jnp.asarray(np.random.RandomState(0).randn(2, 12, 12, cin),
                    jnp.float32)
    grouped = nn.Conv(features=cout, kernel_size=kernel,
                      feature_group_count=groups, use_bias=False,
                      dtype=jnp.float32, param_dtype=jnp.float32)
    dense = BlockDiagConv(features=cout, kernel_size=kernel,
                          feature_group_count=groups,
                          dtype=jnp.float32, param_dtype=jnp.float32)
    params = grouped.init(jax.random.PRNGKey(1), x)
    # identical param tree: same kernel shape loads on either module
    assert params["params"]["kernel"].shape == (*kernel, cin // groups, cout)
    y_g = grouped.apply(params, x)
    y_d = dense.apply(params, x)
    np.testing.assert_allclose(np.asarray(y_g), np.asarray(y_d),
                               rtol=1e-5, atol=1e-5)

    def loss_g(p):
        return jnp.sum(jnp.sin(grouped.apply(p, x)))

    def loss_d(p):
        return jnp.sum(jnp.sin(dense.apply(p, x)))

    g_g = jax.grad(loss_g)(params)["params"]["kernel"]
    g_d = jax.grad(loss_d)(params)["params"]["kernel"]
    np.testing.assert_allclose(np.asarray(g_g), np.asarray(g_d),
                               rtol=1e-4, atol=1e-5)


def test_blockdiag_strided():
    x = jnp.asarray(np.random.RandomState(1).randn(1, 16, 16, 8), jnp.float32)
    grouped = nn.Conv(features=8, kernel_size=(3, 3), strides=(2, 2),
                      feature_group_count=2, use_bias=False,
                      dtype=jnp.float32, param_dtype=jnp.float32)
    dense = BlockDiagConv(features=8, kernel_size=(3, 3), strides=(2, 2),
                          feature_group_count=2,
                          dtype=jnp.float32, param_dtype=jnp.float32)
    params = grouped.init(jax.random.PRNGKey(2), x)
    np.testing.assert_allclose(np.asarray(grouped.apply(params, x)),
                               np.asarray(dense.apply(params, x)),
                               rtol=1e-5, atol=1e-5)


def test_resnext_dense_backend_shares_checkpoints(tiny_cfg):
    """Full resnext-18 detector: the SAME variables drive both backends
    to the same head outputs (f32 compute for a tight bound)."""
    cfg = tiny_cfg.replace(model_backbone="resnext-18",
                           compute_dtype="float32")
    x = jnp.asarray(np.random.RandomState(2).randn(1, 96, 128, 3) * 0.1,
                    jnp.float32)
    m_grouped = build_detector(cfg.replace(grouped_backend="grouped"))
    m_dense = build_detector(cfg.replace(grouped_backend="dense"))
    variables = m_grouped.init(jax.random.PRNGKey(0), x, train=False)
    # identical tree structure — checkpoints are backend-portable
    assert (jax.tree_util.tree_structure(variables)
            == jax.tree_util.tree_structure(
                m_dense.init(jax.random.PRNGKey(0), x, train=False)))
    h_g = m_grouped.apply(variables, x, train=False)
    h_d = m_dense.apply(variables, x, train=False)
    for a, b in zip(h_g, h_d):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)


def test_depthwise_never_dense():
    """G == channels (depthwise) must stay on the grouped path even when
    grouped_backend forces dense — the mask there is 1/C-dense."""
    from yolov3_tensorflow_tpu.models.layers import BasicBackbone

    class DW(BasicBackbone):
        @nn.compact
        def __call__(self, x):
            return self.depthwise_conv(x)

    m = DW(grouped_backend="dense", dtype=jnp.float32)
    x = jnp.zeros((1, 8, 8, 4), jnp.float32)
    params = m.init(jax.random.PRNGKey(0), x)
    # depthwise nn.Conv kernel: (kh, kw, 1, C)
    assert params["params"]["Conv_0"]["kernel"].shape == (3, 3, 1, 4)
