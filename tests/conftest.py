"""Test harness: force the CPU backend with 8 virtual devices so the
multi-chip sharding path is exercised without TPU hardware (the TPU-native
substitute for the reference's nonexistent distributed tests, SURVEY §4)."""
import os
import sys

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8")

import jax  # noqa: E402

# the axon sitecustomize force-registers the TPU backend; env vars cannot
# override it, only the runtime config can
jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def tiny_cfg():
    from yolov3_tensorflow_tpu.config import Config
    return Config(input_image_size=(96, 128, 3), max_boxes=4, batch_size=2)


@pytest.fixture(scope="session")
def sample_paths():
    root = "/root/reference/dataset/test_sample"
    return {"label": f"{root}/label.txt", "images": f"{root}/images"}


@pytest.fixture(autouse=True)
def _reset_op_mesh():
    """The Pallas-op mesh registration is process-global (any trainer
    construction sets it); clear it around every test so bare-op tests
    are isolated from trainer tests."""
    from yolov3_tensorflow_tpu.ops.partition import set_op_mesh
    set_op_mesh(None)
    yield
    set_op_mesh(None)
