"""Test configuration: force CPU jax with a virtual 8-device mesh so
multi-chip sharding paths are exercised without TPU hardware (SURVEY §4)."""
import os

# The environment pre-imports jax with an 'axon' TPU platform plugin
# (sitecustomize); env vars alone don't override it. Force CPU via the
# config API before any backend initialization.
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

from segmentation_pipeline_tpu.core.subject import LabelMap, ScalarImage, Subject  # noqa: E402


def make_subject(spatial_shape=(24, 20, 16), channels=1, seed=0, with_label=True,
                 label_values=None, spacing=(1.0, 1.0, 1.0), name="sub-001"):
    """Procedural synthetic subject: smooth intensity + blobby label."""
    rng = np.random.default_rng(seed)
    W, H, D = spatial_shape
    data = rng.normal(size=(channels, W, H, D)).astype(np.float32)
    affine = np.diag([*spacing, 1.0])
    subject = Subject(name=name, folder="/tmp")
    subject["img"] = ScalarImage(tensor=data, affine=affine)
    if with_label:
        if label_values is None:
            label_values = {"fg": 1}
        labels = np.zeros((1, W, H, D), dtype=np.int32)
        # blob in the middle
        labels[:, W // 4: 3 * W // 4, H // 4: 3 * H // 4, D // 4: 3 * D // 4] = 1
        if len(label_values) > 1:
            labels[:, W // 2:, :, :] *= 2
        subject["seg"] = LabelMap(tensor=labels, affine=affine,
                                  label_values=dict(label_values))
    return subject


@pytest.fixture
def subject():
    return make_subject()
