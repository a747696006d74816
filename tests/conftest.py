"""Test configuration: run everything on an 8-virtual-device CPU platform so
multi-chip sharding paths (mesh + shard_map + psum) are exercised without TPU
hardware.  Mirrors the strategy SURVEY.md §4 prescribes for the TPU build."""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402

from quickrank_tpu.data.synthetic import make_train_valid_test  # noqa: E402


@pytest.fixture(scope="session")
def splits():
    """Deterministic synthetic train/valid/test LETOR-style splits."""
    return make_train_valid_test()


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(1234)
