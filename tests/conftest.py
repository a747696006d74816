"""Test configuration: run everything on an 8-virtual-device CPU platform so
multi-chip sharding paths (mesh + shard_map + psum) are exercised without TPU
hardware.  Mirrors the strategy SURVEY.md §4 prescribes for the TPU build.

NOTE: this environment pre-imports jax at interpreter startup (TPU plugin
registration), so env vars set here would be too late — the platform must be
forced through ``jax.config`` before the first backend query."""

import os

import jax

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
).strip()
jax.config.update("jax_platforms", "cpu")
# Persistent compilation cache: repeated suite runs skip recompiles.
jax.config.update("jax_compilation_cache_dir", "/tmp/qrtpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
assert len(jax.devices()) >= 8, jax.devices()

import numpy as np  # noqa: E402
import pytest  # noqa: E402

from quickrank_tpu.data.synthetic import make_train_valid_test  # noqa: E402


@pytest.fixture(scope="session")
def splits():
    """Deterministic synthetic train/valid/test LETOR-style splits."""
    return make_train_valid_test()


@pytest.fixture()
def rng():
    """Function-scoped: a session-scoped shared stream made every
    rng-consuming test's data depend on which tests ran before it — a
    failure seen in a full run could not be reproduced by running the
    failing test alone (different draws), and adding any rng-using test
    reshuffled inputs for all later ones."""
    return np.random.default_rng(1234)
