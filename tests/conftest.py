"""Test configuration: run everything on a virtual 8-device CPU mesh.

This is the TPU-world fake backend (SURVEY.md section 4): multi-chip sharding
is validated on host CPU devices via XLA's host-platform device-count flag.
Must run before jax initializes, hence the env mutation at import time.
"""

import os

os.environ["JAX_PLATFORMS"] = os.environ.get("DEEPSENSE_TEST_PLATFORM", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The axon sitecustomize registers the TPU plugin at interpreter start and
# overrides JAX_PLATFORMS; force the platform again at the config level.
jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
jax.config.update("jax_enable_x64", False)

# Persistent compilation cache: the suite compiles the same full-model HLO
# (init/apply/train_step at identical shapes) in many test modules; caching
# on disk turns every repeat — within a run and across runs — into a load.
jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("DEEPSENSE_TEST_CACHE",
                                 "/tmp/jax_cache_tests"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(100)
