"""Test configuration: force CPU platform with 8 virtual devices so
multi-chip sharding tests run anywhere (SURVEY.md §4).

NOTE: this environment force-registers a TPU ('axon') backend from
sitecustomize at interpreter start, which overrides the JAX_PLATFORMS
env var — the jax.config update below is the authoritative override.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402
import numpy as np  # noqa: E402
import pytest  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# NOTE: the persistent compilation cache is disabled: this image's XLA:CPU
# AOT reload path crashes on machine-feature mismatch (+prefer-no-scatter).


@pytest.fixture
def rng():
    return np.random.default_rng(0)
