"""Test bootstrap: fake an 8-device CPU mesh before jax initializes.

This is the TPU translation of the reference's "mock the process boundary"
test strategy (SURVEY.md section 4): multi-chip sharding logic runs in one
process against 8 virtual CPU devices.
"""

import os

# The session may carry an axon TPU tunnel via JAX_PLATFORMS; drop it and pin
# CPU through jax.config (the env var alone does not displace the plugin).
os.environ.pop("JAX_PLATFORMS", None)
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture()
def rng():
    return np.random.default_rng(0)


@pytest.fixture()
def mesh8():
    from rag_inference_pipeline_tpu.core import make_mesh

    return make_mesh(dp=4, tp=2)


@pytest.fixture()
def mesh_dp8():
    from rag_inference_pipeline_tpu.core import make_mesh

    return make_mesh(dp=8, tp=1)


@pytest.fixture(autouse=True)
def _reset_settings_cache():
    from rag_inference_pipeline_tpu.core import reset_settings

    reset_settings()
    yield
    reset_settings()
