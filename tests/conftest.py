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

# The persistent XLA compile cache is for cross-process reuse (serving
# boots, benches); the suite only needs in-process jit caching. Late in a
# full run, XLA executable (de)serialization for the disk cache has been
# observed to SIGSEGV/SIGABRT (state-dependent — the same tests pass in
# isolation), so tests opt out before jax initializes.
os.environ["JAX_ENABLE_COMPILATION_CACHE"] = "false"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_compilation_cache", False)

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


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_per_module():
    """Bound accumulated in-process compiler state.

    A cold full-suite run compiles ~400 tests' worth of XLA:CPU programs
    in one process and has segfaulted inside backend_compile around the
    ~390th test (same tests pass in isolation; threshold moved with test
    count). Dropping executables/tracing caches at each module boundary
    keeps the live-program population bounded; within-module reuse — the
    part that matters for suite runtime — is preserved.
    """
    import jax

    jax.clear_caches()
    yield
