"""Test config: force a virtual 8-device CPU mesh before JAX initializes.

The reference exercises multi-GPU only by literally running on 2 GPUs
(reference caption_me.py:49-50); here every sharding/mesh test runs on a
fake 8-device CPU platform so the suite needs no TPU hardware.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The container's sitecustomize registers the TPU tunnel platform and
# overwrites jax_platforms post-import; force CPU again here.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture(scope="module", autouse=True)
def _clear_jax_caches_per_module():
    """Bound resident compiled executables across the suite.

    This jaxlib's CPU backend has a latent compile bug: once enough
    executables accumulate in-process, a LATER unrelated pjit
    backend_compile segfaults — reproduced twice at ~test #116 of the
    full suite with DIFFERENT victim tests (test_lm_families_integration
    and test_gptj_parity), i.e. cumulative state, not one poisonous
    module. Clearing the jit caches at every module teardown (the same
    fix that cured the speculative-while_loop variant of this bug, see
    tests/test_speculative.py) keeps the resident set small. Costs only
    intra-module executable reuse; each module recompiles its own
    functions anyway.
    """
    yield
    jax.clear_caches()
