"""Test harness: force an 8-device virtual CPU mesh (JAX's standard fake-mesh
trick) so multi-device/psum code paths run without TPUs.

Note: the axon TPU plugin in this image overrides the JAX_PLATFORMS env var,
so we also force the platform through jax.config before any backend init.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402

assert jax.default_backend() == "cpu", "tests must run on the virtual CPU mesh"

from omnitokenizer_tpu.utils.jit_cache import enable_persistent_cache  # noqa: E402

enable_persistent_cache()


@pytest.fixture(scope="session")
def devices():
    return jax.devices()


# -- test tiers ---------------------------------------------------------------
# `-m oracle` = the reference-fidelity layer (VERDICT r2 item 9): every
# true-oracle parity module (imports the ACTUAL reference torch code via
# tests/reference_oracle.py) plus the torch-functional oracles.  Kept
# runnable in <10 min on one core from a warm jit cache — see
# scripts/warm_oracle_tier.sh.
_ORACLE_MODULES = {
    "test_parity_torch",       # torch functional oracles (SDPA/LN/rotary)
    "test_inflate",            # inflate tensors vs reference utils.py
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        mod = item.module.__name__.rsplit(".", 1)[-1]
        if mod.startswith("test_reference_parity") or mod in _ORACLE_MODULES:
            item.add_marker(pytest.mark.oracle)
