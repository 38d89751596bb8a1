"""Test configuration: force an 8-device virtual CPU backend so multi-chip
sharding paths run without TPU hardware (SURVEY.md §4 implication;
analogous to the driver's dryrun_multichip check).

NB: this environment pre-sets JAX_PLATFORMS=axon (the remote-TPU tunnel)
and something downstream re-applies it, so overriding the env var alone
is NOT enough — jax.config.update after import is what sticks.
"""

import os

# TPU_KNN_TEST_TPU=1 runs the suite against the real chip instead (the
# on-chip oracle sweep, scripts/r5_spaces.py — multi-device tests then
# skip themselves on the 1-device backend).
_TPU = os.environ.get("TPU_KNN_TEST_TPU", "") not in ("", "0")

if not _TPU:
    # Must be set before jax import.
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

if not _TPU:
    jax.config.update("jax_platforms", "cpu")
    assert jax.devices()[0].platform == "cpu" and len(jax.devices()) == 8, (
        "tests require the 8-device virtual CPU backend; got "
        f"{jax.devices()}"
    )

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(42)
