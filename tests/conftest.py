"""Test harness: run on the CPU backend with 8 virtual devices so the
multi-device sharding path is exercised without TPU hardware (SURVEY.md §4).
Must set env before the first jax import anywhere in the test session.

Set TPUSPH_TEST_TPU=1 to run the suite against the real TPU instead.
"""

import os

if not os.environ.get("TPUSPH_TEST_TPU"):
    # HARD override: the sandbox's sitecustomize registers a remote-TPU
    # ("axon") backend at interpreter startup and sets jax_platforms via
    # jax.config — plain env vars are too late. Overriding the config knob
    # after import is the only reliable way to pin tests to local CPU.
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ.pop("PALLAS_AXON_REMOTE_COMPILE", None)
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()
    import jax
    jax.config.update("jax_platforms", "cpu")

import jax  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def on_tpu():
    return jax.default_backend() == "tpu"
