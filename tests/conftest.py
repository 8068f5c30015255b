"""Test harness: run on the CPU backend with 8 virtual devices so the
multi-device sharding path is exercised without TPU hardware (SURVEY.md §4).
Must set env before the first jax import anywhere in the test session.

Set TPUSPH_TEST_TPU=1 to run the suite against the real TPU instead.
"""

import os

if not os.environ.get("TPUSPH_TEST_TPU"):
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()

import jax  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def on_tpu():
    return jax.default_backend() == "tpu"
