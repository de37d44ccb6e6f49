"""Test configuration: run everything on a virtual 8-device CPU mesh.

Real-TPU behavior is validated separately by bench.py / __graft_entry__.py;
unit tests must be hermetic and exercise the multi-chip sharding path via
XLA's host-platform device partitioning.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

# The container's sitecustomize force-registers the axon TPU backend and
# overrides JAX_PLATFORMS from the environment; the config knob still wins.
jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    import numpy as np

    return np.random.default_rng(42)
