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


@pytest.fixture(scope="module", autouse=True)
def _fresh_config():
    """Reset the global config at every module boundary.

    Several test files mutate the process-global `config` (GRU_TYPE,
    DF_OUTPUT_LAYER, loss factors, ...) and `init_df()` without a model
    dir deliberately inherits the live config. Without this reset, a
    module's *module-scoped* fixtures (e.g. test_demo_client's server)
    build models from whatever the previous file left behind — which
    once produced a server whose batcher thread died on a polluted
    config, deadlocking the whole suite. Autouse fixtures instantiate
    before same-scope non-autouse ones, so this runs ahead of every
    module fixture.
    """
    from deepfilternet_tpu.config import config

    config.reset()
    yield
