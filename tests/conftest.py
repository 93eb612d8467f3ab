"""Test configuration: run everything on a virtual 8-device CPU mesh.

Must set XLA flags before jax initializes (see SURVEY.md §4: multi-host tests
via CPU device simulation)."""
import os

# The image's sitecustomize imports jax at interpreter startup with
# JAX_PLATFORMS=axon (the real TPU tunnel), so env vars alone are too late —
# override via jax.config before any backend is initialized. Tests run on a
# virtual 8-device CPU mesh.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def tiny_taxonomy():
    from taxoexpan_tpu.data.synthetic import synthetic_taxonomy
    return synthetic_taxonomy(num_nodes=300, dim=16, seed=1)


@pytest.fixture()
def rng():
    return np.random.default_rng(0)
