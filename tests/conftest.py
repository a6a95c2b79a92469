"""Test harness: 8 virtual CPU devices (the reference tests the same way —
oversubscribed mpiexec on one machine, SURVEY.md §4)."""

import os

os.environ["XLA_FLAGS"] = os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def mesh8():
    from psac_tpu.parallel.mesh import make_mesh
    return make_mesh(8)


@pytest.fixture(scope="session")
def mesh1():
    from psac_tpu.parallel.mesh import make_mesh
    return make_mesh(1)
