"""Test configuration (SURVEY.md §4).

Unit tests run on CPU with 8 virtual XLA devices so multi-device sharding
paths (shard_map / collectives) are exercised without TPU pod hardware, and
with x64 enabled so float64 oracle comparisons are meaningful.

These env vars must be set before jax is imported anywhere in the process —
pytest imports conftest first, so this is the place.
"""

import os

# Force, don't setdefault: the environment pins JAX_PLATFORMS to the TPU
# backend globally (and the platform plugin overrides the env var), so the
# config update below is what actually pins unit tests to the CPU mesh.
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

# CI NaN mode (SURVEY.md §5 'race detection / sanitizers' row: JAX purity
# makes data races structurally absent; numeric sanitation = NaN trapping).
# Enable with BIDL_DEBUG_NANS=1 — every op that produces a NaN raises at its
# source instead of propagating.
if os.environ.get("BIDL_DEBUG_NANS"):
    jax.config.update("jax_debug_nans", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402

from bayesianinferencedl_tpu.geometry import build_fin_mesh  # noqa: E402
from bayesianinferencedl_tpu.fem import assemble_fin, FinOperator  # noqa: E402


@pytest.fixture(scope="session")
def mesh_r1():
    return build_fin_mesh(1)


@pytest.fixture(scope="session")
def mesh_r2():
    return build_fin_mesh(2)


@pytest.fixture(scope="session")
def host_r1(mesh_r1):
    return assemble_fin(mesh_r1, pad_to=8)


@pytest.fixture(scope="session")
def host_r2(mesh_r2):
    return assemble_fin(mesh_r2, pad_to=8)


@pytest.fixture(scope="session")
def op_r1_f64(host_r1):
    import jax.numpy as jnp

    return FinOperator.from_host(host_r1, biot=0.1, dtype=jnp.float64)


@pytest.fixture(scope="session")
def op_r2_f64(host_r2):
    import jax.numpy as jnp

    return FinOperator.from_host(host_r2, biot=0.1, dtype=jnp.float64)


@pytest.fixture()
def rng():
    return np.random.default_rng(0)
