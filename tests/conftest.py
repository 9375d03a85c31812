"""Test env: 8 virtual CPU devices so mesh/sharding tests run without TPUs
(SURVEY.md section 4's 'multi-node without a cluster' equivalent)."""

import os

# Must happen before the CPU backend initializes. NOTE: this environment's
# sitecustomize registers a remote-TPU PJRT plugin and forces
# JAX_PLATFORMS=axon at interpreter start, so a plain env-var setdefault is
# not enough — override at the jax.config level too.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest

REFERENCE = "/root/reference"


@pytest.fixture(scope="session")
def reference_available():
    return os.path.isdir(REFERENCE)


@pytest.fixture(scope="session")
def chr21_1mb_matrix():
    from chromosome3d_tpu.io.matrix import load_if_matrix

    path = os.path.join(REFERENCE, "input", "chr21_1mb_matrix.txt")
    if not os.path.exists(path):
        pytest.skip("reference inputs not available")
    return load_if_matrix(path)


@pytest.fixture(scope="session")
def chr22_1mb_matrix():
    from chromosome3d_tpu.io.matrix import load_if_matrix

    path = os.path.join(REFERENCE, "input", "chr22_1mb_matrix.txt")
    if not os.path.exists(path):
        pytest.skip("reference inputs not available")
    return load_if_matrix(path)


@pytest.fixture()
def tiny_matrix():
    """Deterministic small IF matrix with the reference's properties:
    symmetric, large diagonal, a few zeros."""
    rng = np.random.RandomState(7)
    L = 16
    base = rng.gamma(2.0, 50.0, size=(L, L))
    m = (base + base.T) / 2
    np.fill_diagonal(m, 5000.0)
    m[0, 9] = m[9, 0] = 0.0
    m[2, 12] = m[12, 2] = 0.0
    return m
