"""Test configuration: run on a simulated 8-device CPU mesh.

Multi-chip hardware is not available in CI; distributed tests follow the
strategy of SURVEY.md §4.6 — XLA host-platform device multiplication.
Must run before the first jax import.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# Force CPU even when the session environment points JAX at a TPU platform
# (tests must be runnable anywhere; benchmarks use the real chip). The env
# var alone is not enough when a sitecustomize pre-imports jax, so use the
# config API as well.
if not os.environ.get("SGRACE_TEST_TPU"):
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(12345)


def make_random_graph(rng, n, avg_degree=4, self_loops=True):
    """Random directed graph edge_index [2, E] without duplicate edges."""
    e = n * avg_degree
    rows = rng.integers(0, n, size=e)
    cols = rng.integers(0, n, size=e)
    pairs = np.unique(np.stack([rows, cols]), axis=1)
    return pairs


@pytest.fixture
def random_graph(rng):
    return make_random_graph(rng, 64)
