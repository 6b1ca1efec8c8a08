"""Test configuration: force CPU with 8 virtual devices.

Multi-device logic is exercised on a virtual CPU mesh
(``--xla_force_host_platform_device_count=8``) — the TPU-world analog of
the reference's mocked DistributedContext tests (SURVEY.md §4), but with
real XLA collectives executing.
"""

import os

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import jax  # noqa: E402

# The environment pins JAX_PLATFORMS=axon via sitecustomize; override
# in-process so tests always run on host CPU.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def toy_moons():
    """Two-moons dataset (n=100), the reference's quality-gate fixture
    (reference: torchdr/tests/utils.py:5-15)."""
    from sklearn.datasets import make_moons

    X, y = make_moons(n_samples=100, noise=0.05, random_state=0)
    return X.astype(np.float32), y


@pytest.fixture(scope="session")
def toy_blobs():
    rng = np.random.default_rng(0)
    centers = rng.normal(scale=8.0, size=(4, 10))
    X = np.concatenate(
        [c + rng.normal(size=(50, 10)) for c in centers], axis=0
    ).astype(np.float32)
    y = np.repeat(np.arange(4), 50)
    return X, y
