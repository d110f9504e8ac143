"""Test harness configuration.

Tests run on CPU with 8 virtual XLA devices so multi-chip sharding code paths
(`shard_map` over a Mesh) are exercised without TPU hardware — the same
mechanism the driver uses for the multichip dry run.

Note: this environment's sitecustomize imports jax and registers the remote
'axon' TPU plugin at interpreter start, so jax is already in sys.modules and
JAX_PLATFORMS is pinned to 'axon'. Overriding via jax.config *before any
backend is initialised* keeps the suite on the fast local CPU backend.
"""

import os
import sys

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(1234)


REFERENCE_DIR = "/root/reference"


def has_reference() -> bool:
    return os.path.isdir(REFERENCE_DIR)


def has_torch() -> bool:
    try:
        import torch  # noqa: F401

        return True
    except Exception:
        return False
