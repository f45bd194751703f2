"""Test env: force an 8-virtual-device CPU backend.

This lets the same Mesh/pjit code paths that run on a TPU pod slice execute
in CI on one host (SURVEY.md §4): sharded inputs, psum gradients, checkpoint
round-trips — all exercised against a virtual 8-device mesh.

Note: this sandbox's sitecustomize imports jax at interpreter startup and
registers a remote-TPU ("axon") backend, so setting JAX_PLATFORMS via
os.environ here is too late — we must go through jax.config.update instead.
XLA_FLAGS is still read at backend-init time, so setting it here works.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(317)
