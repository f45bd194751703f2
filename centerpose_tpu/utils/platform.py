"""Platform selection helper.

This sandbox's sitecustomize registers a remote TPU backend at interpreter
startup and ignores the JAX_PLATFORMS environment variable, so CLI tools call
``apply_platform_env()`` right after importing jax: set
``CENTERPOSE_PLATFORM=cpu`` (optionally with
``XLA_FLAGS=--xla_force_host_platform_device_count=N``) to run any tool on
host CPU — e.g. CI smoke runs of tools/train.py against the virtual 8-device
mesh.
"""

from __future__ import annotations

import os


def apply_platform_env() -> None:
    platform = os.environ.get("CENTERPOSE_PLATFORM", "")
    if platform:
        import jax

        jax.config.update("jax_platforms", platform)
