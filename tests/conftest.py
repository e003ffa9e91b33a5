"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip TPU hardware is not available in CI; sharding correctness is
validated on XLA's host platform with 8 virtual devices (the analog of the
reference's REMOVE_LP1_LPN_DIFF single-vs-multi-thread determinism check,
ref: Source/API/EbDebugMacros.h).

NOTE: this jax build ships a platform plugin that ignores the JAX_PLATFORMS
environment variable, so the platform is forced via jax.config before any
backend initialization.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
