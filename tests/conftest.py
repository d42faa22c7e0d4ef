"""Test configuration: run everything on a virtual 8-device CPU mesh.

This is the JAX-idiomatic fake backend for multi-device semantics
(SURVEY.md §4): tests never need real TPU chips; sharding tests use
shard_map over the 8 virtual devices.

Note: this image's sitecustomize registers the axon TPU PJRT plugin in every
interpreter and pins JAX_PLATFORMS=axon, so we must override both the XLA
host-device-count flag (before jax backend init) and the platform via
jax.config (which wins over the env var).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
