"""Test harness configuration.

Tests run on a virtual 8-device CPU mesh so multi-chip sharding paths are
exercised without TPU hardware (mirrors the reference's multi-process-on-one-
host test story, SURVEY.md §4.8).

Note: this image ships an `axon` sitecustomize that registers a TPU backend
and forces jax_platforms="axon,cpu" at interpreter start, so env vars alone
don't select CPU — we override the config after import (the CPU client is
created lazily, so XLA_FLAGS set here still applies).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_threefry_partitionable", True)
