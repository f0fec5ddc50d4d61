"""Test env: force CPU with 8 virtual devices so sharding tests run anywhere.

The environment's sitecustomize registers a remote-TPU PJRT plugin and forces
jax_platforms to it; tests must run on local CPU, so we override the config
*after* that registration (env vars alone are ignored once register() ran).
"""
import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
