"""Test configuration: force CPU with 8 virtual devices for multi-chip sharding
tests (SURVEY.md §4: the JAX analog of a fake backend).

The environment's TPU plugin overrides the platform via
``jax.config.update("jax_platforms", ...)`` at interpreter start, which takes
precedence over the JAX_PLATFORMS env var — so we must update the config again
here, before any backend is initialized.
"""
import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
