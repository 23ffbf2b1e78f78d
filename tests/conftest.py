"""Test env: force CPU with 8 virtual devices so sharding tests run
without TPU hardware (SURVEY.md §4: the repo's answer to 'distributed
testing without a cluster').

Note: the environment may pin JAX_PLATFORMS to a hardware plugin via
sitecustomize; jax.config.update takes precedence, so we use that."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
