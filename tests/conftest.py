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


# ---- slow-test gating: `pytest tests/` stays a fast commit gate (<8 min);
# `pytest tests/ --runslow` (or RUNSLOW=1, used by CI) runs everything.

import pytest  # noqa: E402


def pytest_addoption(parser):
    parser.addoption("--runslow", action="store_true", default=False,
                     help="also run tests marked slow")


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: long-running e2e test (CI / --runslow only)")


def pytest_collection_modifyitems(config, items):
    if config.getoption("--runslow") or os.environ.get("RUNSLOW"):
        return
    skip = pytest.mark.skip(reason="slow: run with --runslow / RUNSLOW=1")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)
