import os

# Tests always run on the CPU backend with 8 virtual devices so multi-chip
# sharding paths can be exercised without TPU hardware. The sandbox pins
# jax_platforms to the axon TPU plugin programmatically, so setting the env
# var alone is not enough — override the config after import too.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402
import pytest  # noqa: E402

jax.config.update("jax_platforms", "cpu")


# ---------------------------------------------------------------------------
# Test tiers: the default run is the fast unit tier (< 5 min); tests marked
# `slow` (multi-graph compiles, e2e trainer loops, subprocess benches) are
# opt-in via `--slow` or REF_GT_SLOW_TESTS=1. CI runs both tiers.
# ---------------------------------------------------------------------------


def pytest_addoption(parser):
    parser.addoption("--slow", action="store_true", default=False, help="also run the slow e2e tier")


def pytest_configure(config):
    config.addinivalue_line("markers", "slow: multi-graph-compile / e2e tier (opt in with --slow)")


def pytest_collection_modifyitems(config, items):
    if config.getoption("--slow") or os.environ.get("REF_GT_SLOW_TESTS") == "1":
        return
    skip = pytest.mark.skip(reason="slow tier: opt in with --slow or REF_GT_SLOW_TESTS=1")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)
