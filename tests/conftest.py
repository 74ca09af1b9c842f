"""Test configuration: force an 8-device virtual CPU platform.

Multi-chip sharding tests run on a virtual mesh (the TPU-native equivalent of
"test multi-node without a cluster" — SURVEY.md §4).

NOTE: this image ships an `axon` PJRT plugin whose sitecustomize pins
JAX_PLATFORMS=axon (one tunneled TPU chip); plain env overrides are ignored,
so we must ALSO set jax.config after import.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

assert jax.device_count() >= 8, (
    f"expected 8 virtual CPU devices, got {jax.device_count()} on "
    f"{jax.devices()[0].platform}"
)

if os.environ.get("GVF_FULLSIZE") == "1":
    # the reference-config goldens compile 24x1024 flow transformers on one
    # CPU core — many minutes each; persist the XLA programs so interrupted
    # or repeated runs resume instead of recompiling
    _cache = os.path.join(os.path.dirname(os.path.dirname(__file__)),
                          ".jax_cache")
    os.makedirs(_cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", _cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


# ---------------------------------------------------------------------------
# Test tiers. `fullsize` tests run the reference-configuration composed
# goldens (12x512 DiT, 24x1024 TRELLIS flows, 64^3 grids) against torch on
# CPU — many minutes each on one core — so the default loop skips them.
# Run with GVF_FULLSIZE=1 python -m pytest tests/ -m fullsize.
# ---------------------------------------------------------------------------
import pytest  # noqa: E402


def pytest_collection_modifyitems(config, items):
    if os.environ.get("GVF_FULLSIZE") == "1":
        return
    skip = pytest.mark.skip(
        reason="full-size golden; set GVF_FULLSIZE=1 to run")
    for item in items:
        if "fullsize" in item.keywords:
            item.add_marker(skip)
