"""Test configuration: CPU backend with 8 virtual devices.

Mirrors SURVEY.md §4's plan: everything runs on the CPU backend so tests are
hermetic, and mesh/sharding logic is exercised on a virtual 8-device mesh via
--xla_force_host_platform_device_count. HF offline flags prevent any network
access attempts (zero-egress environment).
"""
import os

# Hard override: the ambient env pins JAX_PLATFORMS=axon (the TPU tunnel)
# and the axon sitecustomize re-forces it at interpreter start, so the env
# var alone is not enough — update jax.config before any backend init.
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("HF_HUB_OFFLINE", "1")
os.environ.setdefault("TRANSFORMERS_OFFLINE", "1")
_flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.devices()[0].platform == "cpu", jax.devices()

# Persistent XLA compile cache: the suite's cost is dominated by CPU-backend
# jit compiles (the heaviest single grad compile is ~34 s cold, ~6 s warm).
# Safe here because tests never touch the TPU remote-compile tunnel (where
# the cache hangs — see .claude/skills/verify). Keyed by jax version +
# computation fingerprint, so stale entries miss instead of corrupting.
_cache_dir = os.environ.get(
    "EEG_TEST_COMPILE_CACHE",
    os.path.join(os.path.dirname(__file__), os.pardir, ".cache", "jax"),
)
if _cache_dir != "off":
    jax.config.update("jax_compilation_cache_dir", os.path.abspath(_cache_dir))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
