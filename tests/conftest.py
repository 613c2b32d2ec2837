"""Test configuration: run everything on a virtual 8-device CPU platform so
sharding/collective behaviour is exercised deterministically without TPU
hardware (SURVEY.md §4 "distributed tests without a cluster").

The ambient environment may pre-register a TPU backend via sitecustomize and
pin ``jax_platforms`` to it; tests must not depend on (or be slowed down by)
remote hardware, so we force the selection back to CPU *after* jax import and
request 8 virtual host devices before any backend is initialized.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# Pallas kernels run in interpreter mode on the CPU test platform
os.environ.setdefault("PGGAN_PALLAS_INTERPRET", "1")

import jax  # noqa: E402  (import after env setup)

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_threefry_partitionable", True)

# Persistent XLA compile cache: the interpret-mode Pallas tests trace large
# unrolled graphs whose CPU compiles dominate the suite runtime; caching them
# makes repeat runs fast. Safe to delete at any time.
_cache_dir = os.path.join(os.path.dirname(__file__), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

assert jax.default_backend() == "cpu", (
    "tests must run on CPU, got " + jax.default_backend()
)
assert jax.device_count() >= 8, "expected 8 virtual CPU devices for sharding tests"
