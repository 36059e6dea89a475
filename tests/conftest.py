"""Test env: force CPU with 8 virtual devices so sharding tests run
anywhere (the idiomatic JAX way to test multi-chip layouts without a TPU
slice). Must run before jax is imported anywhere."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

# The axon TPU plugin overrides JAX_PLATFORMS; force CPU explicitly so
# tests never ride the TPU tunnel and the 8 fake devices materialize.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
# persistent compile cache shared across xdist workers AND runs: several
# test files jit the same tiny-step structures (runtime/trainer/parallel);
# the second compile of any of them becomes a disk hit. Safe to delete.
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), "..",
                               ".pytest_jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
assert jax.devices()[0].platform == "cpu"
assert len(jax.devices()) == 8, "need 8 virtual CPU devices for sharding tests"

import pytest  # noqa: E402


@pytest.fixture
def key():
    return jax.random.PRNGKey(0)
