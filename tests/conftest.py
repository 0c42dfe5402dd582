import os

# 8 virtual CPU devices for sharding tests; force CPU so tests never touch the
# real TPU chip (mirrors the multi-device CPU testing strategy in SURVEY.md §4).
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
# golden-parity tests compare against torch at 1e-5..1e-4 tolerances; XLA
# CPU's fast-math default perturbs matmuls well above that
if "xla_cpu_enable_fast_math" not in flags:
    flags = (flags + " --xla_cpu_enable_fast_math=false").strip()
os.environ["XLA_FLAGS"] = flags

import jax  # noqa: E402

# The environment's axon plugin overrides JAX_PLATFORMS; force CPU explicitly.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

# Persistent compilation cache: the suite is compile-dominated (tiny shapes,
# many jit specializations); caching executables across runs cuts repeat
# suite time drastically.
jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.jax_cache_tests"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: long-running end-to-end test (compile-heavy)")
