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
#
# MACHINE GUARD: XLA:CPU cache entries are AOT-compiled for the machine
# that wrote them; loading them on a host with different CPU features can
# SIGSEGV/SIGILL outright (observed: a round-4 full-suite segfault inside
# compilation_cache.get_executable_and_time reading an entry written by a
# previous round's different machine). The cache dir carries a CPU-feature
# fingerprint and is WIPED when it does not match this host — the same
# hazard __graft_entry__._host_cache_dir avoids by boot-id keying.


def _machine_fingerprint() -> str:
    import hashlib
    import platform
    try:
        with open("/proc/cpuinfo") as f:
            flags = next(ln for ln in f if ln.startswith("flags"))
    except Exception:
        flags = platform.processor() or platform.machine()
    return hashlib.sha256(flags.encode()).hexdigest()[:16]


_cache_dir = os.path.expanduser("~/.jax_cache_tests")
_fp_path = os.path.join(_cache_dir, "MACHINE_FP")
_fp = _machine_fingerprint()
try:
    with open(_fp_path) as f:
        _stale = f.read().strip() != _fp
except OSError:
    _stale = os.path.isdir(_cache_dir) and bool(os.listdir(_cache_dir))
if _stale:
    import shutil
    shutil.rmtree(_cache_dir, ignore_errors=True)
os.makedirs(_cache_dir, exist_ok=True)
with open(_fp_path, "w") as f:
    f.write(_fp)

jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: long-running end-to-end test (compile-heavy)")


import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Round-4 stability: full-suite runs crashed natively (SIGSEGV/
    SIGABRT inside jax's compilation-cache/zstd layer) at whichever LARGE
    pjit compile came past ~90% of the suite — with a poisoned cache, a
    fresh cache, and the cache disabled, and never in standalone or
    file-level runs. The common factor is a single long-lived process
    accumulating hundreds of live compiled executables. Dropping jax's
    in-memory executable caches at each module boundary bounds that
    accumulation; subsequent modules transparently recompile (served from
    the persistent on-disk cache when warm)."""
    yield
    jax.clear_caches()
