"""Test configuration: run everything on a virtual 8-device CPU mesh.

The driver benches on one real TPU chip; tests exercise the same code paths
(including multi-chip sharding) on CPU via
``--xla_force_host_platform_device_count=8``.

NOTE: in this environment the TPU is attached through a high-latency tunnel
("axon") that ignores the JAX_PLATFORMS env var, so we must force the CPU
platform through ``jax.config`` before any backend is initialized.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

# Persistent compilation cache: the suite is dominated by XLA CPU compiles
# (the f64 production-LM while_loops in test_parallel alone are ~30 min of
# compile on this 1-core box). The cache DOES reload on CPU here — the
# "Target machine feature +prefer-no-scatter ..." error the AOT loader
# logs is non-fatal (those are LLVM tuning pseudo-features, not CPUID
# features; compile and execution happen on the same machine). Measured:
# a 17 s compile reloads in 0.2 s.
_CACHE_DIR = os.environ.get("USLAM_TEST_JAX_CACHE", "/root/.cache/uslam_jax_cache_cpu")
try:
    jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
except Exception:  # pragma: no cover - older jax
    pass

# vm.max_map_count: a full single-process suite accumulates enough live
# XLA:CPU executable mmaps to hit the kernel default ceiling (65530) and
# SEGFAULT inside LLVM around the ~140th test (see the module fixture
# below). The fix is applied per-boot; this box reboots between rounds,
# so re-apply it here (we run as root; harmless no-op when not).
try:
    with open("/proc/sys/vm/max_map_count") as _f:
        if int(_f.read()) < 1048576:
            with open("/proc/sys/vm/max_map_count", "w") as _g:
                _g.write("1048576\n")
except (OSError, PermissionError, ValueError):  # pragma: no cover
    pass

import pytest  # noqa: E402


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: long-running variant (opt in with USLAM_RUN_SLOW=1); a "
        "shorter default variant covers the same assertions every run",
    )


def pytest_collection_modifyitems(config, items):
    if os.environ.get("USLAM_RUN_SLOW"):
        return
    skip = pytest.mark.skip(reason="slow variant; set USLAM_RUN_SLOW=1")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)


@pytest.fixture(autouse=True, scope="module")
def _drop_jax_executables_between_modules():
    """Release compiled-executable memory maps between test modules.

    Every live XLA:CPU executable holds JIT code pages (several mmap
    regions each); a full single-process suite run accumulates enough to
    hit the kernel's vm.max_map_count ceiling (65530 default) around the
    140th test, at which point the next mmap failure inside LLVM is a
    SEGFAULT (measured: workers reach tens of thousands of maps).
    Clearing jax's jit caches per module unmaps dead executables; the
    persistent compile cache makes re-loading cheap."""
    yield
    jax.clear_caches()
