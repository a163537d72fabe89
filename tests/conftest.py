"""Test harness configuration.

Tests run on CPU with 8 virtual devices so sharding/collective paths are
exercised without TPU hardware (the driver separately dry-runs the
multi-chip path; bench.py runs on the real chip).
"""

import os

# PHOVO_TPU_TESTS=1 leaves the ambient platform (the real chip) in place so
# the `-m tpu` on-device kernel suite runs against real Mosaic lowering:
#   PHOVO_TPU_TESTS=1 python -m pytest tests/ -m tpu -q
# Otherwise force CPU regardless of the ambient JAX_PLATFORMS (the driver
# environment pins it to the TPU plugin; tests use the virtual 8-device CPU
# mesh).
TPU_MODE = os.environ.get("PHOVO_TPU_TESTS") == "1"
if not TPU_MODE:
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()

import jax  # noqa: E402
import numpy as np  # noqa: E402
import pytest  # noqa: E402

# A pytest plugin pre-imports jax before this conftest runs, freezing the
# env-var snapshot — the explicit config update still works.
if not TPU_MODE:
    jax.config.update("jax_platforms", "cpu")


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "tpu: on-device kernel regression tests (run with "
        "PHOVO_TPU_TESTS=1 python -m pytest -m tpu)",
    )


def pytest_collection_modifyitems(config, items):
    if not TPU_MODE:
        skip = pytest.mark.skip(
            reason="on-device test: PHOVO_TPU_TESTS=1 python -m pytest -m tpu"
        )
        for item in items:
            if "tpu" in item.keywords:
                item.add_marker(skip)

# Persistent compilation cache: the alignment graphs (multi-level pyramids +
# while_loop solvers) are expensive to compile on the CPU backend; caching
# makes repeated test runs fast.
# Persistent compilation cache: TPU mode only.  On the CPU backend,
# LoadedExecutable.serialize() C-aborts for some executables in this jax
# build (jax/_src/compilation_cache.py put_executable_and_time), and the
# write path only triggers when a compile exceeds the 0.5 s threshold —
# which in a full-suite run it eventually does (the abort reproduced
# deterministically at test_robust's tdist align).  CPU tests gain little
# from the cache; the TPU bench/e2e tools keep it.
if TPU_MODE:
    jax.config.update("jax_compilation_cache_dir", "/tmp/phovo_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from phovo_tpu.ops.camera import Intrinsics  # noqa: E402


@pytest.fixture(scope="module", autouse=True)
def _clear_jax_caches_between_modules():
    """Free compiled executables after each test module.

    This jax build's CPU backend segfaults in backend_compile_and_load
    after a few hundred compiled programs accumulate in one process
    (reproduced deterministically-by-position across full-suite runs at
    HEAD, at different tests depending on compile order; never in
    subsets).  Dropping the jit caches between modules keeps the live
    executable count bounded; the cost is re-compiling the handful of
    cross-module shared programs."""
    yield
    jax.clear_caches()


@pytest.fixture(scope="session")
def intr():
    return Intrinsics(
        np.float32(128.0), np.float32(128.0), np.float32(63.5), np.float32(47.5)
    )


@pytest.fixture(scope="session")
def small_pair(intr):
    """(I0, D0, I1, D1, gt_state) at 96x128 — fast but non-trivial."""
    from phovo_tpu.utils.synthetic import make_pair

    return make_pair(intr, shape=(96, 128))
