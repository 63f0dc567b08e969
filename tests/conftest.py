"""Test configuration: run on CPU with 8 virtual devices.

Mirrors the reference's test strategy (SURVEY.md §4): the same code paths
are exercised serially and distributed — here via a virtual 8-device CPU
mesh (the stand-in for `mpirun -np 2`) — asserting identical convergence
behavior, plus per-kernel unit tests the reference lacks.
"""

import os

# --xla_disable_hlo_passes=fusion: the XLA CPU fusion pass duplicates
# subexpressions with inconsistent FMA contraction between the copies,
# which breaks the double-double error-free transforms (see
# lis_tpu/core/ddreal.py).  CPU tests run without fusion so quad paths
# keep their full 2^-106 accuracy.
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8"
                           + " --xla_disable_hlo_passes=fusion")

import jax

# LIS_TEST_TPU=1 leaves the real backend in place for the on-chip tier
# (`LIS_TEST_TPU=1 pytest -m tpu`); everything else runs on the virtual
# 8-device CPU mesh.  x64 stays off on chip (TPUs have no f64 units; the
# package's double paths ride DD limb pairs there).
_TPU_TIER = os.environ.get("LIS_TEST_TPU") == "1"
if not _TPU_TIER:
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

import numpy as np
import pytest


# whole modules whose tests are dominated by 8-device shard_map compiles
# or large problems — the `-m "not slow"` smoke tier skips them (the
# reference's `make check` equivalent; full suite nightly)
_SLOW_MODULES = {"test_dist", "test_quad", "test_all_solvers"}


def pytest_collection_modifyitems(config, items):
    on_tpu = _TPU_TIER and jax.default_backend() not in ("cpu",)
    skip_tpu = pytest.mark.skip(
        reason="tpu tier: needs LIS_TEST_TPU=1 and a TPU backend")
    for item in items:
        if item.module.__name__.rsplit(".", 1)[-1] in _SLOW_MODULES:
            item.add_marker(pytest.mark.slow)
        if "tpu" in item.keywords and not on_tpu:
            item.add_marker(skip_tpu)


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(12345)


@pytest.fixture(scope="module", autouse=True)
def _clear_xla_caches_per_module():
    """Bound in-process XLA/LLVM JIT accumulation: past ~400 compiled
    programs in one process the CPU backend segfaults inside
    backend_compile_and_load (observed deterministically once the suite
    grew past ~300 tests).  Clearing the jit caches at each module
    boundary keeps the live-executable count bounded by the largest
    module; cross-module cache reuse was minimal anyway."""
    yield
    jax.clear_caches()
