"""Test configuration: CPU backend with 8 virtual devices and float64.

The 8-device virtual CPU mesh is our analogue of the reference's
``mpirun -np N`` ctest gating (reference test/polydeal/CMakeLists.txt);
float64 is required by the 1e-14 exactness invariants
(reference test/polydeal/exact_solutions.cc:31).
"""

import os

# must be set before jax initializes its backends; the driver environment
# pre-sets JAX_PLATFORMS=axon (the tunneled TPU), so force-override here —
# tests need the deterministic f64 CPU backend.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
# The suite is compile-bound (XLA:CPU LLVM codegen dominates the 45-min
# serial wall time); backend opt level 0 cuts module compiles ~30%
# (measured: test_matfree 98.7s -> 68.5s, identical 207-test results
# incl. the 1e-12/1e-14 exactness invariants — LLVM -O0 does not change
# IEEE semantics, unlike fast-math).  POLYDEAL_XLA_OPT=1 restores the
# default optimization level.
if ("xla_backend_optimization_level" not in flags
        and os.environ.get("POLYDEAL_XLA_OPT", "") != "1"):
    flags = (flags + " --xla_backend_optimization_level=0").strip()
os.environ["XLA_FLAGS"] = flags

import jax

# the axon TPU plugin registers itself regardless of the env var; the
# config knob reliably pins the backend
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

# NOTE: a persistent compilation cache was tried here (round 3) and
# reverted: XLA:CPU's AOT loader intermittently aborts on cache entries
# whose recorded machine features disagree with the running host
# ("+prefer-no-scatter ... could lead to SIGILL", then SIGABRT in
# pjit) — a crashing suite is worse than a slow one.  Opt in manually
# via POLYDEAL_JAX_CACHE if the environment is known-stable.
_cache_dir = os.environ.get("POLYDEAL_JAX_CACHE")
if _cache_dir:
    os.makedirs(_cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", _cache_dir)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


import gc

import pytest


# XLA:CPU's JIT intermittently segfaults in backend_compile_and_load once
# enough compiled executables have accumulated in-process (seen
# deterministically at the 12th test of test_multigrid.py, jax 0.9.0).
# Dropping the tracing/executable caches keeps the compiler state small;
# tests do not share jitted callables, so the only cost is re-compiles.
# Clearing after EVERY test suite-wide roughly doubled the wall time, so
# the per-test clear is scoped to the modules whose tests individually
# accumulate many large MG/shard_map executables (where the crash was
# observed); everywhere else a per-module clear bounds accumulation.
# POLYDEAL_CLEAR_EVERY_TEST=0 disables the per-test clear (library-level
# jitted helpers then stay warm across a module's tests).  RE-TESTED
# round 5 (jax 0.9.0): test_multigrid still ABORTS mid-module without
# the clear — keep the default on.
_CLEAR_EVERY_TEST = (
    set() if os.environ.get("POLYDEAL_CLEAR_EVERY_TEST", "") == "0"
    else {"test_multigrid", "test_sharding"})


@pytest.fixture(autouse=True)
def _clear_jax_caches(request):
    yield
    if request.module.__name__.rpartition(".")[2] in _CLEAR_EVERY_TEST:
        import jax

        jax.clear_caches()
        gc.collect()


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_module():
    yield
    import jax

    jax.clear_caches()
    gc.collect()
