"""Test configuration.

Unit tests run on CPU with 8 virtual devices so multi-chip sharding tests run
without TPU hardware (the driver separately dry-runs the multi-chip path;
bench.py runs on the real chip).

Note: the driver environment routes JAX through the axon TPU tunnel — a
sitecustomize.py on PYTHONPATH imports jax and registers the axon PJRT plugin
(with remote compile, ~30 s/jit round-trips) at interpreter startup, before
pytest loads this file. Env vars are therefore too late; we use
jax.config.update, which takes effect as long as no backend has been
initialized yet.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"          # for any late readers
import jax  # noqa: E402  (already imported by sitecustomize anyway)

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_enable_x64", False)

assert jax.default_backend() == "cpu", (
    "tests must run on CPU; axon backend leaked through")
assert jax.device_count() == 8


import pytest


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: multi-minute e2e/CLI tests. Fast tier (<9 min, the CI-style "
        "safety net): pytest tests/ -m 'not slow'; full suite: pytest "
        "tests/ (split into 2-3 batches to stay under tight wall-clocks)")


@pytest.fixture(scope="module", autouse=True)
def _bounded_compile_cache():
    """Bound the live-executable count: every compiled XLA:CPU executable
    holds ~3 anonymous mmap regions for its LLVM-JIT code/data sections,
    and a process may hold at most vm.max_map_count (65530) regions. Deep
    into the suite (60+ files x 8 virtual devices) the accumulated live
    executables exhaust the map table and the NEXT compile dies inside
    backend_compile_and_load ("LLVM ERROR: Unable to allocate section
    memory!" from contiguous_section_memory_manager.cc — SIGABRT, or
    SIGSEGV depending on the failing allocation site). Root-caused and
    reproduced deterministically in tools/xla_cpu_mapcount_repro.py
    (--crash fills the map table and triggers the fatal compile).
    clear_caches() releases the executables AND their maps (verified
    there), so dropping caches per module keeps the count bounded; the
    recompiles cost a few extra minutes over the whole suite.
    tools/run_full_suite.sh additionally splits the slow tier across
    processes."""
    jax.clear_caches()
    yield
