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
    """XLA:CPU segfaults (jax compiler backend_compile_and_load) on LARGE
    compiles deep into the suite — observed twice at different sites
    (sharded-training step, FullInertialBA) always after 60+ test files'
    executables accumulated. Dropping compiled-program caches per module
    keeps each module's compile workload bounded; the recompiles cost a few
    extra minutes over the whole suite."""
    jax.clear_caches()
    yield
