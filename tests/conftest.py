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
