"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip logic (pjit shardings, collective insertion) is validated without
TPU hardware by forcing the host platform to expose 8 devices — the TPU answer
to "test multi-node without a cluster" (SURVEY.md §4).

This machine's sitecustomize imports jax with the TPU backend at interpreter
startup, so ``JAX_PLATFORMS=cpu`` set here would be too late.  Instead the
(lazily created) CPU backend is forced to 8 devices via XLA_FLAGS, made the
default jit target, and ``jax.devices``/``jax.local_devices`` are pointed at
it so library defaults (e.g. ``make_mesh``) see the virtual mesh.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

if jax.default_backend() != "cpu":
    jax.config.update("jax_default_device", jax.devices("cpu")[0])

    _orig_devices = jax.devices
    _orig_local = jax.local_devices

    def _cpu_devices(backend=None):
        return _orig_devices(backend or "cpu")

    def _cpu_local_devices(process_index=None, backend=None, host_id=None):
        return _orig_local(process_index, backend or "cpu")

    def _cpu_device_count(backend=None):
        return len(_orig_devices(backend or "cpu"))

    def _cpu_local_device_count(backend=None):
        return len(_orig_local(backend=backend or "cpu"))

    jax.devices = _cpu_devices
    jax.local_devices = _cpu_local_devices
    jax.device_count = _cpu_device_count
    jax.local_device_count = _cpu_local_device_count

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(0)
