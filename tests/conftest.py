"""Test configuration: force the CPU backend with 8 virtual devices.

The dev box has one real TPU chip on the experimental 'axon' platform and
exports JAX_PLATFORMS=axon; tests run on CPU (f64 available, 8 fake devices
for the distributed tests - SURVEY.md §2.9 verified recipe). Env vars are
set before jax import AND config is updated in-process, because the profile
export shadows command-line env in some setups.

TPU-only tests (compiled Pallas) are marked ``tpu`` and skipped here; run
them with RUN_TPU_TESTS=1 on the real chip (tests/run_tpu_tests.sh).
"""

import os

_TPU_MODE = bool(os.environ.get("RUN_TPU_TESTS"))

if not _TPU_MODE:
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

if not _TPU_MODE:
    jax.config.update("jax_platforms", "cpu")
    try:
        jax.config.update("jax_num_cpu_devices", 8)
    except Exception:
        pass
    # f64 for parity goldens (CPU only; the axon TPU platform is f32)
    jax.config.update("jax_enable_x64", True)

import pytest  # noqa: E402


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "tpu: needs a real TPU chip (set RUN_TPU_TESTS=1)")


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Release compiled executables at module boundaries.

    The full suite compiles ~350 programs (many large shard_map +
    interpret-mode Pallas graphs on the 8-fake-device CPU client);
    letting them all stay live segfaults jaxlib's CPU compiler near
    test ~300 (reproducible at
    test_sharded_multiphase.py::test_multiphase_commk_pallas_equals_
    unsharded_kernel_chunks when the whole suite runs; any ~half of the
    suite passes — cumulative exhaustion, not a specific test). Clearing
    per module keeps the live-executable count bounded at a small
    recompile cost."""
    yield
    jax.clear_caches()


def pytest_runtest_setup(item):
    if "tpu" in [m.name for m in item.iter_markers()]:
        if not os.environ.get("RUN_TPU_TESTS"):
            pytest.skip("TPU-only test (set RUN_TPU_TESTS=1 on a TPU host)")
