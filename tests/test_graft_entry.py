"""The driver contract (__graft_entry__.py) must keep working: entry()
jits, dryrun_multichip runs the DP+SP sharded step. Caught by a real
regression (a _sharded_iteration signature change broke the dry run)."""

import sys
from pathlib import Path

import jax
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def test_entry_jits():
    from __graft_entry__ import entry

    fn, args = entry()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)


@pytest.mark.parametrize("n", [1, 2, 8])
def test_dryrun_multichip(n):
    if jax.device_count() < n:
        pytest.skip(f"needs {n} devices")
    from __graft_entry__ import dryrun_multichip

    dryrun_multichip(n)


def test_dryrun_never_touches_ambient_backend_when_not_cpu():
    """Round-3 driver regression (MULTICHIP_r03 rc=124): with the axon
    relay dead, jax.devices() under the ambient platform HANGS instead of
    raising, so dryrun_multichip must never touch the ambient backend
    when JAX_PLATFORMS isn't already cpu - it must go straight to the
    clean CPU child. Simulated by poisoning every device-enumeration
    entry point in the calling process: any touch exits 41."""
    import os
    import subprocess
    import sys

    repo = Path(__file__).resolve().parents[1]
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)  # ambient = not-cpu, like the driver
    env.pop("_GRAFT_DRYRUN_CHILD", None)
    env["PYTHONPATH"] = str(repo) + os.pathsep + env.get("PYTHONPATH", "")
    code = (
        "import os, sys\n"
        "import jax\n"
        "def _poison(*a, **k):\n"
        "    sys.stderr.write('ambient backend touched\\n')\n"
        "    os._exit(41)\n"
        "jax.devices = _poison\n"
        "jax.device_count = _poison\n"
        "jax.local_devices = _poison\n"
        "jax.default_backend = _poison\n"
        "import __graft_entry__\n"
        "__graft_entry__.dryrun_multichip(8)\n"
    )
    proc = subprocess.run([sys.executable, "-c", code], env=env,
                          cwd=str(repo), capture_output=True, text=True,
                          timeout=1800)
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "ambient backend touched" not in proc.stderr
    assert "dryrun_multichip OK" in proc.stdout


def test_dryrun_self_provisions_from_small_ambient_backend():
    """Simulate the driver: a process whose backend is ALREADY initialized
    with 1 device calls dryrun_multichip(8). The function must provision
    the fake 8-device CPU mesh itself (in-process or via a clean
    subprocess) instead of asserting on the ambient device count
    (VERDICT.md round-1 missing item #1)."""
    import os
    import subprocess
    import sys

    repo = Path(__file__).resolve().parents[1]
    env = dict(os.environ)
    # strip the conftest 8-device provisioning so the child really has 1
    env["XLA_FLAGS"] = " ".join(
        f for f in env.get("XLA_FLAGS", "").split()
        if "host_platform_device_count" not in f)
    env.pop("JAX_PLATFORMS", None)
    env["PYTHONPATH"] = str(repo) + os.pathsep + env.get("PYTHONPATH", "")
    code = (
        "import jax\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        "jax.config.update('jax_num_cpu_devices', 1)\n"
        "assert len(jax.devices()) == 1\n"
        "import __graft_entry__\n"
        "__graft_entry__.dryrun_multichip(8)\n"
    )
    proc = subprocess.run([sys.executable, "-c", code], env=env,
                          cwd=str(repo), capture_output=True, text=True,
                          timeout=1800)
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "dryrun_multichip OK" in proc.stdout
