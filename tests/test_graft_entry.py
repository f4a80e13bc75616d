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
