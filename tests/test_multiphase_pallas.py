"""Multiphase fused-sweep fast path (fused_sweep with precomputed f)."""

import jax.numpy as jnp
import numpy as np
import pytest

from chan_vese_tpu.models import multiphase as mp
from chan_vese_tpu.ops import pallas_sweep, sweep
from chan_vese_tpu.params import CVParams
from fixtures import four_regions

F32 = jnp.float32


def test_fused_sweep_matches_jnp():
    rng = np.random.default_rng(0)
    phi = jnp.asarray(rng.standard_normal((64, 128)) * 10, F32)
    f = jnp.asarray(rng.standard_normal((64, 128)) * 1e3, F32)
    p = CVParams()
    got, parts = pallas_sweep.fused_sweep(phi, f, p, interpret=True)
    want = sweep.redblack_step(phi, f, p)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-3)
    # flip partial is exact
    flips = float(jnp.sum((want >= 0) != (phi >= 0)))
    assert float(parts[3]) == pytest.approx(flips)


def test_multiphase_pallas_matches_jnp():
    img, gt = four_regions(64, 128, noise=4.0)
    u = jnp.asarray(img, F32)
    p = CVParams(mu=0.003 * 255 ** 2)
    tr_a = mp.segment_multiphase_fixed(u, p, iters=25, m_sets=2,
                                       use_pallas=True, interpret=True)
    tr_b = mp.segment_multiphase_fixed(u, p, iters=25, m_sets=2,
                                       use_pallas=False)
    lab_diff = (np.asarray(tr_a.labels) != np.asarray(tr_b.labels)).sum()
    assert lab_diff <= 5, lab_diff
    np.testing.assert_allclose(np.asarray(tr_a.energy),
                               np.asarray(tr_b.energy), rtol=1e-3)


def test_multiphase_pallas_unsupported_raises():
    u = jnp.zeros((64, 100), F32)  # W not lane-aligned
    with pytest.raises(ValueError):
        mp.segment_multiphase(u, CVParams(), m_sets=2, use_pallas=True)


@pytest.mark.tpu
def test_multiphase_pallas_compiled_tpu():
    import itertools

    img, gt = four_regions(512, 512, noise=4.0)
    u = jnp.asarray(img, F32)
    p = CVParams(mu=0.003 * 255 ** 2, max_iter=100)
    res = mp.segment_multiphase(u, p, m_sets=2, use_pallas=True)
    pred = np.asarray(res.labels)
    best = max(float((np.asarray(perm)[pred] == gt).mean())
               for perm in itertools.permutations(range(4)))
    assert best >= 0.99, best
