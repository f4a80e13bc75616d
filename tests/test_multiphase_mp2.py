"""Fully fused 4-phase kernel tests (ops/pallas_multiphase.py).

The mp2 kernels implement EXACTLY multiphase_step's M = 2 schedule
(means of the current state, sequential coupling), so the jnp reference
here is the plain multiphase_step and agreement is elementwise.
"""

import itertools

import jax.numpy as jnp
import numpy as np
import pytest

from chan_vese_tpu.models import multiphase as mp
from chan_vese_tpu.ops import pallas_multiphase as pmp
from chan_vese_tpu.params import CVParams
from fixtures import four_regions

F32 = jnp.float32


def _mk(shape, seed=0):
    rng = np.random.default_rng(seed)
    u0 = jnp.asarray(rng.uniform(0, 255, shape), F32)
    phis = jnp.asarray(rng.standard_normal((2,) + shape) * 5, F32)
    return u0, phis


@pytest.mark.parametrize("shape", [(64, 128), (104, 256)])
def test_mp2_iteration_matches_multiphase_step(shape):
    u0, phis = _mk(shape)
    p = CVParams(mu=0.003 * 255 ** 2)
    cs = jnp.stack(mp.phase_means(u0, phis, p.eps))
    got, parts = pmp.mp2_iteration(phis, u0, cs, p, interpret=True)
    want, want_cs = mp.multiphase_step(phis, u0, p)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-3)
    # partials reproduce the next phase means
    tiny = 1e-30
    got_cs = np.asarray(parts[0:4]) / np.maximum(np.asarray(parts[4:8]),
                                                 tiny)
    ref_cs = np.asarray(jnp.stack(mp.phase_means(u0, want, p.eps)))
    np.testing.assert_allclose(got_cs, ref_cs, rtol=2e-4)
    # label flips are exact
    flips = float(jnp.sum(mp.labels_from_phis(want)
                          != mp.labels_from_phis(phis)))
    assert float(parts[8]) == pytest.approx(flips, abs=2)


def test_mp2_multiband_equals_single_band():
    u0, phis = _mk((96, 128), seed=1)
    p = CVParams(mu=0.003 * 255 ** 2)
    cs = jnp.stack(mp.phase_means(u0, phis, p.eps))
    got_big, parts_big = pmp.mp2_iteration(phis, u0, cs, p, interpret=True)
    old = pmp._VMEM_BUDGET
    try:
        pmp._VMEM_BUDGET = 8 * 128 * 4 * pmp._TILES  # force b = 8
        pmp.mp2_iteration.clear_cache()
        assert pmp.band_rows_mp2(96, 128) == 8
        got_small, parts_small = pmp.mp2_iteration(phis, u0, cs, p,
                                                   interpret=True)
    finally:
        pmp._VMEM_BUDGET = old
        pmp.mp2_iteration.clear_cache()
    np.testing.assert_allclose(np.asarray(got_big), np.asarray(got_small),
                               rtol=2e-5, atol=2e-3)
    np.testing.assert_allclose(np.asarray(parts_big),
                               np.asarray(parts_small), rtol=2e-4, atol=1.0)


def test_mp2_resident_first_iteration_elementwise():
    """One resident step == multiphase_step elementwise (f32 noise).

    Multi-iteration elementwise comparison is NOT meaningful for
    multiphase on unstructured inits: the coupling term scales
    heaviside-level ulp noise by (u0 - c)^2 ~ 6.5e4, an ~100x/iteration
    amplification near phi = 0 until kernel and jnp trajectories
    decorrelate (both still settle on the same labels - next test)."""
    u0, phis = _mk((64, 128), seed=2)
    p = CVParams(mu=0.003 * 255 ** 2)
    got, parts = pmp.mp2_resident_iterations(phis, u0, p, 1,
                                             interpret=True)
    want, _ = mp.multiphase_step(phis, u0, p)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=3e-4, atol=2e-3)
    assert parts.shape == (1, 8)
    assert bool(jnp.all(jnp.isfinite(parts)))


def test_mp2_resident_long_run_labels_match_jnp():
    img, _ = four_regions(64, 128, noise=4.0)
    u = jnp.asarray(img, F32)
    p = CVParams(mu=0.003 * 255 ** 2)
    phis0 = mp.init_multiphase((64, 128), 2, dtype=F32)
    got, parts = pmp.mp2_resident_iterations(phis0, u, p, 25,
                                             interpret=True)
    want = phis0
    for _ in range(25):
        want, _ = mp.multiphase_step(want, u, p)
    lab_diff = (np.asarray(mp.labels_from_phis(got))
                != np.asarray(mp.labels_from_phis(want))).sum()
    assert lab_diff <= 5, lab_diff
    assert bool(jnp.all(jnp.isfinite(parts)))


def test_segment_multiphase_kernel_routes_match_jnp_labels():
    img, gt = four_regions(64, 128, noise=4.0)
    u = jnp.asarray(img, F32)
    p = CVParams(mu=0.003 * 255 ** 2, max_iter=40)
    res_jnp = mp.segment_multiphase(u, p, m_sets=2, use_pallas=False)
    # explicit True routes to the resident kernel at this size
    assert mp._mp2_route(u, p, 2, True) == "resident"
    res_res = mp.segment_multiphase(u, p, m_sets=2, use_pallas=True,
                                    interpret=True)
    lab_diff = (np.asarray(res_res.labels) != np.asarray(res_jnp.labels))
    assert lab_diff.mean() < 0.01, lab_diff.sum()
    # banded route (resident disallowed via reinit-free big-image check):
    phis0 = mp.init_multiphase((64, 128), 2, dtype=F32)
    phis_b, it_b, _ = mp._mp2_banded_loop(u, p, phis0, True, False,
                                          p.max_iter)
    lab_b = mp.labels_from_phis(phis_b)
    assert (np.asarray(lab_b) != np.asarray(res_jnp.labels)).mean() < 0.01


def test_segment_multiphase_fixed_kernel_trace_matches_jnp():
    img, _ = four_regions(64, 128, noise=4.0)
    u = jnp.asarray(img, F32)
    p = CVParams(mu=0.003 * 255 ** 2)
    tr_jnp = mp.segment_multiphase_fixed(u, p, iters=20, m_sets=2,
                                         use_pallas=False)
    assert mp._mp2_route(u, p, 2, True, allow_resident=False) == "banded"
    tr_k = mp.segment_multiphase_fixed(u, p, iters=20, m_sets=2,
                                       use_pallas=True, interpret=True)
    np.testing.assert_allclose(np.asarray(tr_k.energy),
                               np.asarray(tr_jnp.energy), rtol=1e-3)
    lab_diff = (np.asarray(tr_k.labels) != np.asarray(tr_jnp.labels)).sum()
    assert lab_diff <= 5, lab_diff


def test_segment_multiphase_fixed_mode_exact_iters():
    img, _ = four_regions(64, 128, noise=4.0)
    u = jnp.asarray(img, F32)
    p = CVParams(mu=0.003 * 255 ** 2)
    res = mp.segment_multiphase(u, p, m_sets=2, use_pallas=True,
                                interpret=True, fixed=True, max_iter=17)
    assert int(res.iters) == 17
    # jnp fixed mode too
    res2 = mp.segment_multiphase(u, p, m_sets=2, use_pallas=False,
                                 fixed=True, max_iter=9)
    assert int(res2.iters) == 9


def test_mp2_quality_four_regions():
    img, gt = four_regions(128, 128, noise=4.0)
    u = jnp.asarray(img, F32)
    p = CVParams(mu=0.003 * 255 ** 2, max_iter=120)
    res = mp.segment_multiphase(u, p, m_sets=2, use_pallas=True,
                                interpret=True)
    pred = np.asarray(res.labels)
    best = max(float((np.asarray(perm)[pred] == gt).mean())
               for perm in itertools.permutations(range(4)))
    assert best >= 0.98, best


def test_mp2_divergence_aborts():
    u0, phis = _mk((64, 128), seed=3)
    p = CVParams(mu=1e30, dt=1e30, tol=1e-12, max_iter=300, min_iter=0)
    res = mp.segment_multiphase(u0, p, m_sets=2, phis0=phis,
                                use_pallas=True, interpret=True)
    assert int(res.iters) < 300


def test_mp2_route_policy():
    p = CVParams()
    u_small = jnp.zeros((64, 128), F32)
    u_big = jnp.zeros((2048, 3840), F32)
    u_odd = jnp.zeros((64, 100), F32)
    u_rgb = jnp.zeros((64, 128, 3), F32)
    # explicit True: resident when it fits, banded when huge
    assert mp._mp2_route(u_small, p, 2, True) == "resident"
    assert mp._mp2_route(u_big, p, 2, True) == "banded"
    # M != 2 or vector: per-sweep kernels
    assert mp._mp2_route(u_small, p, 3, True) == "sweeps"
    assert mp._mp2_route(u_rgb, p, 2, True) == "sweeps"
    # unsupported + explicit True raises
    with pytest.raises(ValueError):
        mp._mp2_route(u_odd, p, 2, True)
    # False / None-off-TPU -> jnp
    assert mp._mp2_route(u_small, p, 2, False) is None
    assert mp._mp2_route(u_small, p, 2, None) is None  # CPU backend here
    # reinit cadence excludes the resident route
    p_r = CVParams(reinit_every=10)
    assert mp._mp2_route(u_small, p_r, 2, True) == "banded"


@pytest.mark.tpu
def test_mp2_kernels_compiled_tpu():
    """Compiled-on-chip 4-phase kernels (run with RUN_TPU_TESTS=1)."""
    u0, phis = _mk((256, 256), seed=11)
    p = CVParams(mu=0.003 * 255 ** 2)
    cs = jnp.stack(mp.phase_means(u0, phis, p.eps))
    got, parts = pmp.mp2_iteration(phis, u0, cs, p)
    want, _ = mp.multiphase_step(phis, u0, p)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-2)
    got_r, parts_r = pmp.mp2_resident_iterations(phis, u0, p, 1)
    np.testing.assert_allclose(np.asarray(got_r), np.asarray(want),
                               rtol=2e-4, atol=2e-2)
