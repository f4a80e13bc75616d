"""Multichannel fused-kernel tests (vector-valued fast path)."""

import jax.numpy as jnp
import numpy as np
import pytest

from chan_vese_tpu.models.fused import segment_fused
from chan_vese_tpu.ops import pallas_sweep_mc
from chan_vese_tpu.ops.numerics import heaviside
from chan_vese_tpu.ops.reductions import data_term, region_means
from chan_vese_tpu.ops.sweep import redblack_step
from chan_vese_tpu.params import CVParams
from fixtures import colored_squares, iou

F32 = jnp.float32


def _ref_iteration(phi, u0_hlc, c1, c2, l1, l2, p):
    f = data_term(u0_hlc, c1, c2, p.nu, jnp.asarray(l1), jnp.asarray(l2))
    phi_new = redblack_step(phi, f, p)
    h = heaviside(phi_new, p.eps)
    s_uh = jnp.sum(u0_hlc * h[..., None], axis=(0, 1))
    return phi_new, s_uh, jnp.sum(h)


@pytest.mark.parametrize("lambdas", [None, ((1.0, 1.5, 0.5), (0.8, 1.0, 1.2))])
def test_mc_iteration_matches_jnp(lambdas):
    rng = np.random.default_rng(0)
    shape = (64, 128, 3)
    u0 = jnp.asarray(rng.uniform(0, 255, shape), F32)
    phi = jnp.asarray(rng.standard_normal(shape[:2]), F32)
    p = CVParams()
    l1, l2 = (lambdas if lambdas else (None, None))
    c1, c2 = region_means(u0, phi, p.eps)
    got_phi, parts = pallas_sweep_mc.fused_iteration_mc(
        phi, jnp.transpose(u0, (2, 0, 1)), c1, c2, p, l1, l2,
        interpret=True)
    l1e, l2e = p.channel_lambdas(3, l1, l2)
    want_phi, want_suh, want_sh = _ref_iteration(phi, u0, c1, c2, l1e, l2e, p)
    np.testing.assert_allclose(np.asarray(got_phi), np.asarray(want_phi),
                               rtol=2e-6, atol=2e-5)
    np.testing.assert_allclose(np.asarray(parts[:3]), np.asarray(want_suh),
                               rtol=2e-5)
    assert float(parts[3]) == pytest.approx(float(want_sh), rel=2e-5)


def test_segment_fused_rgb_full_run():
    img, gt = colored_squares(64, 128, noise=4.0)
    p = CVParams(init="circle")
    res = segment_fused(jnp.asarray(img, F32), p, interpret=True)
    assert res.c1.shape == (3,)
    assert iou(np.asarray(res.mask), gt) >= 0.97
    assert int(res.iters) < p.max_iter


def test_segment_fused_rgb_fallback_unaligned():
    img, gt = colored_squares(64, 100, noise=4.0)  # W not lane-aligned
    p = CVParams(init="circle")
    res = segment_fused(jnp.asarray(img, F32), p, interpret=True)
    assert iou(np.asarray(res.mask), gt) >= 0.97


def test_mc_matches_vector_jnp_trajectory():
    from chan_vese_tpu.models.vector import segment_vector

    img, _ = colored_squares(64, 128, noise=4.0)
    u = jnp.asarray(img, F32)
    p = CVParams(init="circle")
    res_f = segment_fused(u, p, lambda1=(1.0, 1.2, 0.8), interpret=True)
    res_j = segment_vector(u, p, lambda1=(1.0, 1.2, 0.8))
    assert int(res_f.iters) == int(res_j.iters) or \
        abs(int(res_f.iters) - int(res_j.iters)) <= 2
    assert iou(np.asarray(res_f.mask), np.asarray(res_j.mask)) >= 0.995


@pytest.mark.tpu
def test_mc_iteration_compiled_tpu():
    rng = np.random.default_rng(2)
    shape = (128, 256, 3)
    u0 = jnp.asarray(rng.uniform(0, 255, shape), F32)
    phi = jnp.asarray(rng.standard_normal(shape[:2]), F32)
    p = CVParams()
    c1, c2 = region_means(u0, phi, p.eps)
    got_phi, parts = pallas_sweep_mc.fused_iteration_mc(
        phi, jnp.transpose(u0, (2, 0, 1)), c1, c2, p)
    l1e, l2e = p.channel_lambdas(3, None, None)
    want_phi, want_suh, _ = _ref_iteration(phi, u0, c1, c2, l1e, l2e, p)
    np.testing.assert_allclose(np.asarray(got_phi), np.asarray(want_phi),
                               rtol=2e-6, atol=2e-5)
    np.testing.assert_allclose(np.asarray(parts[:3]), np.asarray(want_suh),
                               rtol=1e-4)


def test_mc_multiband_pipeline_equals_single_band():
    """Force >= 3 bands so the double-buffered DMA pipeline (prefetch +
    two-behind store drain) is actually exercised."""
    rng = np.random.default_rng(5)
    shape = (96, 128, 3)
    u0 = jnp.asarray(rng.uniform(0, 255, shape), F32)
    phi = jnp.asarray(rng.standard_normal(shape[:2]) * 10, F32)
    p = CVParams()
    c1, c2 = region_means(u0, phi, p.eps)
    ucf = jnp.transpose(u0, (2, 0, 1))
    pm = pallas_sweep_mc
    got_big, parts_big = pm.fused_iteration_mc(phi, ucf, c1, c2, p,
                                               interpret=True)
    old = pm._VMEM_BUDGET
    try:
        pm._VMEM_BUDGET = 8 * 128 * 4 * (11 + 2 * 3)  # force b = 8
        pm.fused_iteration_mc.clear_cache()
        assert pm.band_rows_mc(96, 128, 3) == 8
        got_small, parts_small = pm.fused_iteration_mc(phi, ucf, c1, c2, p,
                                                       interpret=True)
    finally:
        pm._VMEM_BUDGET = old
        pm.fused_iteration_mc.clear_cache()
    np.testing.assert_allclose(np.asarray(got_big), np.asarray(got_small),
                               rtol=2e-6, atol=2e-5)
    np.testing.assert_allclose(np.asarray(parts_big),
                               np.asarray(parts_small), rtol=2e-5, atol=0.5)
