"""Fused Pallas kernel tests (SURVEY.md §4.4).

Interpret mode runs on the CPU backend in CI; the same cases re-run
compiled on the real chip via RUN_TPU_TESTS=1 (tests/run_tpu_tests.sh).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from chan_vese_tpu.models.fused import segment_fused, segment_fused_fixed
from chan_vese_tpu.ops import pallas_sweep
from chan_vese_tpu.ops.reductions import (data_term, delta_norm,
                                          region_means, region_sums)
from chan_vese_tpu.ops.sweep import redblack_step
from chan_vese_tpu.params import CVParams
from fixtures import iou, two_disks

F32 = jnp.float32


def _ref_iteration(phi, u0, c1, c2, p):
    """The jnp red-black iteration the kernel must reproduce."""
    f = data_term(u0, c1, c2, p.nu, p.lambda1, p.lambda2)
    phi_new = redblack_step(phi, f, p)
    from chan_vese_tpu.ops.numerics import heaviside
    h = heaviside(phi_new, p.eps)
    parts = jnp.stack([
        jnp.sum(u0 * h), jnp.sum(h),
        jnp.sum((phi_new - phi) ** 2),
        jnp.sum(((phi_new >= 0) != (phi >= 0)).astype(phi.dtype)),
        jnp.sum(jnp.abs(phi_new - phi)),
    ])
    return phi_new, parts


@pytest.mark.parametrize("shape", [(24, 128), (64, 128), (104, 256),
                                   (256, 384)])
def test_fused_iteration_matches_jnp(shape):
    rng = np.random.default_rng(0)
    u0 = jnp.asarray(rng.uniform(0, 255, shape), F32)
    phi = jnp.asarray(rng.standard_normal(shape), F32)
    p = CVParams()
    c1, c2 = region_means(u0, phi, p.eps)
    got_phi, got_parts = pallas_sweep.fused_iteration(
        phi, u0, c1, c2, p, interpret=True)
    want_phi, want_parts = _ref_iteration(phi, u0, c1, c2, p)
    np.testing.assert_allclose(np.asarray(got_phi), np.asarray(want_phi),
                               rtol=2e-6, atol=2e-5)
    np.testing.assert_allclose(np.asarray(got_parts)[:5],
                               np.asarray(want_parts),
                               rtol=2e-5, atol=0.5)


def test_fused_iteration_banded_equals_whole():
    """Force multiple (ragged, overlapping) bands and compare against a
    single-band run of the same kernel."""
    rng = np.random.default_rng(1)
    shape = (56, 128)
    u0 = jnp.asarray(rng.uniform(0, 255, shape), F32)
    phi = jnp.asarray(rng.standard_normal(shape) * 10, F32)
    p = CVParams()
    c1, c2 = region_means(u0, phi, p.eps)
    import chan_vese_tpu.ops.pallas_sweep as ps
    got_big, parts_big = ps.fused_iteration(phi, u0, c1, c2, p,
                                            interpret=True)
    old_budget = ps._VMEM_BUDGET
    try:
        ps._VMEM_BUDGET = 16 * 128 * 4 * ps._TILES  # force b = 16 -> bands
        ps.fused_iteration.clear_cache()
        assert ps.band_rows(*shape) == 16
        got_small, parts_small = ps.fused_iteration(phi, u0, c1, c2, p,
                                                    interpret=True)
    finally:
        ps._VMEM_BUDGET = old_budget
        ps.fused_iteration.clear_cache()
    # band layouts agree to f32 ulp noise (vectorization patterns differ
    # with tile shape, so bitwise equality is not expected)
    np.testing.assert_allclose(np.asarray(got_big), np.asarray(got_small),
                               rtol=1e-5, atol=1e-4)
    np.testing.assert_allclose(np.asarray(parts_big),
                               np.asarray(parts_small), rtol=1e-5, atol=0.5)


def test_segment_fused_full_run():
    img, gt = two_disks(64, 128, noise=6.0)
    p = CVParams(init="circle")
    res = segment_fused(jnp.asarray(img, F32), p, interpret=True)
    assert iou(np.asarray(res.mask), gt) >= 0.98
    assert int(res.iters) < p.max_iter


def test_segment_fused_matches_jnp_trajectory():
    from chan_vese_tpu import segment_fixed

    img, _ = two_disks(64, 128, noise=6.0)
    u = jnp.asarray(img, F32)
    p = CVParams(init="circle")
    phi_f, mask_f = segment_fused_fixed(u, p, iters=15, interpret=True)
    tr = segment_fixed(u, p, iters=15)
    np.testing.assert_array_equal(np.asarray(mask_f), np.asarray(tr.mask))
    # single-iteration agreement is ~1e-6 (test above); over 15 violent
    # sharp-interface iterations fp divergence grows, so bound loosely -
    # the mask equality above is the meaningful check
    np.testing.assert_allclose(np.asarray(phi_f), np.asarray(tr.phi),
                               rtol=0.2, atol=5.0)


def test_fallback_for_unsupported_width():
    img, gt = two_disks(48, 50, noise=6.0)  # W=50 not lane-aligned
    p = CVParams(init="circle")
    res = segment_fused(jnp.asarray(img, F32), p, interpret=True)
    assert iou(np.asarray(res.mask), gt) >= 0.98


def test_kernel_atan_accuracy():
    """The in-kernel Cephes-style atan (Mosaic has no atan primitive) must
    track jnp.arctan to f32 precision across the full dynamic range."""
    x = np.concatenate([
        np.linspace(-1e4, 1e4, 20001),
        np.linspace(-2.0, 2.0, 4001),
        [0.0, 1e-20, -1e-20, 1e20, -1e20],
    ]).astype(np.float32)
    got = np.asarray(pallas_sweep._atan(jnp.asarray(x)))
    want = np.arctan(x)
    np.testing.assert_allclose(got, want, rtol=3e-7, atol=3e-7)


@pytest.mark.tpu
def test_fused_iteration_compiled_tpu():
    """Compiled-on-chip equivalence (run with RUN_TPU_TESTS=1)."""
    rng = np.random.default_rng(2)
    shape = (256, 256)
    u0 = jnp.asarray(rng.uniform(0, 255, shape), F32)
    phi = jnp.asarray(rng.standard_normal(shape), F32)
    p = CVParams()
    c1, c2 = region_means(u0, phi, p.eps)
    got_phi, got_parts = pallas_sweep.fused_iteration(phi, u0, c1, c2, p)
    want_phi, want_parts = _ref_iteration(phi, u0, c1, c2, p)
    np.testing.assert_allclose(np.asarray(got_phi), np.asarray(want_phi),
                               rtol=2e-6, atol=2e-5)
    np.testing.assert_allclose(np.asarray(got_parts)[:2],
                               np.asarray(want_parts)[:2], rtol=1e-4)
