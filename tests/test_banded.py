"""Banded multi-iteration kernel tests (ops/pallas_banded.py).

The trajectory class is frozen-means-per-chunk: the jnp reference here
re-implements exactly that schedule (k red-black steps with a fixed data
term, then a means refresh), and the kernel must match it elementwise.
k = 1 must reproduce the fused kernel's per-iteration schedule exactly.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from chan_vese_tpu.models.banded import segment_banded, segment_banded_fixed
from chan_vese_tpu.models.fused import segment_fused_fixed
from chan_vese_tpu.ops import pallas_banded, pallas_sweep
from chan_vese_tpu.ops.reductions import data_term, region_means
from chan_vese_tpu.ops.sweep import redblack_step
from chan_vese_tpu.params import CVParams
from fixtures import iou, two_disks

F32 = jnp.float32


def _ref_chunk(phi, u0, c1, c2, p, k):
    """k frozen-means red-black iterations (the documented banded class)."""
    f = data_term(u0, c1, c2, p.nu, p.lambda1, p.lambda2)
    for _ in range(k - 1):
        phi = redblack_step(phi, f, p)
    phi_prev = phi
    phi = redblack_step(phi, f, p)
    from chan_vese_tpu.ops.numerics import heaviside
    h = heaviside(phi, p.eps)
    parts = jnp.stack([
        jnp.sum(u0 * h), jnp.sum(h),
        jnp.sum((phi - phi_prev) ** 2),
        jnp.sum(((phi >= 0) != (phi_prev >= 0)).astype(phi.dtype)),
        jnp.sum(jnp.abs(phi - phi_prev)),
    ])
    return phi, parts


@pytest.mark.parametrize("shape,k", [((64, 128), 2), ((64, 128), 4),
                                     ((104, 256), 3), ((256, 384), 8)])
def test_banded_chunk_matches_frozen_means_reference(shape, k):
    rng = np.random.default_rng(0)
    u0 = jnp.asarray(rng.uniform(0, 255, shape), F32)
    phi = jnp.asarray(rng.standard_normal(shape), F32)
    p = CVParams()
    c1, c2 = region_means(u0, phi, p.eps)
    got_phi, got_parts = pallas_banded.banded_chunk(phi, u0, c1, c2, p, k,
                                                    interpret=True)
    want_phi, want_parts = _ref_chunk(phi, u0, c1, c2, p, k)
    np.testing.assert_allclose(np.asarray(got_phi), np.asarray(want_phi),
                               rtol=2e-6, atol=2e-5)
    np.testing.assert_allclose(np.asarray(got_parts)[:5],
                               np.asarray(want_parts),
                               rtol=2e-5, atol=0.5)


def test_banded_k1_matches_fused_iteration():
    """k = 1 is the fused kernel's schedule: same update, same partials."""
    rng = np.random.default_rng(1)
    shape = (64, 128)
    u0 = jnp.asarray(rng.uniform(0, 255, shape), F32)
    phi = jnp.asarray(rng.standard_normal(shape) * 5, F32)
    p = CVParams()
    c1, c2 = region_means(u0, phi, p.eps)
    got_phi, got_parts = pallas_banded.banded_chunk(phi, u0, c1, c2, p, 1,
                                                    interpret=True)
    want_phi, want_parts = pallas_sweep.fused_iteration(
        phi, u0, c1, c2, p, interpret=True)
    np.testing.assert_allclose(np.asarray(got_phi), np.asarray(want_phi),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(got_parts), np.asarray(want_parts),
                               rtol=1e-5, atol=0.5)


def test_banded_multiband_equals_single_band():
    """Force several deep-halo bands; band layout must not change values."""
    rng = np.random.default_rng(2)
    shape = (96, 128)
    k = 3
    u0 = jnp.asarray(rng.uniform(0, 255, shape), F32)
    phi = jnp.asarray(rng.standard_normal(shape) * 10, F32)
    p = CVParams()
    c1, c2 = region_means(u0, phi, p.eps)
    pb = pallas_banded
    got_big, parts_big = pb.banded_chunk(phi, u0, c1, c2, p, k,
                                         interpret=True)
    old = pb._VMEM_BUDGET
    try:
        pb._VMEM_BUDGET = 8 * 128 * 4 * pb._TILES  # force b = 8
        pb.banded_chunk.clear_cache()
        assert pb.band_rows_banded(*shape, k) == 8
        assert pb.supports_banded(*shape, k)
        got_small, parts_small = pb.banded_chunk(phi, u0, c1, c2, p, k,
                                                 interpret=True)
    finally:
        pb._VMEM_BUDGET = old
        pb.banded_chunk.clear_cache()
    np.testing.assert_allclose(np.asarray(got_big), np.asarray(got_small),
                               rtol=2e-6, atol=2e-5)
    np.testing.assert_allclose(np.asarray(parts_big), np.asarray(parts_small),
                               rtol=2e-5, atol=0.5)


def test_banded_fixed_driver_trajectory():
    """Driver == chunked jnp reference over several chunks + remainder."""
    rng = np.random.default_rng(3)
    shape = (64, 128)
    u0 = jnp.asarray(rng.uniform(0, 255, shape), F32)
    p = CVParams()
    k, iters = 4, 11  # 2 full chunks + remainder 3
    from chan_vese_tpu.utils.init_phi import init_phi
    phi = init_phi(shape, p.init, F32)
    got_phi, got_mask = segment_banded_fixed(u0, p, iters=iters, k=k,
                                             phi0=phi, interpret=True)

    n_pix = float(np.prod(shape))
    sum_u = jnp.sum(u0)
    c1, c2 = region_means(u0, phi, p.eps)
    want = phi
    done = 0
    while done < iters:
        size = min(k, iters - done)
        want, parts = _ref_chunk(want, u0, c1, c2, p, size)
        from chan_vese_tpu.ops.reductions import means_from_sums
        c1, c2 = means_from_sums(parts[0], parts[1], sum_u, n_pix)
        done += size
    np.testing.assert_allclose(np.asarray(got_phi), np.asarray(want),
                               rtol=3e-5, atol=3e-4)
    np.testing.assert_array_equal(np.asarray(got_mask),
                                  np.asarray(want) >= 0)


def test_banded_segments_two_disks():
    """End-to-end quality: banded mask agrees with the fused path."""
    u0, _ = two_disks(64, 128, noise=6.0)
    u0 = jnp.asarray(u0, F32)
    p = CVParams(tol=1e-4, max_iter=200, min_iter=10)
    res = segment_banded(u0, p, k=4, interpret=True)
    phi_ref, mask_ref = segment_fused_fixed(u0, p, iters=int(res.iters),
                                            interpret=True)
    assert iou(np.asarray(res.mask), np.asarray(mask_ref)) > 0.99
    assert int(res.iters) <= p.max_iter


def test_banded_max_iter_exact():
    u0, _ = two_disks(64, 128, noise=6.0)
    u0 = jnp.asarray(u0, F32)
    p = CVParams(tol=-1.0, max_iter=10, min_iter=0)  # never converges
    res = segment_banded(u0, p, k=4, interpret=True)
    assert int(res.iters) == 10


def test_banded_divergence_aborts():
    rng = np.random.default_rng(4)
    u0 = jnp.asarray(rng.uniform(0, 255, (64, 128)), F32)
    # dt grotesquely large -> NaN within a few iterations
    p = CVParams(dt=1e30, mu=1e30, tol=1e-12, max_iter=400, min_iter=0,
                 conv_norm="rms")
    res = segment_banded(u0, p, k=4, interpret=True)
    assert int(res.iters) < 400
    assert not np.isfinite(float(res.delta))


def test_banded_fallback_unsupported_shape():
    """Odd width routes to the fused/jnp fallback transparently."""
    u0, _ = two_disks(40, 100, noise=6.0)
    u0 = jnp.asarray(u0, F32)
    p = CVParams(max_iter=8, tol=-1.0, min_iter=0)
    res = segment_banded(u0, p, k=4, interpret=True)
    assert res.phi.shape == (40, 100)
    assert int(res.iters) == 8


def test_halos_alignment():
    assert pallas_banded._halos(1) == (8, 8)
    assert pallas_banded._halos(2) == (8, 8)
    assert pallas_banded._halos(3) == (16, 8)
    assert pallas_banded._halos(8) == (32, 16)
    for k in (1, 2, 3, 5, 8, 16):
        up, dn = pallas_banded._halos(k)
        assert up >= 4 * k and dn >= 2 * k
        assert up % 8 == 0 and dn % 8 == 0


@pytest.mark.tpu
def test_banded_chunk_compiled_tpu():
    """Compiled-on-chip equivalence (run with RUN_TPU_TESTS=1)."""
    rng = np.random.default_rng(10)
    shape = (256, 256)
    u0 = jnp.asarray(rng.uniform(0, 255, shape), F32)
    phi = jnp.asarray(rng.standard_normal(shape), F32)
    p = CVParams()
    c1, c2 = region_means(u0, phi, p.eps)
    got_phi, got_parts = pallas_banded.banded_chunk(phi, u0, c1, c2, p, 4)
    want_phi, want_parts = _ref_chunk(phi, u0, c1, c2, p, 4)
    np.testing.assert_allclose(np.asarray(got_phi), np.asarray(want_phi),
                               rtol=2e-5, atol=2e-3)
    np.testing.assert_allclose(np.asarray(got_parts)[:2],
                               np.asarray(want_parts)[:2], rtol=1e-4)


def test_banded_unroll_equals_unrolled():
    """unroll=2 runs the same math per chunk as unroll=1."""
    rng = np.random.default_rng(5)
    shape = (64, 128)
    u0 = jnp.asarray(rng.uniform(0, 255, shape), F32)
    phi = jnp.asarray(rng.standard_normal(shape), F32)
    p = CVParams()
    c1, c2 = region_means(u0, phi, p.eps)
    a, pa = pallas_banded.banded_chunk(phi, u0, c1, c2, p, 4, unroll=1,
                                       interpret=True)
    b, pb = pallas_banded.banded_chunk(phi, u0, c1, c2, p, 4, unroll=2,
                                       interpret=True)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(pa), np.asarray(pb),
                               rtol=1e-5, atol=0.5)
    with pytest.raises(ValueError, match="unroll"):
        pallas_banded.banded_chunk(phi, u0, c1, c2, p, 4, unroll=3,
                                   interpret=True)


def test_banded_rgb_falls_back_to_fused():
    """(H, W, C) input routes to the fused mc driver, not an unpack crash."""
    rng = np.random.default_rng(6)
    u0 = jnp.asarray(rng.uniform(0, 255, (32, 128, 3)), F32)
    p = CVParams(max_iter=4, tol=-1.0, min_iter=0)
    phi, mask = segment_banded_fixed(u0, p, iters=4, interpret=True)
    assert phi.shape == (32, 128)
    res = segment_banded(u0, p, interpret=True)
    assert res.phi.shape == (32, 128)


def _ref_chunk_mc(phi, u0_hlc, c1, c2, l1, l2, p, kk):
    """k frozen-means iterations, vector-valued jnp reference."""
    f = data_term(u0_hlc, c1, c2, p.nu, jnp.asarray(l1), jnp.asarray(l2))
    for _ in range(kk - 1):
        phi = redblack_step(phi, f, p)
    prev = phi
    phi = redblack_step(phi, f, p)
    from chan_vese_tpu.ops.numerics import heaviside
    h = heaviside(phi, p.eps)
    s_uh = jnp.sum(u0_hlc * h[..., None], axis=(0, 1))
    return phi, prev, s_uh, jnp.sum(h)


@pytest.mark.parametrize("k,unroll", [(3, 1), (4, 2)])
def test_banded_mc_chunk_matches_reference(k, unroll):
    rng = np.random.default_rng(20)
    shape = (64, 128, 3)
    u0 = jnp.asarray(rng.uniform(0, 255, shape), F32)
    phi = jnp.asarray(rng.standard_normal(shape[:2]), F32)
    p = CVParams()
    l1 = (1.0, 1.2, 0.8)
    l1e, l2e = p.channel_lambdas(3, l1, None)
    c1, c2 = region_means(u0, phi, p.eps)
    ucf = jnp.transpose(u0, (2, 0, 1))
    got, parts = pallas_banded.banded_chunk_mc(
        phi, ucf, c1, c2, p, k, unroll=unroll, lambda1=l1, interpret=True)
    want, _, want_suh, want_sh = _ref_chunk_mc(phi, u0, c1, c2, l1e, l2e,
                                               p, k)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-6, atol=2e-5)
    np.testing.assert_allclose(np.asarray(parts[:3]), np.asarray(want_suh),
                               rtol=2e-5)
    assert float(parts[3]) == pytest.approx(float(want_sh), rel=2e-5)


def test_banded_mc_driver_matches_chunked_reference():
    rng = np.random.default_rng(21)
    shape = (64, 128, 3)
    u0 = jnp.asarray(rng.uniform(0, 255, shape), F32)
    p = CVParams()
    k, iters = 4, 10  # 2 chunks + remainder 2
    from chan_vese_tpu.utils.init_phi import init_phi
    phi = init_phi(shape[:2], p.init, F32)
    got_phi, got_mask = segment_banded_fixed(u0, p, iters=iters, k=k,
                                             phi0=phi, interpret=True)

    from chan_vese_tpu.ops.reductions import means_from_sums
    l1e, l2e = p.channel_lambdas(3)
    n_pix = float(np.prod(shape[:2]))
    sum_u = jnp.sum(u0, axis=(0, 1))
    c1, c2 = region_means(u0, phi, p.eps)
    want = phi
    done = 0
    while done < iters:
        size = min(k, iters - done)
        want, _, suh, sh = _ref_chunk_mc(want, u0, c1, c2, l1e, l2e, p,
                                         size)
        c1, c2 = means_from_sums(suh, sh, sum_u, n_pix)
        done += size
    np.testing.assert_allclose(np.asarray(got_phi), np.asarray(want),
                               rtol=3e-5, atol=3e-4)
    np.testing.assert_array_equal(np.asarray(got_mask),
                                  np.asarray(want) >= 0)


@pytest.mark.tpu
def test_banded_mc_compiled_tpu():
    """Compiled-on-chip banded mc chunk (RUN_TPU_TESTS=1)."""
    rng = np.random.default_rng(22)
    shape = (256, 256, 3)
    u0 = jnp.asarray(rng.uniform(0, 255, shape), F32)
    phi = jnp.asarray(rng.standard_normal(shape[:2]), F32)
    p = CVParams()
    l1e, l2e = p.channel_lambdas(3)
    c1, c2 = region_means(u0, phi, p.eps)
    ucf = jnp.transpose(u0, (2, 0, 1))
    got, parts = pallas_banded.banded_chunk_mc(phi, ucf, c1, c2, p, 4,
                                               unroll=2)
    want, _, want_suh, _ = _ref_chunk_mc(phi, u0, c1, c2, l1e, l2e, p, 4)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-3)
    np.testing.assert_allclose(np.asarray(parts[:3]),
                               np.asarray(want_suh), rtol=1e-4)


@pytest.mark.parametrize("k,unroll", [(3, 1), (8, 1), (8, 4)])
def test_banded_mc_fusej_matches_unfused(k, unroll):
    """Multichannel fuse=True (in-kernel fori_loop over j) is the SAME
    program as the j-grid mc kernel: bitwise phi, same partials.
    (64, 256) gives multiple bands so the DMA pipeline is exercised."""
    rng = np.random.default_rng(31)
    shape = (64, 256, 3)
    u0 = jnp.asarray(rng.uniform(0, 255, shape), F32)
    phi = jnp.asarray(rng.standard_normal(shape[:2]), F32)
    p = CVParams()
    l1 = (1.0, 1.2, 0.8)
    c1, c2 = region_means(u0, phi, p.eps)
    ucf = jnp.transpose(u0, (2, 0, 1))
    a, pa = pallas_banded.banded_chunk_mc(
        phi, ucf, c1, c2, p, k, unroll=unroll, lambda1=l1, interpret=True)
    b, pb = pallas_banded.banded_chunk_mc(
        phi, ucf, c1, c2, p, k, unroll=unroll, lambda1=l1, fuse=True,
        interpret=True)
    assert np.array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_allclose(np.asarray(pa), np.asarray(pb),
                               rtol=1e-5, atol=0.5)


def test_banded_mc_fusej_sharded_crop_parity():
    """The mc fused-j kernel under the sharded-canvas contract (parity +
    edge flags + crop + replica-rim resync) matches the j-grid mc kernel
    bitwise."""
    rng = np.random.default_rng(32)
    shape = (64, 256, 3)
    k = 4
    u0 = jnp.asarray(rng.uniform(0, 255, shape), F32)
    phi = jnp.asarray(rng.standard_normal(shape[:2]), F32)
    p = CVParams()
    c1, c2 = region_means(u0, phi, p.eps)
    ucf = jnp.transpose(u0, (2, 0, 1))
    parity = jnp.int32(1)
    edges = jnp.asarray([1.0, 0.0, 1.0, 0.0], F32)
    crop = (16, 48, 16, 240)
    a, pa = pallas_banded.banded_chunk_mc_sharded(
        phi, ucf, c1, c2, p, k, parity, edges, crop, interpret=True)
    b, pb = pallas_banded.banded_chunk_mc_sharded(
        phi, ucf, c1, c2, p, k, parity, edges, crop, fuse=True,
        interpret=True)
    assert np.array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_allclose(np.asarray(pa), np.asarray(pb),
                               rtol=1e-5, atol=0.5)


def test_banded_mc_fusej_driver_plumbs_flag():
    """segment_banded_fixed forwards fuse= on the (H, W, C) route and the
    result matches fuse=False (regression for the dropped-flag bug class
    that invalidated round-3's scalar fusej rows, commit e30b6fb)."""
    rng = np.random.default_rng(33)
    shape = (64, 128, 3)
    u0 = jnp.asarray(rng.uniform(0, 255, shape), F32)
    p = CVParams()
    a, ma = segment_banded_fixed(u0, p, iters=10, k=4, interpret=True)
    b, mb = segment_banded_fixed(u0, p, iters=10, k=4, fuse=True,
                                 interpret=True)
    assert np.array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_array_equal(np.asarray(ma), np.asarray(mb))


@pytest.mark.tpu
def test_banded_mc_fusej_compiled_tpu():
    """Compiled-on-chip mc fused-j chunk vs the frozen-means reference."""
    rng = np.random.default_rng(34)
    shape = (256, 256, 3)
    u0 = jnp.asarray(rng.uniform(0, 255, shape), F32)
    phi = jnp.asarray(rng.standard_normal(shape[:2]), F32)
    p = CVParams()
    l1e, l2e = p.channel_lambdas(3)
    c1, c2 = region_means(u0, phi, p.eps)
    ucf = jnp.transpose(u0, (2, 0, 1))
    got, parts = pallas_banded.banded_chunk_mc(phi, ucf, c1, c2, p, 4,
                                               unroll=2, fuse=True)
    want, _, want_suh, _ = _ref_chunk_mc(phi, u0, c1, c2, l1e, l2e, p, 4)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-3)
    np.testing.assert_allclose(np.asarray(parts[:3]),
                               np.asarray(want_suh), rtol=1e-4)


def test_banded_tolerance_rgb_per_channel_lambdas():
    """segment_banded handles (H, W, C) + per-channel lambdas on BOTH the
    mc-kernel route and the fused fallback (regression: lambda folding
    used to run before the ndim dispatch and raised)."""
    rng = np.random.default_rng(23)
    p = CVParams(max_iter=6, tol=-1.0, min_iter=0)
    # mc kernel route (aligned, tall enough for the k=4 halos)
    u0 = jnp.asarray(rng.uniform(0, 255, (72, 128, 3)), F32)
    res = segment_banded(u0, p, k=4, lambda1=(1.0, 1.2, 0.8),
                         interpret=True)
    assert res.phi.shape == (72, 128)
    assert int(res.iters) == 6
    # fused fallback route (too short for banded halos)
    u0s = jnp.asarray(rng.uniform(0, 255, (32, 128, 3)), F32)
    res2 = segment_banded(u0s, p, k=8, lambda1=(1.0, 1.2, 0.8),
                          interpret=True)
    assert res2.phi.shape == (32, 128)


def test_banded_tolerance_rgb_converges():
    """End-to-end quality on the tolerance-mode mc route."""
    from fixtures import colored_squares

    img, gt = colored_squares(72, 128, noise=4.0)
    u0 = jnp.asarray(img, F32)
    p = CVParams(tol=1e-4, max_iter=200, min_iter=8)
    r = segment_banded(u0, p, k=4, interpret=True)
    m = np.asarray(r.mask)
    # mask polarity depends on which region phi settles positive on
    assert max(iou(m, gt), iou(~m, gt)) > 0.95
    assert int(r.iters) <= 200


def test_patience_iteration_denominated():
    """Tolerance-mode stopping agrees within ~a chunk between the banded
    (chunk-granular) and fused (per-iteration) drivers for the SAME
    CVParams: a below-tol chunk check credits its k iterations to the
    patience streak (VERDICT r2 weak #6). Before that fix patience=6
    meant 6 chunks = 48 extra iterations here."""
    from chan_vese_tpu.models.fused import segment_fused

    u0, _ = two_disks(64, 128, noise=6.0)
    u0 = jnp.asarray(u0, F32)
    k = 8
    p = CVParams(tol=1e-4, max_iter=300, min_iter=4, patience=6)
    ref = segment_fused(u0, p, interpret=True)
    res = segment_banded(u0, p, k=k, interpret=True)
    assert int(res.iters) < 300 and int(ref.iters) < 300
    # residual gap = chunk granularity (up to k late detection) plus the
    # frozen-means trajectory converging a little later than the
    # per-iteration-means one; before the fix the gap was
    # ~patience*(k-1) ~ 40+ extra iterations
    assert abs(int(res.iters) - int(ref.iters)) <= 3 * k, (
        int(res.iters), int(ref.iters))


@pytest.mark.parametrize("k,unroll", [(3, 1), (8, 1), (8, 4)])
def test_banded_fusej_matches_unfused(k, unroll):
    """fuse=True (in-kernel fori_loop over j, ref-based state) is the
    SAME program as the j-grid kernel: bitwise phi, same partials.
    Default geometry at (64, 256) gives 4 bands, so the fused DMA
    pipeline (prefetch next band, store two behind) is exercised."""
    rng = np.random.default_rng(11)
    shape = (64, 256)
    u0 = jnp.asarray(rng.uniform(0, 255, shape), F32)
    phi = jnp.asarray(rng.standard_normal(shape), F32)
    p = CVParams()
    c1, c2 = region_means(u0, phi, p.eps)
    a, pa = pallas_banded.banded_chunk(phi, u0, c1, c2, p, k,
                                       unroll=unroll, interpret=True)
    b, pb = pallas_banded.banded_chunk(phi, u0, c1, c2, p, k,
                                       unroll=unroll, fuse=True,
                                       interpret=True)
    assert np.array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_allclose(np.asarray(pa), np.asarray(pb),
                               rtol=1e-5, atol=0.5)


def test_banded_fusej_sharded_crop_parity():
    """The fused-j kernel under the sharded-canvas contract (parity +
    edge flags + crop + replica-rim resync) matches the j-grid kernel
    bitwise."""
    rng = np.random.default_rng(12)
    shape = (64, 256)
    k = 4
    u0 = jnp.asarray(rng.uniform(0, 255, shape), F32)
    phi = jnp.asarray(rng.standard_normal(shape), F32)
    p = CVParams()
    c1, c2 = region_means(u0, phi, p.eps)
    parity = jnp.int32(1)
    edges = jnp.asarray([1.0, 0.0, 1.0, 0.0], F32)
    crop = (16, 48, 16, 240)
    a, pa = pallas_banded.banded_chunk_sharded(
        phi, u0, c1, c2, p, k, parity, edges, crop, interpret=True)
    b, pb = pallas_banded.banded_chunk_sharded(
        phi, u0, c1, c2, p, k, parity, edges, crop, fuse=True,
        interpret=True)
    assert np.array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_allclose(np.asarray(pa), np.asarray(pb),
                               rtol=1e-5, atol=0.5)


@pytest.mark.tpu
def test_banded_fusej_compiled_tpu():
    """Compiled fused-j kernel on the chip vs the frozen-means reference."""
    rng = np.random.default_rng(13)
    shape = (256, 256)
    u0 = jnp.asarray(rng.uniform(0, 255, shape), F32)
    phi = jnp.asarray(rng.standard_normal(shape), F32)
    p = CVParams()
    c1, c2 = region_means(u0, phi, p.eps)
    got_phi, got_parts = pallas_banded.banded_chunk(phi, u0, c1, c2, p, 8,
                                                    unroll=4, fuse=True)
    want_phi, want_parts = _ref_chunk(phi, u0, c1, c2, p, 8)
    np.testing.assert_allclose(np.asarray(got_phi), np.asarray(want_phi),
                               rtol=2e-5, atol=2e-3)
    np.testing.assert_allclose(np.asarray(got_parts)[:2],
                               np.asarray(want_parts)[:2], rtol=1e-4)


@pytest.mark.parametrize("fuse", [False, True])
def test_driver_forwards_fuse(monkeypatch, fuse):
    """Regression: segment_banded_fixed must forward ``fuse`` to the
    chunk kernels (a round-3 review found it silently dropped, which
    had invalidated the fused-j benchmark rows - they measured the
    unfused kernel against itself)."""
    import chan_vese_tpu.models.banded as mb

    seen = []
    real = pallas_banded.banded_chunk

    def spy(*a, **kw):
        seen.append(kw.get("fuse"))
        return real(*a, **kw)

    monkeypatch.setattr(mb.pallas_banded, "banded_chunk", spy)
    u0 = jnp.asarray(np.random.default_rng(0).uniform(0, 255, (32, 256)),
                     jnp.float32)
    mb.segment_banded_fixed.clear_cache()
    mb.segment_banded_fixed(u0, CVParams(), iters=2, k=2, fuse=fuse,
                            interpret=True)
    mb.segment_banded_fixed.clear_cache()
    assert seen and all(f is fuse for f in seen)


def test_auto_config_pins_measured_defaults():
    """Pin the shipped auto selections at the benchmark sizes (the
    measured tables in docs/BENCHMARKS.md; scripts/ab_4k_bp_unroll.py,
    scripts/ab_mc_packed.py). A refactor that silently changes what a
    default-flag user runs must trip this."""
    from chan_vese_tpu.models.banded import auto_config, auto_config_mc

    # scalar: packed u4+fusej from 4K area up; flat u4+fusej never auto
    assert auto_config(2160, 3840) == (8, 4, True, True)
    assert auto_config(4320, 7680) == (8, 4, True, True)
    assert auto_config(8640, 15360) == (8, 4, True, True)
    # below 4K area: flat u4, no fuse
    assert auto_config(1080, 1920) == (8, 4, False, False)
    # explicit fuse=False keeps packed at u1 (u4 unfused measured loss)
    assert auto_config(2160, 3840, fuse=False) == (8, 1, True, False)

    # mc: round-4 flip - packed u4+fusej at 4K/8K RGB
    assert auto_config_mc(2160, 3840, 3) == (8, 4, True, True)
    assert auto_config_mc(4320, 7680, 3) == (8, 4, True, True)
    # below 4K area: flat u4, no fuse
    assert auto_config_mc(1080, 1920, 3) == (8, 4, False, False)
    # off the packed envelope (W % 256 != 0): flat u4+fusej at 4K area
    assert auto_config_mc(2160, 3848, 3) == (8, 4, False, True)
    # flat path must never pair fuse with unroll=1 (compile-time OOM)
    k, u, pk, fz = auto_config_mc(2160, 3848, 3, unroll=1)
    assert (u, pk, fz) == (1, False, False)
