"""Packed-color (parity-plane) kernel tests (ops/pallas_packed.py).

The packed layout is a pure layout change: per-cell arithmetic is
ops/pallas_sweep._update_all's expression on the same values, so packed
trajectories match the flat banded kernel's frozen-means trajectory to
FMA-contraction level (XLA may fuse a*b+c differently across program
shapes; interpret-mode diffs are ~2e-6 relative in f32 and vanish in
f64).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from chan_vese_tpu.models.banded import segment_banded_fixed
from chan_vese_tpu.ops import pallas_banded, pallas_packed as pp
from chan_vese_tpu.ops.reductions import region_means
from chan_vese_tpu.params import CVParams
from fixtures import two_disks

F32 = jnp.float32


def test_pack_unpack_roundtrip():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((32, 256)), F32)
    planes = pp._pack(x)
    assert planes.shape == (2, 2, 16, 128)
    np.testing.assert_array_equal(np.asarray(pp._unpack(planes)),
                                  np.asarray(x))
    # plane (a, b) holds phi[2r+a, 2c+b]
    xn = np.asarray(x)
    for a in (0, 1):
        for b in (0, 1):
            np.testing.assert_array_equal(np.asarray(planes[a, b]),
                                          xn[a::2, b::2])


def test_pack_inside_jit_does_not_leak_tracer():
    """_perm_matrix's lru_cache must hold NUMPY, not a traced jnp
    constant: when the first _pack of a session happens inside an outer
    jit trace, a cached jnp array is a DynamicJaxprTracer and poisons
    every later trace (UnexpectedTracerError — hit by the round-4
    bench_configs re-record, where config 1's outer-jitted packed
    resident solve leaked into config 2's trace)."""
    pp._perm_matrix_np.cache_clear()
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.uniform(0, 255, (32, 256)), F32)

    @jax.jit
    def first(x):  # populates the cache while tracing
        return pp._unpack(pp._pack(x))

    @jax.jit
    def second(x):  # distinct trace must not see the first trace's value
        return pp._unpack(pp._pack(x + 1.0)) - 1.0

    np.testing.assert_allclose(np.asarray(first(x)), np.asarray(x))
    np.testing.assert_allclose(np.asarray(second(x)), np.asarray(x),
                               rtol=0, atol=1e-4)


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.float64])
def test_pack_mxu_matches_legacy(dtype):
    """W % 256 == 0 dispatches _pack/_unpack to the MXU permutation
    matmul (round-4: the reshape+transpose lowering cost 17.2 ms per 4K
    segment call on-chip; the matmul route is ~75x cheaper, bit-exact
    for normals under HIGHEST precision — denormals flush to zero,
    which TPU arithmetic does anyway; bench artifact
    artifacts/bench_pack_mxu_2026-08-18.out)."""
    rng = np.random.default_rng(3)

    def legacy_pack(x):
        h, w = x.shape
        return x.reshape(h // 2, 2, w // 2, 2).transpose(1, 3, 0, 2)

    for shape in [(32, 512), (48, 768), (30, 3840)]:
        x = jnp.asarray(rng.uniform(-300, 300, shape), dtype)
        x = x.at[1, 1].set(-0.0).at[2, 3].set(0.0)
        assert shape[1] % pp._MXU_G == 0  # MXU route engaged
        planes = pp._pack(x)
        np.testing.assert_array_equal(np.asarray(planes),
                                      np.asarray(legacy_pack(x)))
        np.testing.assert_array_equal(np.asarray(pp._unpack(planes)),
                                      np.asarray(x))
    # fallback widths (sharded local shapes) keep the legacy path
    x = jnp.asarray(rng.uniform(-300, 300, (16, 120)), dtype)
    np.testing.assert_array_equal(np.asarray(pp._unpack(pp._pack(x))),
                                  np.asarray(x))
    np.testing.assert_array_equal(np.asarray(pp._pack(x)),
                                  np.asarray(legacy_pack(x)))


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.float64])
def test_pack_n_batched_matches_per_frame(dtype):
    """_pack_n/_unpack_n lower the batch as ONE batched MXU matmul +
    transpose (O(1) trace size) instead of the former N-unrolled
    per-frame loop (ADVICE r3: N-linear program size at config-5 scale).
    Must equal the per-frame _pack exactly, plane for plane, and
    round-trip bit-exactly; non-MXU widths fall back to the loop."""
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.uniform(-300, 300, (5, 32, 512)), dtype)
    x = x.at[0, 1, 1].set(-0.0).at[3, 2, 3].set(0.0)
    planes = pp._pack_n(x)
    assert planes.shape == (5, 2, 2, 16, 256)
    np.testing.assert_array_equal(
        np.asarray(planes),
        np.stack([np.asarray(pp._pack(f)) for f in x]))
    np.testing.assert_array_equal(np.asarray(pp._unpack_n(planes)),
                                  np.asarray(x))
    # fallback width (odd sharded local shape): loop path, same contract
    y = jnp.asarray(rng.uniform(-300, 300, (3, 16, 120)), dtype)
    np.testing.assert_array_equal(
        np.asarray(pp._pack_n(y)),
        np.stack([np.asarray(pp._pack(f)) for f in y]))
    np.testing.assert_array_equal(np.asarray(pp._unpack_n(pp._pack_n(y))),
                                  np.asarray(y))


@pytest.mark.parametrize("k", [1, 3, 8])
def test_packed_resident_matches_banded(k):
    rng = np.random.default_rng(0)
    shape = (64, 256)
    u0 = jnp.asarray(rng.uniform(0, 255, shape), F32)
    phi = jnp.asarray(rng.standard_normal(shape) * 5, F32)
    p = CVParams()
    c1, c2 = region_means(u0, phi, p.eps)
    want, wparts = pallas_banded.banded_chunk(phi, u0, c1, c2, p, k,
                                              interpret=True)
    got, gparts = pp.packed_chunk(phi, u0, c1, c2, p, k, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-6, atol=2e-5)
    np.testing.assert_allclose(np.asarray(gparts)[:5],
                               np.asarray(wparts)[:5], rtol=2e-5, atol=0.5)
    # the flat control variant shares the same contract
    flat, fparts = pp.packed_chunk(phi, u0, c1, c2, p, k, packed=False,
                                   interpret=True)
    np.testing.assert_allclose(np.asarray(flat), np.asarray(want),
                               rtol=2e-6, atol=2e-5)


@pytest.mark.parametrize("k,unroll", [(1, 1), (3, 1), (8, 4)])
def test_packed_banded_matches_banded(k, unroll):
    rng = np.random.default_rng(1)
    shape = (96, 256)
    u0 = jnp.asarray(rng.uniform(0, 255, shape), F32)
    phi = jnp.asarray(rng.standard_normal(shape) * 5, F32)
    p = CVParams()
    c1, c2 = region_means(u0, phi, p.eps)
    want, wparts = pallas_banded.banded_chunk(phi, u0, c1, c2, p, k,
                                              unroll=unroll,
                                              interpret=True)
    out, gparts = pp.packed_banded_chunk(pp._pack(phi), pp._pack(u0),
                                         c1, c2, p, k, unroll=unroll,
                                         interpret=True)
    got = pp._unpack(out)
    # FMA-contraction differences compound over in-chunk iterations:
    # ~2e-6/iteration relative, a handful of cells reach ~4e-5 at k=8
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(gparts)[:5],
                               np.asarray(wparts)[:5], rtol=2e-5, atol=0.5)


def test_packed_banded_f64_exactness():
    """In f64 (no FMA-contraction headroom at this tolerance) the packed
    trajectory is the banded trajectory to 1e-12."""
    rng = np.random.default_rng(2)
    shape = (64, 256)
    u0 = jnp.asarray(rng.uniform(0, 255, shape), jnp.float64)
    phi = jnp.asarray(rng.standard_normal(shape) * 5, jnp.float64)
    p = CVParams()
    c1, c2 = region_means(u0, phi, p.eps)
    want, _ = pallas_banded.banded_chunk(phi, u0, c1, c2, p, 4,
                                         interpret=True)
    out, _ = pp.packed_banded_chunk(pp._pack(phi), pp._pack(u0), c1, c2,
                                    p, 4, interpret=True)
    np.testing.assert_allclose(np.asarray(pp._unpack(out)),
                               np.asarray(want), rtol=1e-12, atol=1e-12)


def test_packed_driver_two_disks():
    """segment_banded_fixed(packed=True) end-to-end: masks equal the
    flat driver's on a real segmentation."""
    img, gt = two_disks(64, 256, noise=6.0)
    u0 = jnp.asarray(img, F32)
    p = CVParams()  # checkerboard init: contours everywhere, converges
    phi_f, mask_f = segment_banded_fixed(u0, p, iters=120, k=8,
                                         interpret=True)
    phi_p, mask_p = segment_banded_fixed(u0, p, iters=120, k=8,
                                         packed=True, interpret=True)
    np.testing.assert_array_equal(np.asarray(mask_p), np.asarray(mask_f))
    # sanity only - this wide fixture plateaus around IoU ~0.78 at the
    # default mu (small noise islands survive); the load-bearing check
    # is the mask equality above
    from fixtures import iou
    assert iou(np.asarray(mask_p), gt) >= 0.7


def test_packed_multiband_equals_single_band():
    """Band layout must not change packed values (the overlapped-tiling
    invariant on the plane layout)."""
    rng = np.random.default_rng(3)
    shape = (128, 256)
    k = 3
    u0 = jnp.asarray(rng.uniform(0, 255, shape), F32)
    phi = jnp.asarray(rng.standard_normal(shape) * 10, F32)
    p = CVParams()
    c1, c2 = region_means(u0, phi, p.eps)
    big, pbig = pp.packed_banded_chunk(pp._pack(phi), pp._pack(u0),
                                       c1, c2, p, k, interpret=True)
    import chan_vese_tpu.ops.pallas_packed as mod
    old = mod._TILES_BANDED
    try:
        # force tiny bands through the budget knob
        mod._TILES_BANDED = (mod._VMEM_LIMIT // (shape[1] * 4 * 16))
        mod.packed_banded_chunk.clear_cache()
        bp, upp, dnp = mod.band_rows_packed(*shape, k)
        assert bp == 8 and mod.supports_packed_banded(*shape, k)
        small, psmall = pp.packed_banded_chunk(pp._pack(phi), pp._pack(u0),
                                               c1, c2, p, k,
                                               interpret=True)
    finally:
        mod._TILES_BANDED = old
        mod.packed_banded_chunk.clear_cache()
    np.testing.assert_allclose(np.asarray(big), np.asarray(small),
                               rtol=2e-6, atol=2e-5)


def test_packed_mp2_resident_matches_flat_labels():
    """Packed 4-phase resident kernel: one iteration matches the flat
    kernel at FMA level; long runs settle on the same labels (the mp2
    trajectory class - |phi| drifts decorrelate, labels agree)."""
    from chan_vese_tpu.models.multiphase import (init_multiphase,
                                                 labels_from_phis)
    from chan_vese_tpu.ops import pallas_multiphase as pm

    rng = np.random.default_rng(0)
    H, W = 64, 256
    lab = np.zeros((H, W), np.int32)
    lab[:H // 2, W // 2:] = 1
    lab[H // 2:, :W // 2] = 2
    lab[H // 2:, W // 2:] = 3
    vals = np.array([40.0, 110.0, 180.0, 240.0])
    img = vals[lab] + 4.0 * rng.standard_normal((H, W))
    u0 = jnp.asarray(img, F32)
    phis = init_multiphase((H, W), 2, dtype=F32)
    p = CVParams(mu=0.003 * 255 ** 2)

    a1, pa = pm.mp2_resident_iterations(phis, u0, p, 1, interpret=True)
    b1, pb = pp.packed_mp2_resident_iterations(phis, u0, p, 1,
                                               interpret=True)
    np.testing.assert_allclose(np.asarray(b1), np.asarray(a1),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(pb)[:, :2],
                               np.asarray(pa)[:, :2], rtol=1e-3, atol=2.0)

    a, _ = pm.mp2_resident_iterations(phis, u0, p, 24, interpret=True)
    b, _ = pp.packed_mp2_resident_iterations(phis, u0, p, 24, unroll=2,
                                             interpret=True)
    lab_diff = (np.asarray(labels_from_phis(a))
                != np.asarray(labels_from_phis(b))).sum()
    assert lab_diff <= 5, lab_diff


def test_segment_multiphase_routes_packed_resident():
    """segment_multiphase auto-routes the packed resident kernel on
    supported shapes and still matches the jnp path's labels."""
    from chan_vese_tpu.models import multiphase as mp

    rng = np.random.default_rng(1)
    H, W = 64, 256
    lab = np.zeros((H, W), np.int32)
    lab[:H // 2, W // 2:] = 1
    lab[H // 2:, :W // 2] = 2
    lab[H // 2:, W // 2:] = 3
    vals = np.array([40.0, 110.0, 180.0, 240.0])
    img = vals[lab] + 4.0 * rng.standard_normal((H, W))
    u0 = jnp.asarray(img, F32)
    p = CVParams(mu=0.003 * 255 ** 2)
    got = mp.segment_multiphase(u0, p, m_sets=2, use_pallas=True,
                                interpret=True, fixed=True, max_iter=20)
    want = mp.segment_multiphase(u0, p, m_sets=2, use_pallas=False,
                                 fixed=True, max_iter=20)
    lab_diff = (np.asarray(got.labels) != np.asarray(want.labels)).sum()
    assert lab_diff <= 5, lab_diff


def test_packed_resident_exact_means_class():
    """Exact-means packed resident kernels (scalar/mc/batch): per-
    iteration means come from plane-sum order, so phi drifts at the
    documented reduction-order class level while masks stay identical."""
    from chan_vese_tpu.ops import pallas_resident as pr
    from chan_vese_tpu.utils.init_phi import init_phi

    img, _ = two_disks(64, 256, noise=6.0)
    u0 = jnp.asarray(img, F32)
    phi = init_phi((64, 256), "checkerboard", F32)
    p = CVParams()

    a, pa = pr.resident_iterations(phi, u0, p, 40, interpret=True)
    b, pb = pp.packed_resident_iterations(phi, u0, p, 40, interpret=True)
    np.testing.assert_array_equal(np.sign(np.asarray(a)),
                                  np.sign(np.asarray(b)))
    np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                               rtol=1e-2, atol=1e-2)
    assert pb.shape == (40, 8)

    ucf = jnp.stack([u0, 0.8 * u0 + 10, 255 - u0])
    a, _ = pr.resident_iterations_mc(phi, ucf, p, 20,
                                     lambda1=(1.0, 1.2, 0.8),
                                     interpret=True)
    b, pb = pp.packed_resident_iterations_mc(phi, ucf, p, 20,
                                             lambda1=(1.0, 1.2, 0.8),
                                             interpret=True)
    np.testing.assert_array_equal(np.sign(np.asarray(a)),
                                  np.sign(np.asarray(b)))
    assert pb.shape == (20, 7)

    phis = jnp.stack([phi, phi + 0.5])
    u0s = jnp.stack([u0, u0 * 0.9])
    a, _ = pr.resident_iterations_batch(phis, u0s, p, 20, interpret=True)
    b, pb = pp.packed_resident_iterations_batch(phis, u0s, p, 20,
                                                interpret=True)
    np.testing.assert_array_equal(np.sign(np.asarray(a)),
                                  np.sign(np.asarray(b)))
    assert pb.shape == (2, 8)


@pytest.mark.parametrize("k,unroll", [(3, 1), (8, 1), (8, 2)])
def test_packed_banded_fusej_matches_unfused(k, unroll):
    """fuse=True (in-kernel fori_loop over j, ref-based plane state) is
    the SAME program as the j-grid packed kernel: bitwise planes."""
    rng = np.random.default_rng(7)
    shape = (64, 256)
    u0 = jnp.asarray(rng.uniform(0, 255, shape), F32)
    phi = jnp.asarray(rng.standard_normal(shape) * 5, F32)
    p = CVParams()
    c1, c2 = region_means(u0, phi, p.eps)
    a, pa = pp.packed_banded_chunk(pp._pack(phi), pp._pack(u0), c1, c2,
                                   p, k, unroll=unroll, interpret=True)
    b, pb = pp.packed_banded_chunk(pp._pack(phi), pp._pack(u0), c1, c2,
                                   p, k, unroll=unroll, fuse=True,
                                   interpret=True)
    assert np.array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_allclose(np.asarray(pa), np.asarray(pb),
                               rtol=1e-5, atol=0.5)


@pytest.mark.tpu
def test_packed_banded_fusej_compiled_tpu():
    """Compiled packed fused-j kernel on the chip vs the flat reference."""
    rng = np.random.default_rng(8)
    shape = (256, 256)
    u0 = jnp.asarray(rng.uniform(0, 255, shape), F32)
    phi = jnp.asarray(rng.standard_normal(shape), F32)
    p = CVParams()
    c1, c2 = region_means(u0, phi, p.eps)
    want, wparts = pallas_banded.banded_chunk(phi, u0, c1, c2, p, 8)
    out, gparts = pp.packed_banded_chunk(pp._pack(phi), pp._pack(u0),
                                         c1, c2, p, 8, fuse=True)
    np.testing.assert_allclose(np.asarray(pp._unpack(out)),
                               np.asarray(want), rtol=1e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(gparts)[:2],
                               np.asarray(wparts)[:2], rtol=1e-4)


@pytest.mark.parametrize("k,unroll", [(1, 1), (4, 1), (8, 4)])
def test_packed_banded_mc_matches_banded_mc(k, unroll):
    """Packed parity-plane mc banded kernel == flat mc banded kernel
    (f64: no FMA-contraction headroom at this tolerance)."""
    rng = np.random.default_rng(9)
    H, W, C = 64, 256, 3
    u0 = jnp.asarray(rng.uniform(0, 255, (H, W, C)), jnp.float64)
    phi = jnp.asarray(rng.standard_normal((H, W)) * 5, jnp.float64)
    p = CVParams()
    c1, c2 = region_means(u0, phi, p.eps)
    ucf = jnp.transpose(u0, (2, 0, 1))
    want, wparts = pallas_banded.banded_chunk_mc(phi, ucf, c1, c2, p, k,
                                                 unroll=unroll,
                                                 interpret=True)
    got, gparts = pp.packed_banded_chunk_mc(
        pp._pack(phi), pp._pack_mc(ucf), c1, c2, p, k,
        unroll=unroll, interpret=True)
    np.testing.assert_allclose(np.asarray(pp._unpack(got)),
                               np.asarray(want), rtol=1e-12, atol=1e-12)
    np.testing.assert_allclose(np.asarray(gparts), np.asarray(wparts),
                               rtol=1e-10, atol=1e-6)


def test_packed_banded_mc_driver_routes():
    """segment_banded_fixed(packed=True) on an RGB image runs the packed
    mc kernel and matches the flat-kernel driver elementwise (f64)."""
    from chan_vese_tpu.models.banded import segment_banded_fixed

    rng = np.random.default_rng(10)
    H, W, C = 64, 256, 3
    u0 = jnp.asarray(rng.uniform(0, 255, (H, W, C)), jnp.float64)
    p = CVParams()
    a, _ = segment_banded_fixed(u0, p, 10, k=4, unroll=1, packed=False,
                                interpret=True)
    b, _ = segment_banded_fixed(u0, p, 10, k=4, unroll=1, packed=True,
                                interpret=True)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=1e-11, atol=1e-11)


def test_packed_banded_mc_per_channel_lambdas():
    """Per-channel lambda tuples flow through the packed mc kernel."""
    rng = np.random.default_rng(11)
    H, W, C = 64, 256, 2
    u0 = jnp.asarray(rng.uniform(0, 255, (H, W, C)), jnp.float64)
    phi = jnp.asarray(rng.standard_normal((H, W)) * 5, jnp.float64)
    p = CVParams()
    c1, c2 = region_means(u0, phi, p.eps)
    ucf = jnp.transpose(u0, (2, 0, 1))
    l1, l2 = (1.5, 0.5), (0.7, 1.3)
    want, _ = pallas_banded.banded_chunk_mc(phi, ucf, c1, c2, p, 3,
                                            lambda1=l1, lambda2=l2,
                                            interpret=True)
    got, _ = pp.packed_banded_chunk_mc(
        pp._pack(phi), pp._pack_mc(ucf), c1, c2, p, 3,
        lambda1=l1, lambda2=l2, interpret=True)
    np.testing.assert_allclose(np.asarray(pp._unpack(got)),
                               np.asarray(want), rtol=1e-12, atol=1e-12)


@pytest.mark.parametrize("k,unroll", [(3, 1), (8, 1), (8, 4)])
def test_packed_banded_mc_fusej_matches_unfused(k, unroll):
    """fuse=True packed mc (in-kernel fori_loop over j) is the SAME
    program as the j-grid packed mc kernel: bitwise planes."""
    rng = np.random.default_rng(13)
    H, W, C = 64, 256, 3
    u0 = jnp.asarray(rng.uniform(0, 255, (H, W, C)), F32)
    phi = jnp.asarray(rng.standard_normal((H, W)) * 5, F32)
    p = CVParams()
    c1, c2 = region_means(u0, phi, p.eps)
    ucf = jnp.transpose(u0, (2, 0, 1))
    a, pa = pp.packed_banded_chunk_mc(
        pp._pack(phi), pp._pack_mc(ucf), c1, c2, p, k,
        unroll=unroll, interpret=True)
    b, pb = pp.packed_banded_chunk_mc(
        pp._pack(phi), pp._pack_mc(ucf), c1, c2, p, k,
        unroll=unroll, fuse=True, interpret=True)
    assert np.array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_allclose(np.asarray(pa), np.asarray(pb),
                               rtol=1e-5, atol=0.5)


def test_packed_banded_mc_driver_plumbs_fusej():
    """segment_banded_fixed(packed=True, fuse=True) on RGB routes the
    fuse flag into the packed mc kernel and matches the flat driver
    (f64). Guards the driver plumbing both ways (the round-3 fused-j
    rows were invalidated by exactly this class of dropped-flag bug)."""
    from chan_vese_tpu.models.banded import segment_banded_fixed

    rng = np.random.default_rng(14)
    H, W, C = 64, 256, 3
    u0 = jnp.asarray(rng.uniform(0, 255, (H, W, C)), jnp.float64)
    p = CVParams()
    a, _ = segment_banded_fixed(u0, p, 10, k=4, unroll=1, packed=False,
                                fuse=False, interpret=True)
    b, _ = segment_banded_fixed(u0, p, 10, k=4, unroll=1, packed=True,
                                fuse=True, interpret=True)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=1e-11, atol=1e-11)


@pytest.mark.tpu
def test_packed_banded_mc_fusej_compiled_tpu():
    """Compiled packed fused-j mc kernel on the chip vs the flat mc
    kernel."""
    rng = np.random.default_rng(15)
    H, W, C = 256, 256, 3
    u0 = jnp.asarray(rng.uniform(0, 255, (H, W, C)), F32)
    phi = jnp.asarray(rng.standard_normal((H, W)), F32)
    p = CVParams()
    c1, c2 = region_means(u0, phi, p.eps)
    ucf = jnp.transpose(u0, (2, 0, 1))
    want, wparts = pallas_banded.banded_chunk_mc(phi, ucf, c1, c2, p, 8)
    got, gparts = pp.packed_banded_chunk_mc(
        pp._pack(phi), pp._pack_mc(ucf), c1, c2, p, 8, fuse=True)
    np.testing.assert_allclose(np.asarray(pp._unpack(got)),
                               np.asarray(want), rtol=1e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(gparts)[:4],
                               np.asarray(wparts)[:4], rtol=1e-4)


@pytest.mark.tpu
def test_packed_banded_mc_compiled_tpu():
    """Compiled packed mc kernel on the chip vs the flat mc kernel."""
    rng = np.random.default_rng(12)
    H, W, C = 256, 256, 3
    u0 = jnp.asarray(rng.uniform(0, 255, (H, W, C)), F32)
    phi = jnp.asarray(rng.standard_normal((H, W)), F32)
    p = CVParams()
    c1, c2 = region_means(u0, phi, p.eps)
    ucf = jnp.transpose(u0, (2, 0, 1))
    want, wparts = pallas_banded.banded_chunk_mc(phi, ucf, c1, c2, p, 8)
    got, gparts = pp.packed_banded_chunk_mc(
        pp._pack(phi), pp._pack_mc(ucf), c1, c2, p, 8)
    np.testing.assert_allclose(np.asarray(pp._unpack(got)),
                               np.asarray(want), rtol=1e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(gparts)[:4],
                               np.asarray(wparts)[:4], rtol=1e-4)
