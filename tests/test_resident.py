"""VMEM-resident multi-iteration kernel (ops/pallas_resident.py) and its
drivers (models/resident.py). Interpret mode on CPU; the compiled-on-chip
check lives in the tpu-marked test at the bottom."""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from chan_vese_tpu import CVParams, segment, segment_resident
from chan_vese_tpu.models.resident import segment_resident_fixed
from chan_vese_tpu.models.scalar import segment_fixed
from chan_vese_tpu.ops.pallas_resident import (resident_iterations,
                                               supports_resident)
from chan_vese_tpu.ops.reductions import region_means
from chan_vese_tpu.utils.init_phi import init_phi
from fixtures import iou, two_disks

F32 = jnp.float32


def _fix(h=64, w=128):
    img, gt = two_disks(h, w, noise=6.0)
    return jnp.asarray(img, F32), gt


def test_supports_envelope():
    assert supports_resident(256, 256)
    assert supports_resident(1024, 1024)
    assert not supports_resident(2048, 2048)  # exceeds VMEM
    assert not supports_resident(64, 100)     # W % 128
    assert not supports_resident(63, 128)     # H % 8


def test_first_iteration_exact_and_means_match():
    """Iteration 1 is bit-comparable to the jnp path (before reduction-
    order drift); partials row 0 reproduces region_means of phi0."""
    u, _ = _fix()
    p = CVParams(init="circle")
    phi0 = init_phi((64, 128), "circle", F32)
    got, parts = resident_iterations(phi0, u, p, iters=1, interpret=True)
    tr = segment_fixed(u, p, iters=1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(tr.phi),
                               rtol=1e-6, atol=1e-5)
    c1, c2 = region_means(u, phi0, p.eps)
    n = 64 * 128
    c1k = parts[0, 0] / parts[0, 1]
    c2k = (jnp.sum(u) - parts[0, 0]) / (n - parts[0, 1])
    np.testing.assert_allclose(float(c1k), float(c1), rtol=1e-6)
    np.testing.assert_allclose(float(c2k), float(c2), rtol=1e-6)


def test_long_run_mask_matches_jnp():
    """Trajectories drift at f32-ulp level (in-kernel reduction order) but
    the segmentation is identical."""
    u, gt = _fix()
    p = CVParams(init="circle")
    phi0 = init_phi((64, 128), "circle", F32)
    got, parts = resident_iterations(phi0, u, p, iters=60, interpret=True)
    tr = segment_fixed(u, p, iters=60)
    assert iou(np.asarray(got) >= 0, np.asarray(tr.mask)) == 1.0
    assert iou(np.asarray(got) >= 0, gt) > 0.95
    assert float(parts[-1, 3]) == 0.0  # flips converged to zero


def test_fixed_driver_and_fallbacks():
    u, gt = _fix()
    p = CVParams(init="circle")
    phi, mask = segment_resident_fixed(u, p, iters=60, interpret=True)
    assert iou(np.asarray(mask), gt) > 0.95
    # non-redblack order falls back to the (jnp-fallback) fixed driver
    p_j = CVParams(init="circle", order="jacobi")
    phi_j, _ = segment_resident_fixed(u, p_j, iters=10, interpret=True)
    tr = segment_fixed(u, p_j, iters=10)
    np.testing.assert_array_equal(np.asarray(phi_j), np.asarray(tr.phi))
    # unsupported width falls back too (65x100)
    img, _ = two_disks(64, 100, noise=6.0)
    phi_u, _ = segment_resident_fixed(jnp.asarray(img, F32), p, iters=10,
                                      interpret=True)
    assert phi_u.shape == (64, 100)


def test_tolerance_driver_converges():
    u, gt = _fix()
    p = CVParams(init="circle")
    res = segment_resident(u, p, chunk=8, interpret=True)
    assert iou(np.asarray(res.mask), gt) > 0.95
    assert int(res.iters) % 8 == 0  # chunk-aligned
    ref = segment(u, p)
    assert iou(np.asarray(res.mask), np.asarray(ref.mask)) > 0.99
    # converged within one chunk of the unchunked iteration count
    assert abs(int(res.iters) - int(ref.iters)) <= 8 + 2


def test_tolerance_driver_divergence_and_validation():
    p = CVParams(conv_norm="rms", max_iter=100)
    bad = jnp.full((64, 128), jnp.nan, F32)
    res = segment_resident(bad, p, chunk=8, interpret=True)
    assert int(res.iters) <= 8
    with pytest.raises(ValueError, match="conv_norm"):
        u, _ = _fix()
        segment_resident(u, CVParams(conv_norm="nope"), interpret=True)
    with pytest.raises(ValueError, match="chunk"):
        u, _ = _fix()
        segment_resident(u, CVParams(), chunk=0, interpret=True)


def test_tolerance_driver_stops_exactly_at_max_iter():
    """ADVICE.md round-1: the chunked driver must not overshoot max_iter.
    tol=0 never converges, so the run must execute EXACTLY max_iter
    iterations (full chunks + the static remainder chunk)."""
    u, _ = _fix()
    for max_iter, chunk in ((100, 16), (10, 16), (32, 16), (7, 4)):
        p = CVParams(init="circle", tol=0.0, max_iter=max_iter)
        res = segment_resident(u, p, chunk=chunk, interpret=True)
        assert int(res.iters) == max_iter, (max_iter, chunk, int(res.iters))


def test_reinit_falls_back_to_banded():
    u, gt = _fix()
    p = CVParams(init="circle", reinit_every=5)
    phi, mask = segment_resident_fixed(u, p, iters=30, interpret=True)
    from chan_vese_tpu import segment_fused_fixed
    phi_b, _ = segment_fused_fixed(u, p, iters=30, interpret=True)
    np.testing.assert_array_equal(np.asarray(phi), np.asarray(phi_b))


@pytest.mark.tpu
@pytest.mark.skipif(not os.environ.get("RUN_TPU_TESTS"),
                    reason="needs a real TPU chip")
def test_resident_compiled_on_chip():
    u, gt = _fix(256, 256)
    p = CVParams(init="circle")
    res = segment_resident(u, p, chunk=16)
    assert iou(np.asarray(res.mask), gt) > 0.95
    phi, mask = segment_resident_fixed(u, p, iters=100)
    assert iou(np.asarray(mask), gt) > 0.95


def test_batched_resident_matches_single():
    """Each frame of the batched resident kernel reproduces the
    single-image kernel bitwise (same math, same order per frame)."""
    u, gt = _fix()
    p = CVParams(init="circle")
    phi0 = init_phi((64, 128), "circle", F32)
    stack_u = jnp.stack([u, u[::-1]])
    stack_p = jnp.stack([phi0, phi0])
    from chan_vese_tpu.ops.pallas_resident import resident_iterations_batch
    phis, parts = resident_iterations_batch(stack_p, stack_u, p, iters=40,
                                            interpret=True)
    ref, rparts = resident_iterations(phi0, u, p, iters=40, interpret=True)
    np.testing.assert_array_equal(np.asarray(phis[0]), np.asarray(ref))
    np.testing.assert_array_equal(np.asarray(parts[0]),
                                  np.asarray(rparts[-1]))
    assert iou(np.asarray(phis[1]) >= 0, gt[::-1]) > 0.95


def test_stack_resident_driver_and_fallback():
    from chan_vese_tpu.models.batched import segment_stack_fixed
    from chan_vese_tpu.models.resident import segment_stack_resident_fixed

    u, gt = _fix()
    stack = jnp.stack([u, u])
    p = CVParams(init="circle")
    phis, masks = segment_stack_resident_fixed(stack, p, iters=40,
                                               interpret=True)
    assert iou(np.asarray(masks[0]), gt) > 0.95
    # jacobi order routes through the banded driver's jnp fallback
    p_j = CVParams(init="circle", order="jacobi")
    phis_j, _ = segment_stack_resident_fixed(stack, p_j, iters=6,
                                             interpret=True)
    ref, _ = segment_stack_fixed(stack, p_j, iters=6)
    np.testing.assert_array_equal(np.asarray(phis_j), np.asarray(ref))


def test_data_parallel_uses_resident(monkeypatch):
    """segment_stack_sharded's fixed path routes through the resident
    stack driver on the data mesh."""
    import jax as _jax

    from chan_vese_tpu.parallel.data_parallel import segment_stack_sharded
    from chan_vese_tpu.parallel.mesh import make_data_mesh

    u, gt = _fix()
    stack = jnp.stack([u] * 8)
    mesh = make_data_mesh(4)
    phis, masks = segment_stack_sharded(stack, CVParams(init="circle"),
                                        mesh, iters=40, use_pallas=True,
                                        interpret=True)
    for k in range(8):
        assert iou(np.asarray(masks[k]), gt) > 0.95


def test_resident_mc_matches_jnp_trajectory():
    """Multichannel resident kernel == jnp vector trajectory (exact
    per-iteration means, so the reference is the plain vector step)."""
    from chan_vese_tpu.ops import pallas_resident
    from chan_vese_tpu.ops.reductions import data_term, region_means

    rng = np.random.default_rng(7)
    shape = (32, 128, 3)
    u0 = jnp.asarray(rng.uniform(0, 255, shape), jnp.float32)
    phi0 = jnp.asarray(rng.standard_normal(shape[:2]) * 3, jnp.float32)
    p = CVParams()
    iters = 5
    l1 = (1.0, 1.2, 0.8)

    ucf = jnp.transpose(u0, (2, 0, 1))
    got, parts = pallas_resident.resident_iterations_mc(
        phi0, ucf, p, iters, lambda1=l1, interpret=True)

    l1e, l2e = p.channel_lambdas(3, l1, None)
    want = phi0
    for _ in range(iters):
        c1, c2 = region_means(u0, want, p.eps)
        f = data_term(u0, c1, c2, p.nu, jnp.asarray(l1e), jnp.asarray(l2e))
        from chan_vese_tpu.ops.sweep import redblack_step
        want = redblack_step(want, f, p)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=3e-5, atol=3e-4)
    assert parts.shape == (iters, 3 + 4)
    assert bool(jnp.all(jnp.isfinite(parts)))


def test_resident_fixed_routes_rgb():
    """(H, W, C) input uses the mc resident kernel; unaligned falls back."""
    from chan_vese_tpu.models.resident import segment_resident_fixed
    from chan_vese_tpu.models.fused import segment_fused_fixed

    rng = np.random.default_rng(8)
    u0 = jnp.asarray(rng.uniform(0, 255, (32, 128, 3)), jnp.float32)
    p = CVParams()
    phi, mask = segment_resident_fixed(u0, p, iters=8, interpret=True)
    phi_ref, _ = segment_fused_fixed(u0, p, iters=8, interpret=True)
    np.testing.assert_allclose(np.asarray(phi), np.asarray(phi_ref),
                               rtol=3e-5, atol=3e-4)
    # unaligned width -> fused/jnp fallback, same shapes out
    u0o = jnp.asarray(rng.uniform(0, 255, (32, 100, 3)), jnp.float32)
    phi2, _ = segment_resident_fixed(u0o, p, iters=4, interpret=True)
    assert phi2.shape == (32, 100)


@pytest.mark.tpu
def test_resident_mc_compiled_tpu():
    """Compiled-on-chip multichannel resident kernel (RUN_TPU_TESTS=1)."""
    from chan_vese_tpu.ops import pallas_resident
    from chan_vese_tpu.models.vector import segment_vector_fixed

    rng = np.random.default_rng(12)
    u0 = jnp.asarray(rng.uniform(0, 255, (256, 256, 3)), jnp.float32)
    p = CVParams()
    from chan_vese_tpu.utils.init_phi import init_phi
    phi0 = init_phi((256, 256), p.init, jnp.float32)
    ucf = jnp.transpose(u0, (2, 0, 1))
    got, _ = pallas_resident.resident_iterations_mc(phi0, ucf, p, 5)
    ref = segment_vector_fixed(u0, p, iters=5, phi0=phi0)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref.phi),
                               rtol=2e-4, atol=2e-2)
