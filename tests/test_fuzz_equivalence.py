"""Randomized cross-implementation equivalence (fuzzing the kernel and
sweep paths over shapes/params/dtypes that the fixed tests don't pin)."""

import jax.numpy as jnp
import numpy as np
import pytest

from chan_vese_tpu.ops import pallas_sweep, sweep, sweep_np
from chan_vese_tpu.ops.reductions import region_means
from chan_vese_tpu.params import CVParams

RNG = np.random.default_rng(2026)


def _rand_params(rng):
    return CVParams(
        mu=float(rng.uniform(10, 2000)),
        nu=float(rng.uniform(-50, 50)),
        lambda1=float(rng.uniform(0.3, 3.0)),
        lambda2=float(rng.uniform(0.3, 3.0)),
        dt=float(rng.uniform(0.1, 2.0)),
        eps=float(rng.uniform(0.3, 3.0)),
        eta2=float(10.0 ** rng.uniform(-12, -4)),
    )


@pytest.mark.parametrize("trial", range(6))
def test_fused_kernel_matches_jnp_random(trial):
    """Random shapes x random params: kernel (interpret) == jnp red-black."""
    rng = np.random.default_rng(100 + trial)
    h = 8 * int(rng.integers(3, 16))
    w = 128 * int(rng.integers(1, 4))
    p = _rand_params(rng)
    u0 = jnp.asarray(rng.uniform(0, 255, (h, w)), jnp.float32)
    phi = jnp.asarray(rng.standard_normal((h, w)) * rng.uniform(0.5, 50),
                      jnp.float32)
    c1, c2 = region_means(u0, phi, p.eps)
    got, parts = pallas_sweep.fused_iteration(phi, u0, c1, c2, p,
                                              interpret=True)
    from chan_vese_tpu.ops.reductions import data_term
    f = data_term(u0, c1, c2, p.nu, p.lambda1, p.lambda2)
    want = sweep.redblack_step(phi, f, p)
    scale = float(jnp.max(jnp.abs(want))) + 1.0
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=2e-5 * scale,
                               err_msg=f"shape=({h},{w}) p={p}")


@pytest.mark.parametrize("trial", range(4))
def test_wavefront_equals_raster_random(trial):
    """Random small grids x random params: wavefront == raster GS (f64)."""
    rng = np.random.default_rng(200 + trial)
    h, w = int(rng.integers(3, 20)), int(rng.integers(3, 20))
    p = _rand_params(rng)
    phi = rng.standard_normal((h, w)) * rng.uniform(0.5, 100)
    f = rng.standard_normal((h, w)) * rng.uniform(1, 1e4)
    got = np.asarray(sweep.wavefront_step(
        jnp.asarray(phi, jnp.float64), jnp.asarray(f, jnp.float64), p))
    want = sweep_np.raster_sweep(phi.astype(np.float64).copy(),
                                 f.astype(np.float64), p.mu, p.dt, p.eps,
                                 p.eta2)
    np.testing.assert_allclose(got, want, rtol=1e-11, atol=1e-11)


@pytest.mark.parametrize("trial", range(4))
def test_redblack_jnp_equals_numpy_random(trial):
    rng = np.random.default_rng(300 + trial)
    h, w = int(rng.integers(3, 18)), int(rng.integers(3, 18))
    p = _rand_params(rng)
    phi = rng.standard_normal((h, w)) * rng.uniform(0.5, 100)
    f = rng.standard_normal((h, w)) * rng.uniform(1, 1e4)
    got = np.asarray(sweep.redblack_step(
        jnp.asarray(phi, jnp.float64), jnp.asarray(f, jnp.float64), p))
    want = sweep_np.redblack_sweep(phi.astype(np.float64),
                                   f.astype(np.float64), p.mu, p.dt,
                                   p.eps, p.eta2)
    np.testing.assert_allclose(got, want, rtol=1e-11, atol=1e-11)


@pytest.mark.parametrize("trial", range(3))
def test_c_baseline_matches_numpy_random(trial):
    from native import baseline

    rng = np.random.default_rng(400 + trial)
    h, w = int(rng.integers(4, 24)), int(rng.integers(4, 24))
    p = _rand_params(rng)
    phi = rng.standard_normal((h, w)) * rng.uniform(0.5, 100)
    f = rng.standard_normal((h, w)) * rng.uniform(1, 1e4)
    got = baseline.sweep(phi, f, p.mu, p.dt, p.eps, p.eta2)
    want = sweep_np.raster_sweep(phi.copy(), f, p.mu, p.dt, p.eps, p.eta2)
    np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-12)


@pytest.mark.parametrize("trial", range(5))
def test_banded_kernel_matches_frozen_means_random(trial):
    """Random shapes x params x k x unroll: banded chunk (interpret) ==
    jnp frozen-means reference."""
    from chan_vese_tpu.ops import pallas_banded
    from chan_vese_tpu.ops.reductions import data_term

    rng = np.random.default_rng(300 + trial)
    k = int(rng.integers(1, 6))
    unroll = int(rng.choice([u for u in (1, 2, 3, 4) if k % u == 0]))
    up, dn = pallas_banded._halos(k)
    h = 8 * int(rng.integers((up + dn) // 8 + 1, 20))
    w = 128 * int(rng.integers(1, 4))
    p = _rand_params(rng)
    u0 = jnp.asarray(rng.uniform(0, 255, (h, w)), jnp.float32)
    phi = jnp.asarray(rng.standard_normal((h, w)) * rng.uniform(0.5, 20),
                      jnp.float32)
    c1, c2 = region_means(u0, phi, p.eps)
    if not pallas_banded.supports_banded(h, w, k):
        pytest.skip(f"unsupported ({h},{w}) k={k}")
    got, parts = pallas_banded.banded_chunk(phi, u0, c1, c2, p, k,
                                            unroll=unroll, interpret=True)
    f = data_term(u0, c1, c2, p.nu, p.lambda1, p.lambda2)
    want = phi
    for _ in range(k):
        want = sweep.redblack_step(want, f, p)
    scale = float(jnp.max(jnp.abs(want))) + 1.0
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4 * scale,
                               err_msg=f"shape=({h},{w}) k={k} u={unroll}")


@pytest.mark.parametrize("trial", range(4))
def test_mp2_kernel_matches_multiphase_step_random(trial):
    """Random shapes x params: fused 4-phase iteration (interpret) ==
    multiphase_step."""
    from chan_vese_tpu.models import multiphase as mp
    from chan_vese_tpu.ops import pallas_multiphase as pmp

    rng = np.random.default_rng(400 + trial)
    h = 8 * int(rng.integers(4, 14))
    w = 128 * int(rng.integers(1, 3))
    p = _rand_params(rng)
    u0 = jnp.asarray(rng.uniform(0, 255, (h, w)), jnp.float32)
    phis = jnp.asarray(rng.standard_normal((2, h, w))
                       * rng.uniform(0.5, 10), jnp.float32)
    cs = jnp.stack(mp.phase_means(u0, phis, p.eps))
    got, _ = pmp.mp2_iteration(phis, u0, cs, p, interpret=True)
    want, _ = mp.multiphase_step(phis, u0, p)
    scale = float(jnp.max(jnp.abs(want))) + 1.0
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=2e-4 * scale,
                               err_msg=f"shape=({h},{w}) p={p}")


@pytest.mark.parametrize("trial", range(3))
def test_resident_mc_matches_jnp_random(trial):
    """Random RGB shapes/params: one mc resident iteration (interpret) ==
    the jnp vector step."""
    from chan_vese_tpu.ops import pallas_resident
    from chan_vese_tpu.ops.reductions import data_term

    rng = np.random.default_rng(500 + trial)
    h = 8 * int(rng.integers(2, 8))
    w = 128 * int(rng.integers(1, 3))
    c = int(rng.integers(1, 4))
    p = _rand_params(rng)
    u0 = jnp.asarray(rng.uniform(0, 255, (h, w, c)), jnp.float32)
    phi = jnp.asarray(rng.standard_normal((h, w)) * rng.uniform(0.5, 10),
                      jnp.float32)
    ucf = jnp.transpose(u0, (2, 0, 1))
    got, _ = pallas_resident.resident_iterations_mc(phi, ucf, p, 1,
                                                    interpret=True)
    c1, c2 = region_means(u0, phi, p.eps)
    l1, l2 = p.channel_lambdas(c)
    f = data_term(u0, c1, c2, p.nu, jnp.asarray(l1), jnp.asarray(l2))
    want = sweep.redblack_step(phi, f, p)
    scale = float(jnp.max(jnp.abs(want))) + 1.0
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=2e-4 * scale,
                               err_msg=f"shape=({h},{w},{c}) p={p}")


@pytest.mark.parametrize("trial", range(4))
def test_banded_fusej_matches_unfused_random(trial):
    """Random shapes x params x k x unroll: fuse=True (in-kernel j
    fori_loop) is bitwise the SAME program as the j-grid kernel. Fuzzed
    (round 4) because fused-j is the queued auto-default candidate -
    the fixed tests pin only two geometries."""
    from chan_vese_tpu.ops import pallas_banded

    rng = np.random.default_rng(600 + trial)
    k = int(rng.integers(1, 6))
    unroll = int(rng.choice([u for u in (1, 2, 4) if k % u == 0]))
    up, dn = pallas_banded._halos(k)
    h = 8 * int(rng.integers((up + dn) // 8 + 1, 20))
    w = 128 * int(rng.integers(1, 4))
    if not pallas_banded.supports_banded(h, w, k):
        pytest.skip(f"unsupported ({h},{w}) k={k}")
    p = _rand_params(rng)
    u0 = jnp.asarray(rng.uniform(0, 255, (h, w)), jnp.float32)
    phi = jnp.asarray(rng.standard_normal((h, w)) * rng.uniform(0.5, 20),
                      jnp.float32)
    c1, c2 = region_means(u0, phi, p.eps)
    a, pa = pallas_banded.banded_chunk(phi, u0, c1, c2, p, k,
                                       unroll=unroll, interpret=True)
    b, pb = pallas_banded.banded_chunk(phi, u0, c1, c2, p, k,
                                       unroll=unroll, fuse=True,
                                       interpret=True)
    assert np.array_equal(np.asarray(a), np.asarray(b)), \
        f"shape=({h},{w}) k={k} u={unroll}"
    np.testing.assert_allclose(np.asarray(pa), np.asarray(pb),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("trial", range(4))
def test_packed_banded_matches_flat_random(trial):
    """Random packed-eligible shapes x params x k: the parity-plane
    kernel (with and without fused-j) matches the flat banded kernel on
    the same chunk (same trajectory class at FMA-contraction level)."""
    from chan_vese_tpu.ops import pallas_banded, pallas_packed

    rng = np.random.default_rng(700 + trial)
    k = int(rng.integers(1, 6))
    h = 16 * int(rng.integers(3, 14))
    w = 256 * int(rng.integers(1, 3))
    if not (pallas_packed.supports_packed_banded(h, w, k)
            and pallas_banded.supports_banded(h, w, k)):
        pytest.skip(f"unsupported ({h},{w}) k={k}")
    p = _rand_params(rng)
    u0 = jnp.asarray(rng.uniform(0, 255, (h, w)), jnp.float32)
    phi = jnp.asarray(rng.standard_normal((h, w)) * rng.uniform(0.5, 20),
                      jnp.float32)
    c1, c2 = region_means(u0, phi, p.eps)
    want, _ = pallas_banded.banded_chunk(phi, u0, c1, c2, p, k,
                                         interpret=True)
    scale = float(jnp.max(jnp.abs(want))) + 1.0
    for fuse in (False, True):
        got, _ = pallas_packed.packed_banded_chunk(
            pallas_packed._pack(phi), pallas_packed._pack(u0), c1, c2,
            p, k, fuse=fuse, interpret=True)
        np.testing.assert_allclose(
            np.asarray(pallas_packed._unpack(got)), np.asarray(want),
            rtol=1e-4, atol=1e-4 * scale,
            err_msg=f"shape=({h},{w}) k={k} fuse={fuse}")
