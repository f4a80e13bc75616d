"""Banded morphological Pallas kernel tests (ops/pallas_morph.py).

All equivalences here are EXACT (bitwise): the state is binary {0,1}
floats and every kernel operation is min/max/select on values the jnp
path computes identically. Interpret mode runs the real kernel logic on
CPU; the compiled-on-chip twin is tests/test_pallas_morph.py::*_tpu.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from chan_vese_tpu.models.morph import (segment_morph_fixed,
                                        segment_morph_iterations)
from chan_vese_tpu.models.morph_gac import (segment_gac_fixed,
                                            segment_gac_iterations)
from chan_vese_tpu.ops.morph import binary_means
from chan_vese_tpu.ops.pallas_morph import (band_rows_morph, gac_chunk,
                                            morph_chunk,
                                            supports_morph_banded)
from chan_vese_tpu.params import CVParams


def _rand(shape, seed=0, lo=0.0, hi=1.0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.uniform(lo, hi, shape))


def _rand_ls(shape, seed=1):
    rng = np.random.default_rng(seed)
    return jnp.asarray((rng.uniform(size=shape) > 0.5).astype(np.float64))


# --------------------------------------------------------------------------
# GAC: trajectory-exact for ANY k (no reductions in the loop body)
# --------------------------------------------------------------------------

@pytest.mark.parametrize("k,smoothing,balloon", [(4, 1, 1), (8, 1, -1),
                                                 (2, 2, 0), (6, 0, 1)])
def test_gac_chunk_bitwise_vs_jnp(k, smoothing, balloon):
    H, W = 128, 128  # k=8 gac needs 32-row halos both sides
    g = _rand((H, W), 3, lo=0.05)
    ls0 = _rand_ls((H, W), 4)
    want = segment_gac_fixed(g, CVParams(), iters=k, ls0=ls0,
                             smoothing=smoothing, balloon=balloon,
                             threshold=0.4)
    got = gac_chunk(ls0, g, k=k, smoothing=smoothing, parity0=0,
                    balloon=balloon, threshold=0.4, interpret=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want.ls))


def test_gac_chunk_multiband_and_parity_offset():
    """Tall image -> several bands; halo depth must keep every band's
    owned rows exact; nonzero start parity flips the smoothing order."""
    H, W = 256, 128
    g = _rand((H, W), 5, lo=0.05)
    ls0 = _rand_ls((H, W), 6)
    assert band_rows_morph(H, W, 8, 1, "gac") < H  # really multiband
    for parity in (0, 1):
        want = segment_gac_fixed(g, CVParams(), iters=8, ls0=ls0,
                                 balloon=1, threshold=0.4,
                                 start_iter=parity)
        got = gac_chunk(ls0, g, k=8, smoothing=1, parity0=parity,
                        balloon=1, threshold=0.4, interpret=True)
        np.testing.assert_array_equal(np.asarray(got),
                                      np.asarray(want.ls))


def test_gac_iterations_driver_kernel_route_exact():
    """The lean driver's kernel route (chunks of k + remainder) is
    bitwise the jnp trajectory - any iters, not only multiples of k."""
    H, W = 96, 128
    g = _rand((H, W), 7, lo=0.05)
    ls0 = _rand_ls((H, W), 8)
    for iters in (8, 19):
        want = segment_gac_fixed(g, CVParams(), iters=iters, ls0=ls0,
                                 balloon=1, threshold=0.35)
        got = segment_gac_iterations(g, CVParams(), iters=iters, ls0=ls0,
                                     balloon=1, threshold=0.35,
                                     use_pallas=True, interpret=True)
        np.testing.assert_array_equal(np.asarray(got.ls),
                                      np.asarray(want.ls))


# --------------------------------------------------------------------------
# ACWE: k=1 == the published per-iteration-means scheme bitwise;
# k>1 is the frozen-means-per-chunk trajectory class
# --------------------------------------------------------------------------

def test_acwe_chunk_k1_bitwise_vs_jnp():
    """k=1 chunks with per-call parity == segment_morph_fixed exactly
    (means refresh every iteration collapses the frozen-means class to
    the published scheme)."""
    H, W = 64, 128
    img = _rand((H, W), 9, hi=255.0)
    ls = ls0 = _rand_ls((H, W), 10)
    want = segment_morph_fixed(img, CVParams(), iters=5, ls0=ls0)
    for n in range(5):
        c1, c2 = binary_means(img, ls)
        f = (img - c1) ** 2 - (img - c2) ** 2
        ls = morph_chunk(ls, f, k=1, smoothing=1, parity0=n % 2,
                         interpret=True)
    np.testing.assert_array_equal(np.asarray(ls), np.asarray(want.ls))


def test_acwe_chunk_k_bitwise_vs_frozen_means_reference():
    """k=4 chunk == 4 jnp force+smooth iterations against ONE frozen
    force plane (the declared trajectory class), multiband."""
    from chan_vese_tpu.ops.morph import acwe_step, smooth

    H, W = 160, 128
    img = _rand((H, W), 11, hi=255.0)
    ls0 = _rand_ls((H, W), 12)
    c1, c2 = binary_means(img, ls0)
    f = (img - c1) ** 2 - (img - c2) ** 2

    # jnp frozen-force reference: the force SIGN field is f, means
    # never refresh inside the chunk
    ls = ls0
    one, zero = jnp.ones(()), jnp.zeros(())
    for n in range(4):
        from chan_vese_tpu.ops.numerics import (shift_down, shift_left,
                                                shift_right, shift_up)
        gx = shift_down(ls) - shift_up(ls)
        gy = shift_right(ls) - shift_left(ls)
        aux = (jnp.abs(gx) + jnp.abs(gy)) * f
        ls = jnp.where(aux < 0, one, jnp.where(aux > 0, zero, ls))
        ls = smooth(ls, n, 1)
    got = morph_chunk(ls0, f, k=4, smoothing=1, parity0=0,
                      interpret=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ls))


def test_acwe_iterations_driver_kernel_route_quality():
    """The frozen-means kernel route converges to the same MASK as the
    per-iteration jnp driver on a clean synthetic (same fixed point,
    different trajectory - the banded PDE precedent)."""
    import sys
    sys.path.insert(0, "tests") if "tests" not in sys.path[0] else None
    from fixtures import two_disks, iou

    img, gt = two_disks(128, 128, noise=6.0)
    jnp_res = segment_morph_iterations(jnp.asarray(img), CVParams(),
                                       iters=40, use_pallas=False)
    ker_res = segment_morph_iterations(jnp.asarray(img), CVParams(),
                                       iters=40, use_pallas=True,
                                       interpret=True)
    a = np.asarray(jnp_res.mask)
    b = np.asarray(ker_res.mask)
    assert max(iou(b, gt), iou(~b, gt)) >= 0.98
    assert (a == b).mean() >= 0.995


def test_route_rejects_unsupported():
    g = _rand((30, 100), 13)  # W % 128 != 0, H % 8 != 0
    assert not supports_morph_banded(30, 100, 8, 1, "gac")
    with pytest.raises(ValueError):
        segment_gac_iterations(g, CVParams(), iters=8, use_pallas=True,
                               interpret=True)


# --------------------------------------------------------------------------
# on-chip
# --------------------------------------------------------------------------

@pytest.mark.tpu
def test_gac_chunk_tpu_compiled_bitwise():
    """Compiled Mosaic kernel == interpret == jnp, f32 on the chip."""
    H, W = 256, 256
    g = _rand((H, W), 14, lo=0.05).astype(jnp.float32)
    ls0 = _rand_ls((H, W), 15).astype(jnp.float32)
    want = segment_gac_fixed(g, CVParams(), iters=8, ls0=ls0, balloon=1,
                             threshold=0.4)
    got = gac_chunk(ls0, g, k=8, smoothing=1, parity0=0, balloon=1,
                    threshold=0.4)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want.ls))


@pytest.mark.tpu
def test_acwe_chunk_tpu_compiled_bitwise():
    H, W = 256, 256
    img = _rand((H, W), 16, hi=255.0).astype(jnp.float32)
    ls0 = _rand_ls((H, W), 17).astype(jnp.float32)
    c1, c2 = binary_means(img, ls0)
    f = ((img - c1) ** 2 - (img - c2) ** 2).astype(jnp.float32)
    want = morph_chunk(ls0, f, k=8, smoothing=1, parity0=0,
                       interpret=True)
    got = morph_chunk(ls0, f, k=8, smoothing=1, parity0=0)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


@pytest.mark.parametrize("k,balloon", [(4, 1), (4, -1), (6, 0)])
def test_gac_chunk_pre_dg_bitwise(k, balloon):
    """pre_dg=True (preloaded dgx/dgy/mask 3-plane aux stack) is bitwise
    the recompute path AND the jnp trajectory."""
    H, W = 128, 128
    g = _rand((H, W), 7, lo=0.05)
    ls0 = _rand_ls((H, W), 8)
    kw = dict(k=k, smoothing=1, parity0=0, balloon=balloon,
              threshold=0.4, interpret=True)
    a = gac_chunk(ls0, g, **kw)
    b = gac_chunk(ls0, g, pre_dg=True, **kw)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    want = segment_gac_fixed(g, CVParams(), iters=k, ls0=ls0,
                             smoothing=1, balloon=balloon, threshold=0.4)
    np.testing.assert_array_equal(np.asarray(b), np.asarray(want.ls))


def test_gac_iterations_pre_dg_matches():
    """The lean driver's pre_dg route (hoisted aux stack) == default."""
    H, W = 96, 128
    g = _rand((H, W), 9, lo=0.05)
    ls0 = _rand_ls((H, W), 10)
    p = CVParams()
    a = segment_gac_iterations(g, p, iters=11, ls0=ls0, smoothing=1,
                               balloon=1, threshold=0.3, use_pallas=True,
                               k=4, interpret=True)
    b = segment_gac_iterations(g, p, iters=11, ls0=ls0, smoothing=1,
                               balloon=1, threshold=0.3, use_pallas=True,
                               k=4, interpret=True, pre_dg=True)
    np.testing.assert_array_equal(np.asarray(a.ls), np.asarray(b.ls))


@pytest.mark.tpu
def test_gac_chunk_pre_dg_tpu_compiled_bitwise():
    """Compiled pre_dg twin on the real chip == interpret."""
    import jax

    if jax.default_backend() != "tpu":
        pytest.skip("needs the real chip")
    H, W = 256, 256
    g = _rand((H, W), 11, lo=0.05).astype(jnp.float32)
    ls0 = _rand_ls((H, W), 12).astype(jnp.float32)
    kw = dict(k=4, smoothing=1, parity0=0, balloon=1, threshold=0.4,
              pre_dg=True)
    want = gac_chunk(ls0, g, interpret=True, **kw)
    got = gac_chunk(ls0, g, **kw)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_morph_chunk_fused_matches_reference():
    """morph_chunk_fused (in-kernel force + region partials) == the
    explicit-force morph_chunk trajectory bitwise (f64 interpret), and
    its partials == the jnp region sums of the final state."""
    H, W = 128, 128
    u0 = _rand((H, W), 20, lo=0.0, hi=255.0)
    ls0 = _rand_ls((H, W), 21)
    from chan_vese_tpu.ops.pallas_morph import morph_chunk_fused

    c_in, c_out = binary_means(u0, ls0)
    f = 1.0 * (u0 - c_in) ** 2 - 1.0 * (u0 - c_out) ** 2
    want = morph_chunk(ls0, f, k=4, smoothing=1, parity0=0,
                       interpret=True)
    got, parts = morph_chunk_fused(ls0, u0, c_in, c_out, 1.0, 1.0, k=4,
                                   smoothing=1, parity0=0,
                                   interpret=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
    np.testing.assert_allclose(float(parts[0]), float(jnp.sum(got)),
                               rtol=0, atol=0)
    np.testing.assert_allclose(float(parts[1]),
                               float(jnp.sum(u0 * got)), rtol=1e-12)


def test_morph_iterations_fuse_force_matches():
    """The fuse_force driver route == the explicit-force kernel route
    on masks (means differ only in sum_in reduction order)."""
    H, W = 128, 128
    u0 = _rand((H, W), 22, lo=0.0, hi=255.0)
    p = CVParams()
    a = segment_morph_iterations(u0, p, iters=19, smoothing=1,
                                 use_pallas=True, k=4, interpret=True)
    b = segment_morph_iterations(u0, p, iters=19, smoothing=1,
                                 use_pallas=True, k=4, interpret=True,
                                 fuse_force=True)
    np.testing.assert_array_equal(np.asarray(a.ls), np.asarray(b.ls))


@pytest.mark.tpu
def test_morph_chunk_fused_tpu_compiled():
    import jax

    if jax.default_backend() != "tpu":
        pytest.skip("needs the real chip")
    H, W = 256, 256
    u0 = _rand((H, W), 23, lo=0.0, hi=255.0).astype(jnp.float32)
    ls0 = _rand_ls((H, W), 24).astype(jnp.float32)
    from chan_vese_tpu.ops.pallas_morph import morph_chunk_fused

    c_in, c_out = binary_means(u0, ls0)
    kw = dict(k=4, smoothing=1, parity0=0)
    want, wparts = morph_chunk_fused(ls0, u0, c_in, c_out, 1.0, 1.0,
                                     interpret=True, **kw)
    got, gparts = morph_chunk_fused(ls0, u0, c_in, c_out, 1.0, 1.0, **kw)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
    np.testing.assert_allclose(np.asarray(gparts), np.asarray(wparts),
                               rtol=1e-6)
