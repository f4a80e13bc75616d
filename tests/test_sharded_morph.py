"""Communication-avoiding sharded morph/GAC (parallel/sharded_morph.py)
and the kernel-routed tolerance-mode drivers (models/morph.py,
models/morph_gac.py chunked paths).

Equivalence discipline: the state is binary {0,1}, so the GAC chunked
paths are BITWISE the per-iteration trajectory (no reductions in the
loop body); ACWE comm_k=1 is bitwise the published per-iteration-means
scheme; ACWE comm_k>1 is the frozen-means-per-chunk trajectory class
(identical to the banded kernel's), pinned here against the kernel
drivers in interpret mode.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from chan_vese_tpu.models.morph import (segment_morph, segment_morph_fixed,
                                        segment_morph_iterations)
from chan_vese_tpu.models.morph_gac import (segment_gac, segment_gac_fixed,
                                            segment_gac_iterations)
from chan_vese_tpu.ops.morph import inverse_gaussian_gradient
from chan_vese_tpu.parallel.mesh import make_grid_mesh
from chan_vese_tpu.parallel.sharded_morph import (
    segment_gac_sharded_chunked, segment_morph_sharded_chunked)
from chan_vese_tpu.params import CVParams


def _disk_image(H=96, W=128, r=30, noise=5.0, seed=0):
    rng = np.random.default_rng(seed)
    img = np.zeros((H, W))
    yy, xx = np.mgrid[:H, :W]
    img[(yy - H // 2) ** 2 + (xx - W // 2) ** 2 < r ** 2] = 200.0
    img += rng.normal(0, noise, img.shape)
    return jnp.asarray(img)


def _edge_disk(H=96, W=128):
    """Disk overlapping the image boundary: exercises the global-edge
    pad refresh (the contour crosses shard AND image edges)."""
    img = np.zeros((H, W))
    yy, xx = np.mgrid[:H, :W]
    img[(yy - 8) ** 2 + (xx - 10) ** 2 < 40 ** 2] = 200.0
    return jnp.asarray(img + 0.1 * np.arange(W)[None, :])


# --------------------------------------------------------------------------
# comm_k sharded GAC: bitwise for any comm_k
# --------------------------------------------------------------------------

@pytest.mark.parametrize("comm_k,balloon", [(4, 1), (8, -1), (3, 1),
                                            (5, 0)])
def test_gac_sharded_chunked_bitwise(comm_k, balloon):
    u = _disk_image()
    g = inverse_gaussian_gradient(u, alpha=5.0, sigma=3.0)
    mesh = make_grid_mesh(2, 4)
    p = CVParams(max_iter=37, tol=0.0)  # tol=0: run the exact cap
    got = segment_gac_sharded_chunked(g, p, mesh=mesh, smoothing=1,
                                      balloon=balloon, threshold=0.3,
                                      comm_k=comm_k)
    want = segment_gac_fixed(g, p, iters=37, smoothing=1,
                             balloon=balloon, threshold=0.3)
    assert int(got.iters) == 37
    np.testing.assert_array_equal(np.asarray(got.ls), np.asarray(want.ls))


def test_gac_sharded_chunked_edge_disk_bitwise():
    """Contour crossing image edges: the per-iteration global-pad
    refresh must reproduce clamped-shift semantics exactly."""
    u = _edge_disk()
    g = inverse_gaussian_gradient(u, alpha=5.0, sigma=2.0)
    mesh = make_grid_mesh(2, 4)
    p = CVParams(max_iter=24, tol=0.0)
    got = segment_gac_sharded_chunked(g, p, mesh=mesh, smoothing=1,
                                      balloon=1, threshold=0.3, comm_k=6)
    want = segment_gac_fixed(g, p, iters=24, smoothing=1, balloon=1,
                             threshold=0.3)
    np.testing.assert_array_equal(np.asarray(got.ls), np.asarray(want.ls))


def test_gac_sharded_chunked_tolerance_stops_early():
    u = _disk_image(noise=0.0)
    g = inverse_gaussian_gradient(u, alpha=5.0, sigma=3.0)
    mesh = make_grid_mesh(2, 2)
    p = CVParams(max_iter=400, tol=1e-4, patience=4, min_iter=8)
    res = segment_gac_sharded_chunked(g, p, mesh=mesh, smoothing=1,
                                      balloon=1, threshold=0.3, comm_k=4)
    assert int(res.iters) < 400
    assert float(res.delta) < 1e-4


# --------------------------------------------------------------------------
# comm_k sharded ACWE
# --------------------------------------------------------------------------

def test_morph_sharded_chunked_k1_bitwise():
    """comm_k=1 == the published per-iteration-means scheme bitwise."""
    u = _disk_image()
    mesh = make_grid_mesh(2, 4)
    p = CVParams(max_iter=40, tol=0.0)
    got = segment_morph_sharded_chunked(u, p, mesh=mesh, smoothing=1,
                                        comm_k=1)
    want = segment_morph_fixed(u, p, iters=40, smoothing=1)
    np.testing.assert_array_equal(np.asarray(got.ls), np.asarray(want.ls))


def test_morph_sharded_chunked_matches_kernel_trajectory():
    """comm_k=4 sharded == the banded kernel's frozen-means trajectory
    (segment_morph_iterations k=4, interpret) on the same seeded image:
    the same chunk algebra through two completely different codepaths
    (shard_map + halo exchange vs banded DMA pipeline)."""
    u = _disk_image(seed=3)
    mesh = make_grid_mesh(2, 4)
    p = CVParams(max_iter=32, tol=0.0)
    got = segment_morph_sharded_chunked(u, p, mesh=mesh, smoothing=1,
                                        comm_k=4)
    want = segment_morph_iterations(u, p, iters=32, smoothing=1,
                                    use_pallas=True, k=4, interpret=True)
    np.testing.assert_array_equal(np.asarray(got.ls), np.asarray(want.ls))


def test_morph_sharded_chunked_rgb():
    """(H, W, C) with per-channel lambdas: frozen-means chunks vs the
    per-iteration GSPMD driver's converged mask."""
    rng = np.random.default_rng(5)
    H, W = 96, 128
    img = np.zeros((H, W, 3))
    yy, xx = np.mgrid[:H, :W]
    disk = (yy - 48) ** 2 + (xx - 64) ** 2 < 28 ** 2
    img[disk] = (180.0, 120.0, 60.0)
    img += rng.normal(0, 4, img.shape)
    u = jnp.asarray(img)
    mesh = make_grid_mesh(2, 2)
    p = CVParams(max_iter=40, tol=0.0)
    got = segment_morph_sharded_chunked(u, p, mesh=mesh, smoothing=1,
                                        comm_k=4,
                                        lambda1=(1.0, 1.0, 2.0),
                                        lambda2=(1.0, 1.0, 1.0))
    want = segment_morph_fixed(u, p, iters=40, smoothing=1,
                               lambda1=(1.0, 1.0, 2.0),
                               lambda2=(1.0, 1.0, 1.0))
    inter = jnp.sum(got.mask & want.mask)
    union = jnp.sum(got.mask | want.mask)
    assert float(inter / union) > 0.99


def test_morph_sharded_chunked_nan_aborts():
    u = _disk_image().at[10, 10].set(jnp.nan)
    mesh = make_grid_mesh(2, 2)
    p = CVParams(max_iter=100, tol=1e-4, patience=3)
    res = segment_morph_sharded_chunked(u, p, mesh=mesh, comm_k=4)
    assert int(res.iters) <= 8  # aborted after the first divergent check
    assert not bool(jnp.isfinite(res.delta))


def test_chunked_rejects_bad_geometry():
    u = _disk_image(96, 128)
    mesh = make_grid_mesh(2, 4)
    with pytest.raises(ValueError, match="halo depth"):
        # reach 3 * comm_k 16 = 48 > local 96/2 = 48? no - cols: 128/4=32
        segment_morph_sharded_chunked(u, CVParams(), mesh=mesh, comm_k=16)
    with pytest.raises(ValueError, match="divisible"):
        segment_morph_sharded_chunked(u[:95], CVParams(), mesh=mesh,
                                      comm_k=2)


# --------------------------------------------------------------------------
# kernel-routed tolerance-mode drivers (single device, interpret)
# --------------------------------------------------------------------------

def test_segment_morph_kernel_route_tolerance():
    """segment_morph(use_pallas=True) = chunk-granular tolerance through
    the banded kernel: same converged mask as the jnp path, iterations
    agree to one chunk, max_iter exactly capped."""
    u = _disk_image()
    p = CVParams(max_iter=100, tol=1e-4, patience=4, min_iter=8)
    ref = segment_morph(u, p, smoothing=1, use_pallas=False)
    got = segment_morph(u, p, smoothing=1, use_pallas=True, k=4,
                        interpret=True)
    np.testing.assert_array_equal(np.asarray(got.mask),
                                  np.asarray(ref.mask))
    # chunk-granular stopping: conservative, within one chunk grid
    assert int(got.iters) % 4 == 0 or int(got.iters) == p.max_iter
    # exact cap when tol unreachable
    p0 = CVParams(max_iter=33, tol=0.0)
    got0 = segment_morph(u, p0, smoothing=1, use_pallas=True, k=4,
                         interpret=True)
    assert int(got0.iters) == 33


def test_segment_gac_kernel_route_tolerance():
    u = _disk_image(noise=0.0)
    g = inverse_gaussian_gradient(u, alpha=5.0, sigma=3.0)
    p = CVParams(max_iter=200, tol=1e-4, patience=4, min_iter=8)
    ref = segment_gac(g, p, smoothing=1, balloon=1, threshold=0.3,
                      use_pallas=False)
    got = segment_gac(g, p, smoothing=1, balloon=1, threshold=0.3,
                      use_pallas=True, k=4, interpret=True)
    np.testing.assert_array_equal(np.asarray(got.mask),
                                  np.asarray(ref.mask))
    # trajectory-exact chunks: at the same iteration count the states
    # are bitwise equal (run both to a fixed cap)
    p0 = CVParams(max_iter=36, tol=0.0)
    a = segment_gac(g, p0, smoothing=1, balloon=1, threshold=0.3,
                    use_pallas=True, k=4, interpret=True)
    b = segment_gac_fixed(g, p0, iters=36, smoothing=1, balloon=1,
                          threshold=0.3)
    np.testing.assert_array_equal(np.asarray(a.ls), np.asarray(b.ls))


def test_segment_morph_kernel_route_nan_aborts():
    u = _disk_image().at[5, 5].set(jnp.nan)
    p = CVParams(max_iter=100, tol=1e-4, patience=3)
    res = segment_morph(u, p, use_pallas=True, k=4, interpret=True)
    assert not bool(jnp.isfinite(res.delta))
    assert int(res.iters) <= 8


def test_sharded_wrappers_pin_jnp_route():
    """The GSPMD wrappers must force use_pallas=False (a pallas_call is
    not partitionable); smoke-run on a mesh to prove no kernel routing
    sneaks in when geometry would support it."""
    u = _disk_image()
    mesh = make_grid_mesh(2, 2)
    from chan_vese_tpu.models.morph import segment_morph_sharded
    res = segment_morph_sharded(u, CVParams(max_iter=30), mesh=mesh)
    ref = segment_morph(u, CVParams(max_iter=30), use_pallas=False)
    np.testing.assert_array_equal(np.asarray(res.ls), np.asarray(ref.ls))


def test_cli_morph_comm_k(tmp_path):
    """--morph/--morph-gac + --mesh + --comm-k routes the chunked
    communication-avoiding drivers (masks match the comm_k=1 path)."""
    from chan_vese_tpu.cli import main
    from chan_vese_tpu.utils import image_io

    u = np.asarray(_disk_image(noise=3.0))
    src = tmp_path / "in.npy"
    np.save(src, u.astype(np.float32))
    out1 = tmp_path / "m1.png"
    outk = tmp_path / "mk.png"
    base = [str(src), "--morph", "--init", "checkerboard", "--f64",
            "--quiet", "--mesh", "2", "4"]
    assert main(base + ["-o", str(out1)]) == 0
    assert main(base + ["-o", str(outk), "--comm-k", "4"]) == 0
    m1 = image_io.load_image(str(out1)) > 127
    mk = image_io.load_image(str(outk)) > 127
    assert float(np.sum(m1 & mk) / np.sum(m1 | mk)) > 0.99

    outg = tmp_path / "g.png"
    rc = main([str(src), "--morph-gac", "--balloon", "1", "--init",
               "small-disk", "--gac-alpha", "5", "--gac-sigma", "2",
               "--gac-threshold", "0.3", "--mesh", "2", "4",
               "--comm-k", "4", "-o", str(outg), "--f64", "--quiet"])
    assert rc == 0
    mg = image_io.load_image(str(outg)) > 127
    assert mg.any() and not mg.all()


# --------------------------------------------------------------------------
# kernel-per-shard chunks (banded kernel on the padded local block)
# --------------------------------------------------------------------------

def test_morph_kernel_per_shard_bitwise():
    """use_pallas=True chunks == the jnp chunk body bitwise (the
    in-kernel depth-1 rim refresh must reproduce the jnp path's
    full-depth per-op refresh exactly on owned cells), across a
    geometry needing BOTH row and column alignment pads."""
    u = _disk_image(H=96, W=160 + 96)  # w_loc=64 -> rc=128-alignment pad
    mesh = make_grid_mesh(2, 4)
    p = CVParams(max_iter=12, tol=0.0)
    a = segment_morph_sharded_chunked(u, p, mesh=mesh, comm_k=4,
                                      use_pallas=False)
    b = segment_morph_sharded_chunked(u, p, mesh=mesh, comm_k=4,
                                      use_pallas=True, interpret=True)
    np.testing.assert_array_equal(np.asarray(a.ls), np.asarray(b.ls))


def test_morph_kernel_per_shard_edge_disk_bitwise():
    """Contour crossing image edges: global-edge shards exercise the
    in-kernel rim refresh on all four sides."""
    u = _edge_disk(96, 128)
    mesh = make_grid_mesh(2, 2)
    p = CVParams(max_iter=16, tol=0.0)
    a = segment_morph_sharded_chunked(u, p, mesh=mesh, comm_k=4,
                                      use_pallas=False)
    b = segment_morph_sharded_chunked(u, p, mesh=mesh, comm_k=4,
                                      use_pallas=True, interpret=True)
    np.testing.assert_array_equal(np.asarray(a.ls), np.asarray(b.ls))


def test_gac_kernel_per_shard_bitwise_vs_unsharded():
    """GAC kernel-per-shard chunks == the UNSHARDED per-iteration
    trajectory bitwise (trajectory-exact chunks x bitwise kernel x
    bitwise rim refresh, composed)."""
    u = _disk_image()
    g = inverse_gaussian_gradient(u, alpha=5.0, sigma=3.0)
    mesh = make_grid_mesh(2, 4)
    p = CVParams(max_iter=12, tol=0.0)
    got = segment_gac_sharded_chunked(g, p, mesh=mesh, smoothing=1,
                                      balloon=1, threshold=0.3,
                                      comm_k=4, use_pallas=True,
                                      interpret=True)
    want = segment_gac_fixed(g, p, iters=12, smoothing=1, balloon=1,
                             threshold=0.3)
    np.testing.assert_array_equal(np.asarray(got.ls), np.asarray(want.ls))


def test_kernel_per_shard_remainder_mixes_bitwise():
    """max_iter % comm_k != 0: full chunks on the kernel, remainder on
    the jnp body - the mixed run must equal the all-jnp run bitwise."""
    u = _disk_image()
    g = inverse_gaussian_gradient(u, alpha=5.0, sigma=3.0)
    mesh = make_grid_mesh(2, 2)
    p = CVParams(max_iter=11, tol=0.0)  # 2 full k=4 chunks + rem 3
    a = segment_gac_sharded_chunked(g, p, mesh=mesh, balloon=1,
                                    threshold=0.3, comm_k=4,
                                    use_pallas=False)
    b = segment_gac_sharded_chunked(g, p, mesh=mesh, balloon=1,
                                    threshold=0.3, comm_k=4,
                                    use_pallas=True, interpret=True)
    np.testing.assert_array_equal(np.asarray(a.ls), np.asarray(b.ls))


def test_kernel_per_shard_route_rejects_unsupported():
    u = _disk_image(96, 128)
    mesh = make_grid_mesh(2, 4)
    with pytest.raises(ValueError, match="kernel-per-shard"):
        # odd comm_k*smoothing breaks the static in-kernel parity
        segment_morph_sharded_chunked(u, CVParams(max_iter=6, tol=0.0),
                                      mesh=mesh, comm_k=3,
                                      use_pallas=True, interpret=True)


@pytest.mark.tpu
def test_kernel_per_shard_tpu_compiled_bitwise():
    """Compiled kernel-per-shard chunks on the real chip (1x1 mesh) ==
    the jnp chunk body bitwise."""
    if jax.default_backend() != "tpu":
        pytest.skip("needs the real chip")
    rng = np.random.default_rng(30)
    H, W = 512, 640
    yy, xx = np.mgrid[:H, :W]
    img = np.where((yy - 256) ** 2 + (xx - 320) ** 2 < 150 ** 2,
                   200.0, 0.0) + rng.normal(0, 5, (H, W))
    u = jnp.asarray(img, jnp.float32)
    mesh = make_grid_mesh(1, 1)
    p = CVParams(max_iter=16, tol=0.0)
    a = segment_morph_sharded_chunked(u, p, mesh=mesh, comm_k=8,
                                      use_pallas=False)
    b = segment_morph_sharded_chunked(u, p, mesh=mesh, comm_k=8,
                                      use_pallas=True)
    np.testing.assert_array_equal(np.asarray(a.ls), np.asarray(b.ls))
    g = inverse_gaussian_gradient(u, alpha=5.0, sigma=2.0)
    ga = segment_gac_sharded_chunked(g, p, mesh=mesh, balloon=1,
                                     threshold=0.3, comm_k=8,
                                     use_pallas=False)
    gb = segment_gac_sharded_chunked(g, p, mesh=mesh, balloon=1,
                                     threshold=0.3, comm_k=8,
                                     use_pallas=True)
    np.testing.assert_array_equal(np.asarray(ga.ls), np.asarray(gb.ls))
