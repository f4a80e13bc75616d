"""Halo-comm / interior-compute overlap tests (parallel/sharded.py
_overlap_new; SURVEY.md §2.9 PP-analog row)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from chan_vese_tpu.params import CVParams
from chan_vese_tpu.parallel import mesh as meshmod
from chan_vese_tpu.parallel.sharded import segment_sharded
from fixtures import two_disks

F32 = jnp.float32


@pytest.fixture(scope="module")
def grid_mesh():
    if jax.device_count() < 8:
        pytest.skip("needs 8 (fake) devices")
    return meshmod.make_grid_mesh(2, 4)


def test_overlap_single_iteration_bitwise(grid_mesh):
    """ONE overlapped iteration == exchange-then-sweep, bitwise: the
    stitched rim strips and the interior compute reproduce the padded
    sweep exactly (same elementwise ops on the same values)."""
    img, _ = two_disks(48, 96, noise=6.0)  # 24x24 shards on the 2x4 mesh
    u0 = jnp.asarray(img, F32)
    p = CVParams(max_iter=1, tol=-1.0, min_iter=0)
    res_std = segment_sharded(u0, p, grid_mesh, fixed=True, max_iter=1,
                              use_pallas=False)
    res_ovl = segment_sharded(u0, p, grid_mesh, fixed=True, max_iter=1,
                              use_pallas=False, halo="overlap")
    np.testing.assert_array_equal(np.asarray(res_std.phi),
                                  np.asarray(res_ovl.phi))


def test_overlap_equals_standard_end_to_end(grid_mesh):
    """Multi-iteration agreement is ulp-class, not bitwise: the psum'd
    partials fuse differently in the two compiled programs, so c1/c2
    (and hence phi) drift at f32 reduction-order level from iteration 2
    on - the same equivalence class models/resident.py documents."""
    img, _ = two_disks(48, 96, noise=6.0)
    u0 = jnp.asarray(img, F32)
    p = CVParams(max_iter=15, tol=-1.0, min_iter=0)
    res_std = segment_sharded(u0, p, grid_mesh, fixed=True, max_iter=15,
                              use_pallas=False)
    res_ovl = segment_sharded(u0, p, grid_mesh, fixed=True, max_iter=15,
                              use_pallas=False, halo="overlap")
    np.testing.assert_allclose(np.asarray(res_std.phi),
                               np.asarray(res_ovl.phi),
                               rtol=1e-3, atol=5e-2)
    np.testing.assert_array_equal(np.asarray(res_std.mask),
                                  np.asarray(res_ovl.mask))


def test_overlap_tolerance_mode(grid_mesh):
    img, gt = two_disks(48, 96, noise=6.0)
    u0 = jnp.asarray(img, F32)
    p = CVParams(tol=1e-4, max_iter=200, min_iter=5)
    res = segment_sharded(u0, p, grid_mesh, use_pallas=False,
                          halo="overlap")
    from fixtures import iou
    assert iou(np.asarray(res.mask), gt) > 0.98
    assert int(res.iters) < 200


def test_overlap_validation(grid_mesh):
    # shards below 16x16 are rejected (16-deep strips would wrap)
    u_small = jnp.zeros((16, 32), F32)  # 8x8 shards
    with pytest.raises(ValueError, match="16x16"):
        segment_sharded(u_small, CVParams(), grid_mesh, halo="overlap",
                        use_pallas=False)


def test_overlap_pallas_interior_matches_standard_pallas(grid_mesh):
    """Overlap x Pallas (VERDICT r2 item 4): one iteration's INTERIOR
    (rim excluded: 4 up/left, 2 down/right per shard) is bitwise the
    standard per-shard-kernel path; the rim is bitwise the standard JNP
    path's rim (the stitch strips are the same code)."""
    img, _ = two_disks(48, 96, noise=6.0)  # 24x24 shards on the 2x4 mesh
    u0 = jnp.asarray(img, F32)
    p = CVParams(max_iter=1, tol=-1.0, min_iter=0)
    ovl = segment_sharded(u0, p, grid_mesh, fixed=True, max_iter=1,
                          use_pallas=True, interpret=True, halo="overlap")
    std_k = segment_sharded(u0, p, grid_mesh, fixed=True, max_iter=1,
                            use_pallas=True, interpret=True)
    std_j = segment_sharded(u0, p, grid_mesh, fixed=True, max_iter=1,
                            use_pallas=False)
    a = np.asarray(ovl.phi)
    k = np.asarray(std_k.phi)
    j = np.asarray(std_j.phi)
    h, w = 24, 24
    rim = np.zeros_like(a, dtype=bool)
    for bi in range(2):
        for bj in range(4):
            r0, c0 = bi * h, bj * w
            rim[r0: r0 + 4, c0: c0 + w] = True
            rim[r0 + h - 2: r0 + h, c0: c0 + w] = True
            rim[r0: r0 + h, c0: c0 + 4] = True
            rim[r0: r0 + h, c0 + w - 2: c0 + w] = True
    np.testing.assert_array_equal(a[~rim], k[~rim])
    np.testing.assert_array_equal(a[rim], j[rim])


def test_overlap_pallas_end_to_end(grid_mesh):
    """Multi-iteration overlap x Pallas stays in the shared trajectory
    class (masks equal vs both parents)."""
    img, gt = two_disks(48, 96, noise=6.0)
    u0 = jnp.asarray(img, F32)
    p = CVParams(max_iter=15, tol=-1.0, min_iter=0)
    ovl = segment_sharded(u0, p, grid_mesh, fixed=True, max_iter=15,
                          use_pallas=True, interpret=True, halo="overlap")
    std = segment_sharded(u0, p, grid_mesh, fixed=True, max_iter=15,
                          use_pallas=False)
    np.testing.assert_array_equal(np.asarray(ovl.mask),
                                  np.asarray(std.mask))
    np.testing.assert_allclose(np.asarray(ovl.phi), np.asarray(std.phi),
                               rtol=1e-3, atol=5e-2)


def test_overlap_commk_single_chunk_bitwise(grid_mesh):
    """ONE overlap x comm_k chunk (jnp interior) == the standard comm_k
    chunk path, bitwise: interior iterations see only owned data and the
    strips recompute the rim from the same exchanged values."""
    img, _ = two_disks(48, 96, noise=6.0)
    u0 = jnp.asarray(img)  # f64
    p = CVParams()
    std = segment_sharded(u0, p, grid_mesh, fixed=True, max_iter=3,
                          comm_k=3, use_pallas=False)
    ovl = segment_sharded(u0, p, grid_mesh, fixed=True, max_iter=3,
                          comm_k=3, use_pallas=False, halo="overlap")
    np.testing.assert_array_equal(np.asarray(std.phi), np.asarray(ovl.phi))


def test_overlap_commk_multi_chunk_class(grid_mesh):
    """Several chunks + remainder stay on the frozen-means trajectory."""
    img, gt = two_disks(48, 96, noise=6.0)
    u0 = jnp.asarray(img, F32)
    p = CVParams(tol=1e-4, max_iter=200, min_iter=4)
    res = segment_sharded(u0, p, grid_mesh, comm_k=4, use_pallas=False,
                          halo="overlap")
    from fixtures import iou
    assert iou(np.asarray(res.mask), gt) > 0.98
    assert int(res.iters) < 200


def test_overlap_commk_pallas_interior(grid_mesh):
    """Overlap x comm_k with the banded-kernel interior: interior cells
    (rim excluded: 4k up/left, 2k down/right) bitwise-match the
    non-overlap banded comm_k path; the rim bitwise-matches the jnp
    comm_k path."""
    img, _ = two_disks(48, 256, noise=6.0)  # 24x64 shards
    u0 = jnp.asarray(img)  # f64
    p = CVParams()
    k = 2
    ovl = segment_sharded(u0, p, grid_mesh, fixed=True, max_iter=k,
                          comm_k=k, use_pallas=True, interpret=True,
                          halo="overlap")
    std_k = segment_sharded(u0, p, grid_mesh, fixed=True, max_iter=k,
                            comm_k=k, use_pallas=True, interpret=True)
    std_j = segment_sharded(u0, p, grid_mesh, fixed=True, max_iter=k,
                            comm_k=k, use_pallas=False)
    a = np.asarray(ovl.phi)
    kk = np.asarray(std_k.phi)
    j = np.asarray(std_j.phi)
    h, w = 24, 64
    tw, bw = 4 * k, 2 * k
    rim = np.zeros_like(a, dtype=bool)
    for bi in range(2):
        for bj in range(4):
            r0, c0 = bi * h, bj * w
            rim[r0: r0 + tw, c0: c0 + w] = True
            rim[r0 + h - bw: r0 + h, c0: c0 + w] = True
            rim[r0: r0 + h, c0: c0 + tw] = True
            rim[r0: r0 + h, c0 + w - bw: c0 + w] = True
    np.testing.assert_array_equal(a[~rim], kk[~rim])
    np.testing.assert_array_equal(a[rim], j[rim])
