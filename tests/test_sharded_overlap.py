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
    u0 = jnp.zeros((48, 96), F32)
    # overlap requires the jnp path
    with pytest.raises(ValueError, match="use_pallas=False"):
        segment_sharded(u0, CVParams(), grid_mesh, halo="overlap",
                        use_pallas=True)
    # shards below 16x16 are rejected (16-deep strips would wrap)
    u_small = jnp.zeros((16, 32), F32)  # 8x8 shards
    with pytest.raises(ValueError, match="16x16"):
        segment_sharded(u_small, CVParams(), grid_mesh, halo="overlap",
                        use_pallas=False)
