"""Sharded path with the fused Pallas kernel per shard (interpret mode on
the fake CPU mesh; compiled variant under RUN_TPU_TESTS on the 1x1 mesh).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from chan_vese_tpu.params import CVParams
from chan_vese_tpu.parallel import mesh as meshmod
from chan_vese_tpu.parallel.sharded import segment_sharded
from fixtures import iou, two_disks

F32 = jnp.float32


@pytest.fixture(scope="module")
def grid_mesh():
    if jax.device_count() < 8:
        pytest.skip("needs 8 (fake) devices")
    return meshmod.make_grid_mesh(2, 4)


def test_pallas_sharded_matches_jnp_sharded(grid_mesh):
    img, gt = two_disks(64, 256, noise=6.0)
    u = jnp.asarray(img, F32)
    p = CVParams(init="circle")
    a = segment_sharded(u, p, grid_mesh, max_iter=10, fixed=True,
                        use_pallas=True, interpret=True)
    b = segment_sharded(u, p, grid_mesh, max_iter=10, fixed=True,
                        use_pallas=False)
    np.testing.assert_array_equal(np.asarray(a.mask), np.asarray(b.mask))
    np.testing.assert_allclose(np.asarray(a.phi), np.asarray(b.phi),
                               rtol=1e-4, atol=1e-2)
    assert float(a.c1) == pytest.approx(float(b.c1), rel=1e-5)


def test_pallas_sharded_single_iteration_tight(grid_mesh):
    from chan_vese_tpu import segment_fixed

    img, _ = two_disks(64, 256, noise=6.0)
    u = jnp.asarray(img, F32)
    p = CVParams(init="circle")
    a = segment_sharded(u, p, grid_mesh, max_iter=1, fixed=True,
                        use_pallas=True, interpret=True)
    ref = segment_fixed(u, p, iters=1)
    np.testing.assert_allclose(np.asarray(a.phi), np.asarray(ref.phi),
                               rtol=1e-5, atol=1e-4)


def test_pallas_sharded_converges(grid_mesh):
    # 64x64: the circle init overlaps the disks (on very wide aspect
    # ratios it lands on background and the model legitimately settles
    # on a different local optimum - not a sharding property)
    img, gt = two_disks(64, 64, noise=6.0)
    p = CVParams(init="circle", max_iter=100)
    res = segment_sharded(jnp.asarray(img, F32), p, grid_mesh,
                          use_pallas=True, interpret=True)
    assert int(res.iters) < 100
    assert iou(np.asarray(res.mask), gt) >= 0.99


@pytest.mark.tpu
def test_pallas_sharded_compiled_1x1():
    from chan_vese_tpu import segment_fixed

    mesh = meshmod.make_grid_mesh(1, 1)
    img, gt = two_disks(256, 256, noise=6.0)
    u = jnp.asarray(img, F32)
    p = CVParams(init="circle")
    res = segment_sharded(u, p, mesh, max_iter=30, fixed=True,
                          use_pallas=True)
    ref = segment_fixed(u, p, iters=30)
    assert (np.asarray(res.mask) != np.asarray(ref.mask)).sum() <= 3
    assert iou(np.asarray(res.mask), gt) >= 0.98
