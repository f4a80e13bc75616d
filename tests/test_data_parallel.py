"""Data-parallel stack tests on the fake 8-device mesh (eval config 5)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from chan_vese_tpu.parallel import mesh as meshmod
from chan_vese_tpu.parallel.data_parallel import (segment_stack_sharded,
                                                  shard_stack)
from chan_vese_tpu.params import CVParams
from fixtures import iou, two_disks

F32 = jnp.float32


@pytest.fixture(scope="module")
def data_mesh():
    if jax.device_count() < 8:
        pytest.skip("needs 8 (fake) devices")
    return meshmod.make_data_mesh(8)


def _stack(n, h=48, w=48):
    frames, gts = [], []
    for k in range(n):
        img, gt = two_disks(h, w, noise=6.0, seed=k)
        frames.append(img)
        gts.append(gt)
    return np.stack(frames).astype(np.float32), gts


def test_sharded_stack_matches_local(data_mesh):
    from chan_vese_tpu.models.batched import segment_stack_fixed

    stack, gts = _stack(8)
    u = jnp.asarray(stack)
    p = CVParams(init="circle")
    phis_sh, masks_sh = segment_stack_sharded(u, p, data_mesh, iters=25)
    # placement must actually be sharded over 'data'
    assert len(phis_sh.sharding.device_set) == 8
    phis, masks = segment_stack_fixed(u, p, iters=25)
    np.testing.assert_array_equal(np.asarray(masks_sh), np.asarray(masks))
    for k, gt in enumerate(gts):
        assert iou(np.asarray(masks_sh[k]), gt) >= 0.98


def test_sharded_stack_tol_mode(data_mesh):
    stack, gts = _stack(8)
    p = CVParams(init="circle", max_iter=100)
    res = segment_stack_sharded(jnp.asarray(stack), p, data_mesh)
    assert res.iters.shape == (8,)
    for k, gt in enumerate(gts):
        assert iou(np.asarray(res.mask[k]), gt) >= 0.98


def test_indivisible_batch_raises(data_mesh):
    with pytest.raises(ValueError):
        shard_stack(jnp.zeros((7, 16, 16), F32), data_mesh)


def test_sharded_stack_fused_matches_jnp(data_mesh):
    stack, gts = _stack(8, h=64, w=128)
    u = jnp.asarray(stack)
    p = CVParams(init="circle")
    phis_f, masks_f = segment_stack_sharded(u, p, data_mesh, iters=20,
                                            use_pallas=True, interpret=True)
    phis_j, masks_j = segment_stack_sharded(u, p, data_mesh, iters=20,
                                            use_pallas=False)
    np.testing.assert_array_equal(np.asarray(masks_f), np.asarray(masks_j))
    for k, gt in enumerate(gts):
        assert iou(np.asarray(masks_f[k]), gt) >= 0.98
