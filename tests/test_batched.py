"""Batched stack tests (eval config 5, BASELINE.json:11)."""

import jax.numpy as jnp
import numpy as np

from chan_vese_tpu.models.batched import segment_batch, segment_stack_fixed
from chan_vese_tpu.params import CVParams
from fixtures import iou, two_disks

F32 = jnp.float32


def _stack(n=6, h=48, w=48):
    frames, gts = [], []
    for k in range(n):
        img, gt = two_disks(h, w, noise=6.0, seed=k)
        frames.append(img)
        gts.append(gt)
    return np.stack(frames), gts


def test_stack_fixed_matches_per_frame():
    from chan_vese_tpu import segment_fixed

    stack, gts = _stack(4)
    u = jnp.asarray(stack, F32)
    p = CVParams(init="circle")
    phis, masks = segment_stack_fixed(u, p, iters=30)
    assert phis.shape == u.shape
    for k in range(4):
        single = segment_fixed(u[k], p, iters=30)
        np.testing.assert_array_equal(np.asarray(masks[k]),
                                      np.asarray(single.mask))
        # vmap changes fp op details; 30 iterations amplify - masks above
        # are the meaningful check
        np.testing.assert_allclose(np.asarray(phis[k]),
                                   np.asarray(single.phi),
                                   rtol=0.05, atol=2.0)


def test_stack_segments_all_frames():
    stack, gts = _stack(6)
    p = CVParams(init="circle")
    _, masks = segment_stack_fixed(jnp.asarray(stack, F32), p, iters=30)
    for k, gt in enumerate(gts):
        assert iou(np.asarray(masks[k]), gt) >= 0.98, k


def test_batch_tol_mode_per_frame_iters():
    stack, gts = _stack(3)
    p = CVParams(init="circle", max_iter=100)
    res = segment_batch(jnp.asarray(stack, F32), p)
    assert res.iters.shape == (3,)
    assert res.c1.shape == (3,)
    assert all(int(i) < 100 for i in res.iters)
    for k, gt in enumerate(gts):
        assert iou(np.asarray(res.mask[k]), gt) >= 0.98, k
