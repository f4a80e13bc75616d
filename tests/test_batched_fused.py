"""Fused (vmap'd Pallas) stack path tests."""

import jax.numpy as jnp
import numpy as np
import pytest

from chan_vese_tpu.models.batched import (segment_stack_fixed,
                                          segment_stack_fused_fixed)
from chan_vese_tpu.params import CVParams
from fixtures import iou, two_disks

F32 = jnp.float32


def _stack(n=4, h=64, w=128):
    frames, gts = [], []
    for k in range(n):
        img, gt = two_disks(h, w, noise=6.0, seed=k)
        frames.append(img)
        gts.append(gt)
    return np.stack(frames).astype(np.float32), gts


def test_fused_stack_matches_jnp_stack():
    stack, gts = _stack()
    u = jnp.asarray(stack)
    p = CVParams(init="circle")
    phis_f, masks_f = segment_stack_fused_fixed(u, p, iters=20,
                                                interpret=True)
    phis_j, masks_j = segment_stack_fixed(u, p, iters=20)
    np.testing.assert_array_equal(np.asarray(masks_f), np.asarray(masks_j))
    for k, gt in enumerate(gts):
        assert iou(np.asarray(masks_f[k]), gt) >= 0.98


def test_fused_stack_fallback_unaligned():
    stack, gts = _stack(n=2, w=100)  # W not lane-aligned -> jnp fallback
    phis, masks = segment_stack_fused_fixed(
        jnp.asarray(stack), CVParams(init="circle"), iters=20,
        interpret=True)
    assert iou(np.asarray(masks[0]), gts[0]) >= 0.98


@pytest.mark.tpu
def test_fused_stack_compiled_tpu():
    stack, gts = _stack(n=4, h=64, w=128)
    phis, masks = segment_stack_fused_fixed(
        jnp.asarray(stack), CVParams(init="circle"), iters=20)
    for k, gt in enumerate(gts):
        assert iou(np.asarray(masks[k]), gt) >= 0.98
