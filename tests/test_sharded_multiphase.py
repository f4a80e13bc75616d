"""Multiphase over the 2D mesh (SURVEY.md C10 x spatial sharding)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from chan_vese_tpu.params import CVParams
from chan_vese_tpu.parallel import mesh as meshmod
from chan_vese_tpu.parallel.sharded import segment_multiphase_sharded
from fixtures import four_regions

F32 = jnp.float32


@pytest.fixture(scope="module")
def grid_mesh():
    if jax.device_count() < 8:
        pytest.skip("needs 8 (fake) devices")
    return meshmod.make_grid_mesh(2, 4)


def test_sharded_multiphase_matches_unsharded(grid_mesh):
    from chan_vese_tpu.models.multiphase import segment_multiphase_fixed

    img, gt = four_regions(64, 64, noise=4.0)
    u = jnp.asarray(img, F32)
    p = CVParams(mu=0.003 * 255 ** 2)
    res = segment_multiphase_sharded(u, p, grid_mesh, m_sets=2,
                                     max_iter=20, fixed=True)
    ref = segment_multiphase_fixed(u, p, iters=20, m_sets=2)
    lab_diff = (np.asarray(res.labels) != np.asarray(ref.labels)).sum()
    assert lab_diff <= 5, lab_diff


def test_sharded_multiphase_f64_exactness(grid_mesh):
    from chan_vese_tpu.models.multiphase import segment_multiphase_fixed

    img, _ = four_regions(64, 64, noise=4.0)
    u = jnp.asarray(img, jnp.float64)
    p = CVParams(mu=0.003 * 255 ** 2)
    res = segment_multiphase_sharded(u, p, grid_mesh, m_sets=2,
                                     max_iter=3, fixed=True)
    ref = segment_multiphase_fixed(u, p, iters=3, m_sets=2)
    np.testing.assert_allclose(np.asarray(res.phis), np.asarray(ref.phis),
                               rtol=1e-10, atol=1e-8)


def test_sharded_multiphase_rgb(grid_mesh):
    """Vector-valued multiphase over the mesh (the last cell of the
    model-family x parallelism matrix)."""
    from chan_vese_tpu.models.multiphase import segment_multiphase_fixed

    rng = np.random.default_rng(0)
    colors = np.array([[220.0, 40.0, 40.0], [40.0, 220.0, 40.0],
                       [40.0, 40.0, 220.0], [200.0, 200.0, 200.0]])
    lab = np.zeros((64, 64), np.int32)
    lab[:32, 32:] = 1
    lab[32:, :32] = 2
    lab[32:, 32:] = 3
    img = colors[lab] + 3.0 * rng.standard_normal((64, 64, 3))
    u = jnp.asarray(img, jnp.float64)
    p = CVParams(mu=0.003 * 255 ** 2)
    res = segment_multiphase_sharded(u, p, grid_mesh, m_sets=2,
                                     max_iter=5, fixed=True)
    ref = segment_multiphase_fixed(u, p, iters=5, m_sets=2)
    np.testing.assert_allclose(np.asarray(res.phis), np.asarray(ref.phis),
                               rtol=1e-10, atol=1e-8)


def test_sharded_multiphase_tol_converges(grid_mesh):
    import itertools

    img, gt = four_regions(64, 64, noise=4.0)
    p = CVParams(mu=0.003 * 255 ** 2, max_iter=200)
    res = segment_multiphase_sharded(jnp.asarray(img, F32), p, grid_mesh,
                                     m_sets=2)
    assert int(res.iters) < 200
    pred = np.asarray(res.labels)
    best = max(float((np.asarray(perm)[pred] == gt).mean())
               for perm in itertools.permutations(range(4)))
    assert best >= 0.97, best
