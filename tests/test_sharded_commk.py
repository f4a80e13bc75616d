"""Communication-avoiding sharded chunking (segment_sharded(comm_k=k)):
one 4k-deep halo exchange per k frozen-means iterations."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from chan_vese_tpu.ops.reductions import (data_term, means_from_sums,
                                          region_means)
from chan_vese_tpu.ops.sweep import redblack_step
from chan_vese_tpu.params import CVParams
from chan_vese_tpu.parallel import mesh as meshmod
from chan_vese_tpu.parallel.sharded import segment_sharded
from chan_vese_tpu.utils.init_phi import init_phi
from fixtures import iou, two_disks

F32 = jnp.float32


@pytest.fixture(scope="module")
def grid_mesh():
    if jax.device_count() < 8:
        pytest.skip("needs 8 (fake) devices")
    return meshmod.make_grid_mesh(2, 4)


def _frozen_means_reference(u0, phi, p, iters, k):
    """The banded/comm-avoiding trajectory class, pure jnp, unsharded."""
    c1, c2 = region_means(u0, phi, p.eps)
    sum_u = jnp.sum(u0)
    n_pix = float(u0.size)
    done = 0
    while done < iters:
        size = min(k, iters - done)
        f = data_term(u0, c1, c2, p.nu, p.lambda1, p.lambda2)
        for _ in range(size):
            phi = redblack_step(phi, f, p)
        from chan_vese_tpu.ops.numerics import heaviside
        h = heaviside(phi, p.eps)
        c1, c2 = means_from_sums(jnp.sum(u0 * h), jnp.sum(h), sum_u, n_pix)
        done += size
    return phi


@pytest.mark.parametrize("k,iters", [(2, 8), (3, 10)])
def test_commk_matches_frozen_means_reference(grid_mesh, k, iters):
    img, _ = two_disks(48, 96, noise=6.0)
    u0 = jnp.asarray(img)  # f64 in tests: tight trajectory agreement
    p = CVParams()
    res = segment_sharded(u0, p, grid_mesh, fixed=True, max_iter=iters,
                          comm_k=k)
    want = _frozen_means_reference(u0, init_phi((48, 96), p.init,
                                                u0.dtype), p, iters, k)
    np.testing.assert_allclose(np.asarray(res.phi), np.asarray(want),
                               rtol=1e-9, atol=1e-9)
    assert int(res.iters) == iters


def test_commk_tolerance_converges(grid_mesh):
    img, gt = two_disks(48, 96, noise=6.0)
    u0 = jnp.asarray(img, F32)
    p = CVParams(tol=1e-4, max_iter=200, min_iter=4)
    res = segment_sharded(u0, p, grid_mesh, comm_k=4)
    assert iou(np.asarray(res.mask), gt) > 0.98
    assert int(res.iters) < 200


def test_commk_rdma_halo(grid_mesh):
    """comm_k composes with the remote-DMA halo mechanism."""
    img, _ = two_disks(48, 96, noise=6.0)
    u0 = jnp.asarray(img, F32)
    p = CVParams()
    a = segment_sharded(u0, p, grid_mesh, fixed=True, max_iter=6, comm_k=3)
    b = segment_sharded(u0, p, grid_mesh, fixed=True, max_iter=6, comm_k=3,
                        halo="rdma", interpret=True)
    np.testing.assert_array_equal(np.asarray(a.phi), np.asarray(b.phi))


def test_commk_validation(grid_mesh):
    p = CVParams()
    u0 = jnp.zeros((48, 96), F32)
    with pytest.raises(ValueError, match="comm_k"):
        segment_sharded(u0, p, grid_mesh, comm_k=0)
    with pytest.raises(ValueError, match="grayscale jnp path"):
        segment_sharded(jnp.zeros((48, 96, 3), F32), p, grid_mesh,
                        comm_k=2)
    with pytest.raises(ValueError, match="grayscale jnp path"):
        segment_sharded(u0, p, grid_mesh, comm_k=2, use_pallas=True)
    with pytest.raises(ValueError, match="deep halos"):
        segment_sharded(u0, p, grid_mesh, comm_k=8)  # 32 > 24-row shard


def test_cli_commk(grid_mesh, tmp_path):
    from chan_vese_tpu.cli import main
    from chan_vese_tpu.utils import image_io

    img, gt = two_disks(48, 96, noise=6.0)
    pth = tmp_path / "in.png"
    image_io._save_u8(pth, np.clip(img, 0, 255).astype(np.uint8))
    out = tmp_path / "m.png"
    rc = main([str(pth), "--mesh", "2", "4", "--comm-k", "4",
               "--init", "circle", "--quiet", "-o", str(out)])
    assert rc == 0
    mask = image_io.load_image(out) > 127
    assert iou(mask, gt) >= 0.97
