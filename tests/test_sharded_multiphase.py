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


def _mp2_kernel_reference(u0, phis, p, iters):
    """Unsharded mp2-kernel loop with carried means (the banded route of
    models/multiphase._mp2_banded_loop, run in interpret mode)."""
    from chan_vese_tpu.models.multiphase import phase_means
    from chan_vese_tpu.ops.pallas_multiphase import mp2_iteration

    cs = jnp.stack(phase_means(u0, phis, p.eps))
    tiny = jnp.asarray(1e-30, u0.dtype)
    for _ in range(iters):
        phis, parts = mp2_iteration(phis, u0, cs, p, interpret=True)
        cs = parts[0:4] / jnp.maximum(parts[4:8], tiny)
    return phis


def test_sharded_multiphase_pallas_equals_unsharded_kernel(grid_mesh):
    """The fused coupled canvas kernel per shard == the SAME kernel
    unsharded at 1e-9 f64 (isolates halo/resync/parity/crop from
    kernel-vs-jnp transcendental differences)."""
    from chan_vese_tpu.models.multiphase import init_multiphase

    img, _ = four_regions(64, 256, noise=4.0)
    u = jnp.asarray(img, jnp.float64)
    p = CVParams(mu=0.003 * 255 ** 2)
    phis0 = init_multiphase((64, 256), 2, dtype=u.dtype)
    res = segment_multiphase_sharded(u, p, grid_mesh, m_sets=2,
                                     phis0=phis0, max_iter=8, fixed=True,
                                     use_pallas=True, interpret=True)
    want = _mp2_kernel_reference(u, phis0, p, 8)
    # rtol 1e-8: the carried means differ at f64 summation-order level
    # (psum of shard partials vs whole-image band sums) and the Dirac
    # nonlinearity amplifies that over 8 iterations
    np.testing.assert_allclose(np.asarray(res.phis), np.asarray(want),
                               rtol=1e-8, atol=1e-8)


def test_sharded_multiphase_pallas_matches_jnp_class(grid_mesh):
    """Pallas and jnp sharded multiphase live in the same trajectory
    class: labels agree after a short run."""
    img, _ = four_regions(64, 64, noise=4.0)
    u = jnp.asarray(img, F32)
    p = CVParams(mu=0.003 * 255 ** 2)
    a = segment_multiphase_sharded(u, p, grid_mesh, m_sets=2, max_iter=20,
                                   fixed=True, use_pallas=True,
                                   interpret=True)
    b = segment_multiphase_sharded(u, p, grid_mesh, m_sets=2, max_iter=20,
                                   fixed=True, use_pallas=False)
    lab_diff = (np.asarray(a.labels) != np.asarray(b.labels)).sum()
    assert lab_diff <= 5, lab_diff


def test_sharded_multiphase_trace_matches_unsharded(grid_mesh):
    """psum'd sharded multiphase energy/flip trace == the unsharded
    fixed-trace run at 1e-9 f64 (VERDICT r2 item 5 'Done' criterion)."""
    from chan_vese_tpu.models.multiphase import segment_multiphase_fixed
    from chan_vese_tpu.parallel.sharded import (
        segment_multiphase_sharded_fixed_trace)

    img, _ = four_regions(64, 64, noise=4.0)
    u = jnp.asarray(img, jnp.float64)
    p = CVParams(mu=0.003 * 255 ** 2)
    tr = segment_multiphase_sharded_fixed_trace(u, p, grid_mesh, iters=6,
                                                m_sets=2, use_pallas=False)
    ref = segment_multiphase_fixed(u, p, iters=6, m_sets=2,
                                   use_pallas=False)
    np.testing.assert_allclose(np.asarray(tr.energy),
                               np.asarray(ref.energy),
                               rtol=1e-9, atol=1e-9)
    np.testing.assert_allclose(np.asarray(tr.delta), np.asarray(ref.delta),
                               rtol=1e-9, atol=1e-12)
    np.testing.assert_array_equal(np.asarray(tr.labels),
                                  np.asarray(ref.labels))


def test_sharded_multiphase_trace_pallas_energy_monotone(grid_mesh):
    from chan_vese_tpu.parallel.sharded import (
        segment_multiphase_sharded_fixed_trace)

    img, _ = four_regions(64, 64, noise=4.0)
    u = jnp.asarray(img, F32)
    p = CVParams(mu=0.003 * 255 ** 2)
    tr = segment_multiphase_sharded_fixed_trace(u, p, grid_mesh, iters=12,
                                                m_sets=2, use_pallas=True,
                                                interpret=True)
    e = np.asarray(tr.energy)
    assert np.all(np.diff(e) <= np.abs(e[:-1]) * 1e-5)


def test_sharded_multiphase_checkpoint_roundtrip(grid_mesh, tmp_path):
    """Chunked checkpointed run == straight run; resume picks up the
    newest checkpoint."""
    from chan_vese_tpu.utils.checkpoint_sharded import (
        latest_sharded, segment_multiphase_sharded_with_checkpoints)

    img, _ = four_regions(64, 64, noise=4.0)
    u = jnp.asarray(img, jnp.float64)
    p = CVParams(mu=0.003 * 255 ** 2)
    res = segment_multiphase_sharded_with_checkpoints(
        u, p, grid_mesh, iters=6, ckpt_dir=tmp_path, every=3,
        use_pallas=False)
    ref = segment_multiphase_sharded(u, p, grid_mesh, m_sets=2,
                                     max_iter=6, fixed=True,
                                     use_pallas=False)
    np.testing.assert_allclose(np.asarray(res.phis), np.asarray(ref.phis),
                               rtol=1e-10, atol=1e-10)
    ck = latest_sharded(tmp_path)
    assert ck is not None and ck.name == "ckpt_00000006"
    # resume: a re-run with a higher target starts from iteration 6
    res2 = segment_multiphase_sharded_with_checkpoints(
        u, p, grid_mesh, iters=9, ckpt_dir=tmp_path, every=3,
        use_pallas=False)
    ref2 = segment_multiphase_sharded(u, p, grid_mesh, m_sets=2,
                                      max_iter=9, fixed=True,
                                      use_pallas=False)
    np.testing.assert_allclose(np.asarray(res2.phis),
                               np.asarray(ref2.phis),
                               rtol=1e-10, atol=1e-10)


def test_sharded_multiphase_rdma_halo(grid_mesh):
    """halo='rdma' on the multiphase path == ppermute (fake mesh)."""
    img, _ = four_regions(64, 64, noise=4.0)
    u = jnp.asarray(img, F32)
    p = CVParams(mu=0.003 * 255 ** 2)
    a = segment_multiphase_sharded(u, p, grid_mesh, m_sets=2, max_iter=4,
                                   fixed=True, use_pallas=False)
    b = segment_multiphase_sharded(u, p, grid_mesh, m_sets=2, max_iter=4,
                                   fixed=True, use_pallas=False,
                                   halo="rdma", interpret=True)
    np.testing.assert_array_equal(np.asarray(a.phis), np.asarray(b.phis))


def test_cli_multiphase_sharded_surfaces(grid_mesh, tmp_path):
    """CLI: sharded multiphase with trace, checkpoint and gif (the
    warn-drops of VERDICT r2 missing #4 lifted)."""
    from chan_vese_tpu.cli import main
    from chan_vese_tpu.utils import image_io

    img, _ = four_regions(64, 64, noise=4.0)
    pth = tmp_path / "in.png"
    image_io._save_u8(pth, np.clip(img, 0, 255).astype(np.uint8))
    out = tmp_path / "lab.png"
    csv = tmp_path / "trace.csv"
    rc = main([str(pth), "--mesh", "2", "4", "--multiphase", "2",
               "--mu", "195", "--iters", "8", "--quiet",
               "--trace-energy", str(csv), "-o", str(out)])
    assert rc == 0 and out.exists() and csv.exists()
    assert len(csv.read_text().strip().splitlines()) == 9  # header + 8

    ck = tmp_path / "ck"
    gif = tmp_path / "ev.gif"
    rc = main([str(pth), "--mesh", "2", "4", "--multiphase", "2",
               "--mu", "195", "--iters", "6", "--quiet",
               "--checkpoint-dir", str(ck), "--checkpoint-every", "3",
               "--evolution-gif", str(gif), "--gif-every", "3",
               "-o", str(out)])
    assert rc == 0 and gif.exists()
    assert (ck / "ckpt_00000006").is_dir()


def _frozen_cs_reference(u0, phis, p, iters, k):
    """Unsharded frozen-phase-means-per-chunk multiphase trajectory
    (the comm_k class), pure jnp."""
    from chan_vese_tpu.models.multiphase import _coupling_term, phase_means
    from chan_vese_tpu.ops.sweep import redblack_step

    cs = phase_means(u0, phis, p.eps)
    done = 0
    while done < iters:
        size = min(k, iters - done)
        for _ in range(size):
            new = [phis[m] for m in range(phis.shape[0])]
            for m in range(phis.shape[0]):
                f = _coupling_term(u0, new, cs, m, p)
                new[m] = redblack_step(new[m], f, p)
            phis = jnp.stack(new)
        cs = phase_means(u0, phis, p.eps)
        done += size
    return phis


@pytest.mark.parametrize("k,iters", [(2, 6), (2, 7)])
def test_multiphase_commk_matches_frozen_cs_reference(grid_mesh, k, iters):
    """Multiphase comm_k chunks (jnp path): one 8k-deep exchange per k
    coupled iterations, frozen phase means - 1e-9 f64 vs the unsharded
    frozen-cs reference."""
    img, _ = four_regions(64, 64, noise=4.0)
    u = jnp.asarray(img, jnp.float64)
    p = CVParams(mu=0.003 * 255 ** 2)
    res = segment_multiphase_sharded(u, p, grid_mesh, m_sets=2,
                                     max_iter=iters, fixed=True,
                                     comm_k=k, use_pallas=False)
    from chan_vese_tpu.models.multiphase import init_multiphase
    want = _frozen_cs_reference(
        u, init_multiphase((64, 64), 2, dtype=u.dtype), p, iters, k)
    np.testing.assert_allclose(np.asarray(res.phis), np.asarray(want),
                               rtol=1e-9, atol=1e-9)


def test_multiphase_commk_rgb(grid_mesh):
    """Vector-valued multiphase comm_k chunks vs the frozen-cs
    reference (per-channel means)."""
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
                                     max_iter=6, fixed=True, comm_k=2,
                                     use_pallas=False)
    from chan_vese_tpu.models.multiphase import init_multiphase
    want = _frozen_cs_reference(
        u, init_multiphase((64, 64), 2, dtype=jnp.float64), p, 6, 2)
    np.testing.assert_allclose(np.asarray(res.phis), np.asarray(want),
                               rtol=1e-9, atol=1e-9)


def test_multiphase_commk_pallas_equals_unsharded_kernel_chunks(grid_mesh):
    """comm_k x the fused coupled kernel per shard: equals an unsharded
    loop of the SAME kernel with frozen-cs-per-chunk refresh."""
    from chan_vese_tpu.models.multiphase import init_multiphase, phase_means
    from chan_vese_tpu.ops.pallas_multiphase import mp2_iteration

    img, _ = four_regions(64, 256, noise=4.0)
    u = jnp.asarray(img, jnp.float64)
    p = CVParams(mu=0.003 * 255 ** 2)
    phis0 = init_multiphase((64, 256), 2, dtype=u.dtype)
    k, iters = 2, 6
    res = segment_multiphase_sharded(u, p, grid_mesh, m_sets=2,
                                     phis0=phis0, max_iter=iters,
                                     fixed=True, comm_k=k,
                                     use_pallas=True, interpret=True)
    phis = phis0
    cs = jnp.stack(phase_means(u, phis, p.eps))
    tiny = jnp.asarray(1e-30, u.dtype)
    done = 0
    while done < iters:
        size = min(k, iters - done)
        parts = None
        for _ in range(size):
            phis, parts = mp2_iteration(phis, u, cs, p, interpret=True)
        cs = parts[0:4] / jnp.maximum(parts[4:8], tiny)
        done += size
    np.testing.assert_allclose(np.asarray(res.phis), np.asarray(phis),
                               rtol=1e-8, atol=1e-8)


def test_multiphase_commk_tolerance_and_validation(grid_mesh):
    import itertools

    img, gt = four_regions(64, 64, noise=4.0)
    p = CVParams(mu=0.003 * 255 ** 2, max_iter=200)
    res = segment_multiphase_sharded(jnp.asarray(img, F32), p, grid_mesh,
                                     m_sets=2, comm_k=2, use_pallas=False)
    assert int(res.iters) < 200
    pred = np.asarray(res.labels)
    best = max(float((np.asarray(perm)[pred] == gt).mean())
               for perm in itertools.permutations(range(4)))
    assert best >= 0.97, best

    with pytest.raises(ValueError, match="comm_k"):
        segment_multiphase_sharded(jnp.asarray(img, F32), p, grid_mesh,
                                   comm_k=0)
    with pytest.raises(ValueError, match="8\\*comm_k"):
        segment_multiphase_sharded(jnp.asarray(img, F32), p, grid_mesh,
                                   comm_k=8)  # 64 > 32x16 shards


def test_sharded_multiphase_overlap_matches_standard(grid_mesh):
    """halo='overlap' (interior from owned data while the M exchanges
    fly, rim stitched from the exchanged pads) is elementwise the
    exchange-then-sweep path."""
    img, _ = four_regions(64, 64, noise=4.0)
    u = jnp.asarray(img, jnp.float64)
    p = CVParams(mu=0.003 * 255 ** 2)
    ref = segment_multiphase_sharded(u, p, grid_mesh, m_sets=2,
                                     max_iter=3, fixed=True,
                                     use_pallas=False)
    got = segment_multiphase_sharded(u, p, grid_mesh, m_sets=2,
                                     max_iter=3, fixed=True,
                                     use_pallas=False, halo="overlap")
    assert np.array_equal(np.asarray(got.phis), np.asarray(ref.phis))


def test_sharded_multiphase_overlap_rgb(grid_mesh):
    """Vector-valued multiphase overlap (channel-averaged coupling term
    shares the same interior/rim split)."""
    rng = np.random.default_rng(3)
    img, _ = four_regions(64, 64, noise=4.0)
    u = jnp.asarray(np.stack([img + rng.normal(0, 2, img.shape)
                              for _ in range(3)], axis=-1), jnp.float64)
    p = CVParams(mu=0.003 * 255 ** 2)
    ref = segment_multiphase_sharded(u, p, grid_mesh, m_sets=2,
                                     max_iter=3, fixed=True,
                                     use_pallas=False)
    got = segment_multiphase_sharded(u, p, grid_mesh, m_sets=2,
                                     max_iter=3, fixed=True,
                                     use_pallas=False, halo="overlap")
    assert np.array_equal(np.asarray(got.phis), np.asarray(ref.phis))


def test_sharded_multiphase_overlap_guards(grid_mesh):
    img, _ = four_regions(64, 64, noise=4.0)
    u = jnp.asarray(img, F32)
    p = CVParams()
    with pytest.raises(ValueError, match="overlap x comm_k"):
        segment_multiphase_sharded(u, p, grid_mesh, m_sets=2,
                                   comm_k=2, halo="overlap")
    with pytest.raises(ValueError, match="halo='overlap'"):
        segment_multiphase_sharded(u, p, grid_mesh, max_iter=1,
                                   use_pallas=True, halo="overlap")


def test_sharded_multiphase_m3_f64_exactness(grid_mesh):
    """General-M claim pinned UNDER SHARDING (VERDICT r3 weak #7: every
    sharded multiphase test used m_sets=2): M=3 (8 phases) jnp path on
    the fake mesh must match the unsharded driver to f64 tightness.

    Measured agreement: ~1e-14 after 1 iteration (the psum reduction
    tree differs from the unsharded global sum, so bitwise equality is
    not expected), amplified to ~6e-10 by iteration 4 through the
    H_eps/mean feedback - same tolerance convention as the M=2
    exactness test above."""
    from chan_vese_tpu.models.multiphase import segment_multiphase_fixed

    img, _ = four_regions(64, 64, noise=4.0)
    u = jnp.asarray(img, jnp.float64)
    p = CVParams(mu=0.003 * 255 ** 2)
    res = segment_multiphase_sharded(u, p, grid_mesh, m_sets=3,
                                     max_iter=4, fixed=True,
                                     use_pallas=False)
    ref = segment_multiphase_fixed(u, p, iters=4, m_sets=3)
    assert res.phis.shape == (3,) + u.shape
    np.testing.assert_allclose(np.asarray(res.phis), np.asarray(ref.phis),
                               rtol=1e-10, atol=1e-8)
    lab_diff = (np.asarray(res.labels) != np.asarray(ref.labels)).sum()
    assert lab_diff == 0, lab_diff
