"""Coverage for mesh/profiling/multihost utils + numerical robustness."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from chan_vese_tpu.params import CVParams
from chan_vese_tpu.parallel import mesh as meshmod
from chan_vese_tpu.parallel import multihost
from chan_vese_tpu.utils import profiling
from fixtures import two_disks


class TestMesh:
    def test_grid_mesh_shape(self):
        if jax.device_count() < 8:
            pytest.skip("needs 8 devices")
        m = meshmod.make_grid_mesh(2, 4)
        assert m.shape == {"x": 2, "y": 4}
        assert meshmod.grid_sharding(m) is not None

    def test_grid_mesh_too_big_raises(self):
        with pytest.raises(ValueError):
            meshmod.make_grid_mesh(100, 100)

    def test_hybrid_mesh(self):
        if jax.device_count() < 8:
            pytest.skip("needs 8 devices")
        m = meshmod.make_hybrid_mesh(2, 2, 2)
        assert m.shape == {"data": 2, "x": 2, "y": 2}


class TestProfiling:
    def test_time_fn(self):
        f = jax.jit(lambda x: x * 2)
        t, out = profiling.time_fn(f, jnp.ones((8, 8)), reps=2)
        assert t > 0
        np.testing.assert_allclose(np.asarray(out), 2.0)

    def test_roofline(self):
        # v5e, 12 B/pixel-iter -> ~68 Gpix-iter/s ceiling
        assert profiling.roofline(2160, 3840) == pytest.approx(68333.3, rel=0.01)

    def test_trace_context(self, tmp_path):
        with profiling.trace(str(tmp_path / "tr")):
            jax.block_until_ready(jax.jit(lambda x: x + 1)(jnp.ones(4)))
        assert any((tmp_path / "tr").rglob("*"))


class TestMultihost:
    def test_single_process_noop(self):
        multihost.initialize()
        assert multihost.is_coordinator()


class TestRobustness:
    """No NaN/Inf escapes under extreme parameter settings."""

    @pytest.mark.parametrize("params", [
        dict(mu=0.0),                      # no regularization
        dict(mu=1e6),                      # crushing regularization
        dict(dt=50.0),                     # huge step (semi-implicit)
        dict(eps=1e-3),                    # near-sharp Heaviside
        dict(eps=100.0),                   # very smooth Heaviside
        dict(nu=1e4),                      # strong area penalty
        dict(eta2=1e-16),
    ])
    def test_finite(self, params):
        from chan_vese_tpu import segment_fixed

        img, _ = two_disks(32, 32, noise=6.0)
        p = CVParams(init="circle", **params)
        tr = segment_fixed(jnp.asarray(img, jnp.float32), p, iters=50)
        assert bool(jnp.isfinite(tr.phi).all()), params
        assert bool(jnp.isfinite(tr.energy).all()), params

    def test_constant_image(self):
        from chan_vese_tpu import segment

        u = jnp.full((32, 32), 128.0, jnp.float32)
        res = segment(u, CVParams(init="circle", max_iter=50))
        assert bool(jnp.isfinite(res.phi).all())

    def test_tiny_image(self):
        from chan_vese_tpu import segment_fixed

        u = jnp.asarray(np.random.default_rng(0).uniform(0, 255, (4, 5)),
                        jnp.float32)
        tr = segment_fixed(u, CVParams(), iters=10)
        assert bool(jnp.isfinite(tr.phi).all())


def test_drivers_fall_back_to_jnp_off_tpu_without_interpret():
    """Every single-chip driver must run on a non-TPU backend with the
    DEFAULT interpret=False by routing to the jnp path, even on shapes
    the kernels support (round 4: examples/demo.py crashed on CPU with
    'Only interpret mode is supported on CPU backend' because
    segment_fused's fallback guard checked shape/order but not backend)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from chan_vese_tpu.params import CVParams
    from chan_vese_tpu.models.fused import segment_fused, segment_fused_fixed
    from chan_vese_tpu.models.banded import (segment_banded,
                                             segment_banded_fixed)
    from chan_vese_tpu.models.resident import (segment_resident,
                                               segment_resident_fixed,
                                               segment_stack_resident_fixed)
    from chan_vese_tpu.models.batched import segment_stack_fused_fixed

    assert jax.default_backend() != "tpu"  # the premise of this test
    rng = np.random.default_rng(0)
    p = CVParams()
    u = jnp.asarray(rng.uniform(0, 255, (24, 128)), jnp.float32)
    urgb = jnp.asarray(rng.uniform(0, 255, (24, 128, 3)), jnp.float32)
    stack = jnp.asarray(rng.uniform(0, 255, (2, 24, 128)), jnp.float32)

    assert bool(jnp.isfinite(segment_fused(u, p, max_iter=3).phi).all())
    assert bool(jnp.isfinite(
        segment_fused(urgb, p, max_iter=3).phi).all())
    assert bool(jnp.isfinite(segment_fused_fixed(u, p, iters=3)[0]).all())
    assert bool(jnp.isfinite(
        segment_fused_fixed(urgb, p, iters=3)[0]).all())
    p3 = CVParams(max_iter=3)
    assert bool(jnp.isfinite(segment_banded(u, p3).phi).all())
    assert bool(jnp.isfinite(segment_banded_fixed(u, p, iters=3)[0]).all())
    assert bool(jnp.isfinite(
        segment_banded_fixed(urgb, p, iters=3)[0]).all())
    assert bool(jnp.isfinite(segment_resident(u, p3).phi).all())
    assert bool(jnp.isfinite(segment_resident_fixed(u, p, iters=3)[0]).all())
    assert bool(jnp.isfinite(
        segment_resident_fixed(urgb, p, iters=3)[0]).all())
    assert bool(jnp.isfinite(
        segment_stack_resident_fixed(stack, p, iters=3)[0]).all())
    assert bool(jnp.isfinite(
        segment_stack_fused_fixed(stack, p, iters=3)[0]).all())
