"""Data-parallel batched segmentation over a device mesh (SURVEY.md §3.5,
eval config 5: 256 frames of 512x512 across a v5e slice).

The TPU-native realization of DP for this workload: the vmap'd solver
(models/batched.py) is a single jitted program over (N, H, W); placing the
batch with a NamedSharding over the mesh's 'data' axis makes XLA partition
it - each device segments its frames independently, no halos, no
collectives in the hot loop (convergence in tol mode uses one psum-free
per-frame while_loop under vmap).
"""

from __future__ import annotations

import contextlib
import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.batched import segment_batch, segment_stack_fixed
from ..params import CVParams


def shard_stack(u0, mesh: Mesh):
    """Place a (N, H, W[, C]) stack over the mesh's 'data' axis."""
    n = u0.shape[0]
    nd = mesh.shape["data"]
    if n % nd:
        raise ValueError(f"batch {n} not divisible by data axis {nd}")
    return jax.device_put(u0, NamedSharding(mesh, P("data")))


def segment_stack_sharded(u0, p: CVParams = CVParams(), mesh: Mesh = None,
                          iters: Optional[int] = None,
                          use_pallas: Optional[bool] = None,
                          interpret: bool = False):
    """Segment a frame stack data-parallel across the mesh.

    iters=None -> tolerance mode (per-frame iteration counts); otherwise
    the lean fixed-iteration loop. Outputs inherit the input sharding.

    In fixed mode the per-device work routes through the fused Pallas
    stack kernel when supported (use_pallas=None -> auto on TPU); the
    kernel is wrapped in an explicit shard_map because XLA cannot
    SPMD-partition a pallas_call on its own.
    """
    if mesh is None:
        raise ValueError("segment_stack_sharded needs a mesh "
                         "(parallel.mesh.make_data_mesh)")
    u0 = shard_stack(u0, mesh)
    # Under an outer jit trace set_mesh is forbidden - the CALLER must
    # hold `with jax.set_mesh(mesh):` open around the jitted call (same
    # contract as segment_sharded; bench_configs' single-dispatch
    # timing relies on it).
    mesh_ctx = (contextlib.nullcontext() if isinstance(u0, jax.core.Tracer)
                else jax.set_mesh(mesh))
    if iters is None:
        with mesh_ctx:
            return segment_batch(u0, p)
    if use_pallas is None:
        from ..ops import pallas_sweep
        use_pallas = (jax.default_backend() == "tpu"
                      and pallas_sweep.supports(*u0.shape[1:3])
                      and u0.ndim == 3)
    if not use_pallas:
        with mesh_ctx:
            return segment_stack_fixed(u0, p, iters=iters)
    run = _build_fused_stack(p, mesh, iters, interpret)
    with mesh_ctx:
        return run(u0)


@functools.lru_cache(maxsize=64)
def _build_fused_stack(p, mesh, iters, interpret):
    # per-device work: VMEM-resident per-frame kernel when each frame fits
    # the envelope (models/resident.py; ~2.4x the banded stack kernel at
    # 512^2 x 30 iters on v5e), banded stack kernel otherwise (the
    # resident driver falls back internally).
    from ..models.resident import segment_stack_resident_fixed

    def local_fn(stack):
        return segment_stack_resident_fixed(stack, p, iters=iters,
                                            interpret=interpret)

    mapped = shard_map(local_fn, mesh=mesh, in_specs=P("data"),
                       out_specs=(P("data"), P("data")), check_vma=False)
    return jax.jit(mapped)
