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

from typing import Optional

import jax
import jax.numpy as jnp
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
                          iters: Optional[int] = None):
    """Segment a frame stack data-parallel across the mesh.

    iters=None -> tolerance mode (per-frame iteration counts); otherwise
    the lean fixed-iteration loop. Outputs inherit the input sharding.
    """
    if mesh is None:
        raise ValueError("segment_stack_sharded needs a mesh "
                         "(parallel.mesh.make_data_mesh)")
    u0 = shard_stack(u0, mesh)
    with jax.set_mesh(mesh):
        if iters is None:
            return segment_batch(u0, p)
        return segment_stack_fixed(u0, p, iters=iters)
