"""Distribution layer: meshes, halo exchange, sharded solvers (SURVEY §2.9)."""

from .mesh import (batch_sharding, grid_sharding, make_data_mesh,
                   make_grid_mesh, make_hybrid_mesh)
from .halo import exchange_halo2d
from .sharded import (segment_multiphase_sharded,
                      segment_multiphase_sharded_fixed_trace,
                      segment_sharded, segment_sharded_fixed_trace)
from .data_parallel import segment_stack_sharded, shard_stack
from . import multihost

__all__ = [
    "make_grid_mesh", "make_data_mesh", "make_hybrid_mesh",
    "grid_sharding", "batch_sharding", "exchange_halo2d",
    "segment_sharded", "segment_sharded_fixed_trace",
    "segment_multiphase_sharded", "segment_multiphase_sharded_fixed_trace",
    "segment_stack_sharded", "shard_stack", "multihost",
]
