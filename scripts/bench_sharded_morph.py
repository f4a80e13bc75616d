#!/usr/bin/env python
"""Sharded morph/GAC throughput on the 1x1-canvas real chip
(VERDICT r4 missing #5 tail: sharded morph throughput was never
measured even on the 1x1 canvas).

Legs at 4K gray, fixed-iteration timing (tol=0 so the tolerance loops
run the exact max_iter cap):

    gspmd        segment_morph_sharded (per-iteration GSPMD partition;
                 on a 1x1 mesh this is the plain jnp while_loop +
                 sharding constraints - the comm-free baseline)
    comm_k       segment_morph_sharded_chunked comm_k=8 (shard_map +
                 deep-halo chunks; on 1x1 the exchange degenerates to
                 edge replication, so this prices the chunk MACHINERY -
                 pad concats, per-op refresh selects - against the
                 per-iteration baseline, exactly like BENCH_CONFIGS
                 config 4 does for the PDE family)
    gac variants of both

Run: python scripts/bench_sharded_morph.py [iters] [leg-substring ...]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from chan_vese_tpu.models.morph import segment_morph_sharded
from chan_vese_tpu.models.morph_gac import segment_gac_sharded
from chan_vese_tpu.parallel.mesh import make_grid_mesh
from chan_vese_tpu.parallel.sharded_morph import (
    segment_gac_sharded_chunked, segment_morph_sharded_chunked)
from chan_vese_tpu.params import CVParams


def timed(fn, reps=3):
    fn(0.0)  # warm (compile)
    best = float("inf")
    for r in range(reps):
        t0 = time.perf_counter()
        fn(float(r + 1))
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    rest = sys.argv[1:]
    iters = int(rest.pop(0)) if rest and rest[0].isdigit() else 200
    only = [s.lower() for s in rest]

    def want(name):
        return not only or any(s in name.lower() for s in only)

    print(f"backend={jax.default_backend()} iters={iters}", flush=True)
    rng = np.random.default_rng(0)
    H, W = 2160, 3840
    u = jnp.asarray(rng.uniform(0, 255, (H, W)), jnp.float32)
    g = jnp.asarray(rng.uniform(0.05, 1.0, (H, W)), jnp.float32)
    mesh = make_grid_mesh(1, 1)
    p = CVParams(max_iter=iters, tol=0.0)

    legs = []
    if want("morph gspmd"):
        legs.append(("morph gspmd", lambda r: float(
            segment_morph_sharded(u + jnp.float32(r), p,
                                  mesh=mesh).delta)))
    if want("morph comm_k"):
        legs.append(("morph comm_k=8", lambda r: float(
            segment_morph_sharded_chunked(u + jnp.float32(r), p,
                                          mesh=mesh, comm_k=8).delta)))
    if want("gac gspmd"):
        legs.append(("gac gspmd", lambda r: float(
            segment_gac_sharded(g + jnp.float32(1e-6 * r), p, mesh=mesh,
                                balloon=1, threshold=0.3).delta)))
    if want("gac comm_k"):
        legs.append(("gac comm_k=8", lambda r: float(
            segment_gac_sharded_chunked(g + jnp.float32(1e-6 * r), p,
                                        mesh=mesh, balloon=1,
                                        threshold=0.3,
                                        comm_k=8).delta)))

    for name, fn in legs:
        t = timed(fn)
        mpix = H * W * iters / t / 1e6
        print(f"{name:16s} 4K x{iters}: {mpix:9.1f} Mpix-it/s "
              f"({t:.4f}s)", flush=True)


if __name__ == "__main__":
    main()
