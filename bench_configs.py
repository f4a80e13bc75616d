#!/usr/bin/env python
"""Full evaluation-config benchmark suite (BASELINE.json:6-12).

Runs all five eval configs on the available hardware and prints one JSON
line per config (plus the headline line bench.py prints). On the 1-chip
dev box, config 4 runs the REAL sharded comm_k chunk machinery on a
degenerate 1x1 mesh (comm_k > 1 is never delegated; config 4a's
per-iteration row IS delegated there and says so in its label) and
config 5 runs on a 1-device data mesh; on a pod slice they spread out
with zero code changes.

Usage: python bench_configs.py [--quick]
"""

import argparse
import json
import time

import numpy as np


def _t(run, *args, reps=3):
    """Time ONE jitted dispatch per rep.

    ``run(*args, r)`` must be a jitted callable returning a 0-d array
    that depends on the full solve (one element of the result). The rep
    index r perturbs the input inside the program (defeats result
    caching); the 4-byte scalar readback forces execution. This keeps
    the tunneled dev box's ~25 ms/dispatch latency to one round-trip
    per rep instead of two or three (round-4 profile); on a normal
    host it changes nothing."""
    import jax.numpy as jnp
    float(run(*args, jnp.float32(0)))  # compile + warm
    best = float("inf")
    for rep in range(reps):
        t0 = time.perf_counter()
        float(run(*args, jnp.float32(rep + 1)))
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true",
                    help="smaller iteration counts (CI smoke)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from chan_vese_tpu.params import CVParams
    from chan_vese_tpu.models.resident import segment_resident_fixed

    rng = np.random.default_rng(0)
    p = CVParams()
    iters = 20 if args.quick else 100
    # small images amortize the ~25ms tunneled-dispatch latency with more
    # iterations (device time per iteration is tens of microseconds there)
    iters_small = 40 if args.quick else 1000
    results = []

    def report(name, pixels, it, secs):
        rec = {"config": name, "Mpixel_iters_per_s":
               round(pixels * it / secs / 1e6, 1),
               "iters": it, "wall_s": round(secs, 4)}
        results.append(rec)
        print(json.dumps(rec), flush=True)

    # config 1: 256x256 grayscale, checkerboard (VMEM-resident kernel:
    # the whole image lives in VMEM across iterations, models/resident.py)
    u = jnp.asarray(rng.uniform(0, 255, (256, 256)), jnp.float32)
    secs = _t(jax.jit(
        lambda u, r: segment_resident_fixed(u + r, p,
                                            iters=iters_small)[0][0, 0]), u)
    report("1: gray 256^2 checkerboard (resident)", 256 * 256, iters_small,
           secs)

    # config 2: 512x512 RGB, per-channel lambdas (VMEM-resident
    # multichannel kernel; falls back to the fused mc kernel off the
    # resident envelope)
    u = jnp.asarray(rng.uniform(0, 255, (512, 512, 3)), jnp.float32)
    secs = _t(jax.jit(
        lambda u, r: segment_resident_fixed(
            u + r, p, iters=iters_small,
            lambda1=(1.0, 1.2, 0.8))[0][0, 0]), u)
    report("2: RGB 512^2 per-channel lambda (resident mc)", 512 * 512,
           iters_small, secs)

    # config 3: multiphase 512^2, 2 level sets. Measures the production
    # solver loop (fully fused 4-phase resident kernel via
    # segment_multiphase(fixed=True)); the per-iteration energy TRACE of
    # segment_multiphase_fixed is a diagnostic that costs as much as the
    # iteration itself and is not part of the reference hot loop
    # (SURVEY.md 3.1 marks energy logging optional).
    from chan_vese_tpu.models.multiphase import segment_multiphase
    u = jnp.asarray(rng.uniform(0, 255, (512, 512)), jnp.float32)
    secs = _t(jax.jit(
        lambda u, r: segment_multiphase(
            u + r, p, m_sets=2, fixed=True,
            max_iter=iters_small).phis[0, 0, 0]), u)
    report("3: multiphase 512^2 (2 phis, fused mp2 resident)", 512 * 512,
           iters_small, secs)

    # config 4: single 4K, 2D-sharded grid + halo exchange, run as the
    # production multi-chip path: the banded kernel per shard inside
    # communication-avoiding comm_k=8 chunks (one 32-deep exchange + one
    # psum per 8 iterations; parallel/sharded._sharded_chunk_pallas).
    # Pre-place the image and phi0 on the mesh so the measurement is the
    # solver, not the 33MB host->device transfer. On the 1-chip box this
    # runs the REAL sharded canvas machinery on a 1x1 mesh - comm_k > 1
    # is never delegated to the single-chip driver (VERDICT r2 weak #1),
    # so the row measures the true sharded-path overhead vs config 4b.
    from jax.sharding import NamedSharding, PartitionSpec as P
    from chan_vese_tpu.parallel.mesh import make_grid_mesh
    from chan_vese_tpu.parallel.sharded import segment_sharded, _make_phi0
    n = jax.device_count()
    nx = 2 if n >= 2 else 1
    ny = max(1, min(4, n // nx))
    mesh = make_grid_mesh(nx, ny)
    tag = " (non-delegated 1x1)" if nx * ny == 1 else ""
    u = jnp.asarray(rng.uniform(0, 255, (2160, 3840)), jnp.float32)
    u = jax.device_put(u, NamedSharding(mesh, P("x", "y")))
    phi0 = _make_phi0(u.shape, p.init, u.dtype, mesh)
    with jax.set_mesh(mesh):  # outer-jitted segment_sharded contract
        secs = _t(jax.jit(
            lambda u, phi0, r: segment_sharded(
                u + r, p, mesh, phi0=phi0, max_iter=iters, fixed=True,
                comm_k=8).phi[0, 0]), u, phi0)
    report(f"4: 4K sharded {nx}x{ny} mesh, comm_k=8 banded kernel per "
           f"shard{tag}", 2160 * 3840, iters, secs)

    # config 4a: per-iteration depth-4 halo exchanges (the classic SP
    # structure). On a 1x1 mesh segment_sharded DELEGATES this to the
    # single-chip fused driver (identical math, no canvas tax) - the
    # label says so explicitly.
    tag_a = (" (1x1 -> delegated to fused driver)" if nx * ny == 1
             else "")
    with jax.set_mesh(mesh):
        secs = _t(jax.jit(
            lambda u, phi0, r: segment_sharded(
                u + r, p, mesh, phi0=phi0, max_iter=iters,
                fixed=True).phi[0, 0]), u, phi0)
    report(f"4a: 4K sharded {nx}x{ny} per-iteration halos{tag_a}",
           2160 * 3840, iters, secs)

    # config 4b: single-chip 4K (the headline; for comparison).
    # Banded multi-iteration kernel, k = 8 iterations per HBM pass
    # (frozen-means-per-chunk trajectory class, models/banded.py);
    # k/unroll/packed = auto resolves to the packed parity-plane kernel
    # at 4K (models/banded.auto_config) - the label says so.
    # Re-place on one device: pallas_call is not SPMD-partitionable, so
    # timing it on the mesh-sharded input would measure a gather (or fail)
    # on a real multi-device mesh.
    from chan_vese_tpu.models.banded import segment_banded_fixed
    u_single = jax.device_put(np.asarray(u), jax.devices()[0])
    secs = _t(jax.jit(
        lambda u, r: segment_banded_fixed(u + r, p, iters=iters,
                                          k=8)[0][0, 0]), u_single)
    report("4b: 4K single-chip banded k=8 Pallas (auto: packed "
           "parity-plane)", 2160 * 3840, iters, secs)

    # config 5: 256 frames of 512^2 via vmap over the data mesh
    from chan_vese_tpu.parallel.mesh import make_data_mesh
    from chan_vese_tpu.parallel.data_parallel import segment_stack_sharded
    frames = 32 if args.quick else 256
    it5 = 10 if args.quick else 30
    dmesh = make_data_mesh()
    stack = jnp.asarray(rng.uniform(0, 255, (frames, 512, 512)), jnp.float32)
    with jax.set_mesh(dmesh):
        secs = _t(jax.jit(
            lambda s, r: segment_stack_sharded(s + r, p, dmesh,
                                               iters=it5)[0][0, 0, 0]),
                  stack)
    report(f"5: stack {frames}x512^2 vmap+data-mesh", frames * 512 * 512,
           it5, secs)

    total = {"summary": "all-configs",
             "device_count": jax.device_count(),
             "backend": jax.default_backend(),
             "results": results}
    with open("BENCH_CONFIGS.json", "w") as fh:
        json.dump(total, fh, indent=1)
    print(f"# wrote BENCH_CONFIGS.json ({len(results)} configs)")


if __name__ == "__main__":
    main()
