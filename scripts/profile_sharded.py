"""Capture + analyze an on-chip profile of the sharded comm_k path.

Config 4 (4K, banded kernel per shard inside comm_k=8 chunks, run
non-delegated on the 1x1 dev-box mesh) measures ~30% below the
single-chip banded headline (BENCH_CONFIGS 2026-08-18: 10018 vs
14398@100it). On a real pod the per-shard area shrinks and this
sharded-machinery tax grows proportionally, so it is the most
production-relevant residual left. This captures one trace of each
program in ONE session and prices where the tax actually goes:
canvas pad/crop copies? halo-exchange lowering (self-ppermute on 1x1)?
the psum? per-chunk kernel launch overhead vs the single-chip chunk?

Run on the real chip (axon relay up):

    cd /root/repo && timeout 3600 python scripts/profile_sharded.py

Analysis reuses profile_banded.analyze (dependency-free Perfetto
trace.json.gz span aggregation). Results go into docs/BENCHMARKS.md
with this session's timestamp.
"""

import os
import sys
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from profile_banded import analyze  # noqa: E402

from chan_vese_tpu.params import CVParams
from chan_vese_tpu.models.banded import segment_banded_fixed
from chan_vese_tpu.parallel.mesh import make_grid_mesh
from chan_vese_tpu.parallel.sharded import segment_sharded, _make_phi0
from chan_vese_tpu.utils.profiling import trace
from jax.sharding import NamedSharding, PartitionSpec as P

H, W, ITERS = 2160, 3840, 24  # 3 comm_k=8 chunks; short = small trace
OUT = Path("/tmp/cv_profile_sharded")


def capture_sharded(tag):
    rng = np.random.default_rng(0)
    mesh = make_grid_mesh(1, 1)
    u0 = jax.device_put(
        jnp.asarray(rng.uniform(0, 255, (H, W)), jnp.float32),
        NamedSharding(mesh, P("x", "y")))
    p = CVParams()
    phi0 = _make_phi0((H, W), p.init, u0.dtype, mesh)
    with jax.set_mesh(mesh):
        run = jax.jit(lambda u, phi0, r: segment_sharded(
            u + r, p, mesh, phi0=phi0, max_iter=ITERS, fixed=True,
            comm_k=8).phi[0, 0])
        _ = float(run(u0, phi0, jnp.float32(0)))  # warm outside trace
        d = OUT / tag
        with trace(str(d)):
            for r in range(2):
                t0 = time.perf_counter()
                _ = float(run(u0, phi0, jnp.float32(r + 1)))
                dt = time.perf_counter() - t0
                print(f"{tag} rep{r}: {H * W * ITERS / dt / 1e6:9.1f} "
                      f"Mpix-it/s", flush=True)
    return d


def capture_single(tag):
    rng = np.random.default_rng(0)
    u0 = jnp.asarray(rng.uniform(0, 255, (H, W)).astype(np.float32))
    p = CVParams()
    run = jax.jit(lambda u, r: segment_banded_fixed(u + r, p, ITERS,
                                                    k=8)[0][0, 0])
    _ = float(run(u0, jnp.float32(0)))
    d = OUT / tag
    with trace(str(d)):
        for r in range(2):
            t0 = time.perf_counter()
            _ = float(run(u0, jnp.float32(r + 1)))
            dt = time.perf_counter() - t0
            print(f"{tag} rep{r}: {H * W * ITERS / dt / 1e6:9.1f} "
                  f"Mpix-it/s", flush=True)
    return d


def main():
    assert jax.default_backend() == "tpu", \
        f"needs the TPU backend, got {jax.default_backend()!r}"
    dirs = []
    for tag, fn in [("sharded_commk8", capture_sharded),
                    ("single_auto", capture_single)]:
        try:
            dirs.append((tag, fn(tag)))
        except Exception as e:  # noqa: BLE001 - report and continue
            print(f"{tag} capture FAILED: {type(e).__name__}: {e}",
                  flush=True)
    for tag, d in dirs:
        print(f"\n=== {tag} ===", flush=True)
        analyze(d, top=30)


if __name__ == "__main__":
    main()
