#!/usr/bin/env python
"""A/B the batched MXU pack (_pack_n) vs the former per-frame loop.

ADVICE r3 flagged packed_resident_iterations_batch's per-frame pack
loop: N-linear trace/program size around the kernel call at config-5
scale (N=256, 512^2). _pack_n replaces it with ONE batched dot_general
+ transpose. This script measures, in one session:

  1. config-5-scale compile wall time + steady-state throughput for
     packed_resident_iterations_batch under (a) the loop pack
     (monkeypatched back in) and (b) the batched pack;
  2. the 8K RGB pack transient hazard: _pack_n on (3, 4320, 7680)
     (the shape class whose vmapped LEGACY form asked for 25.5 GB).

jax.clear_caches() between legs so each leg pays its own trace+compile.
Run solo on the real chip: python scripts/ab_pack_batch.py [iters]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from chan_vese_tpu.params import CVParams
from chan_vese_tpu.ops import pallas_packed as pp


def _loop_pack_n(xn):
    return jnp.stack([pp._pack(c) for c in xn])


def _loop_unpack_n(planes_n):
    return jnp.stack([pp._unpack(pl) for pl in planes_n])


def leg(name, iters, reps=3):
    jax.clear_caches()
    rng = np.random.default_rng(0)
    N, H, W = 256, 512, 512
    u = jnp.asarray(rng.uniform(0, 255, (N, H, W)).astype(np.float32))
    phi = jnp.asarray(rng.standard_normal((N, H, W)).astype(np.float32))
    p = CVParams()

    @jax.jit
    def run(phi, u, r):
        out, parts = pp.packed_resident_iterations_batch(
            phi + r, u, p, iters=iters)
        return out[0, 0, 0] + parts[0, 0]

    t0 = time.perf_counter()
    _ = float(run(phi, u, jnp.float32(0)))
    t_compile = time.perf_counter() - t0
    best = float("inf")
    for r in range(reps):
        t0 = time.perf_counter()
        _ = float(run(phi, u, jnp.float32(r + 1)))
        best = min(best, time.perf_counter() - t0)
    mpix = N * H * W * iters / best / 1e6
    print(f"{name}: compile+first {t_compile:7.1f}s  "
          f"{mpix:9.1f} Mpix-it/s  ({best:.4f}s)", flush=True)


def main():
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 200
    print(f"backend={jax.default_backend()} iters={iters}", flush=True)

    orig = (pp._pack_n, pp._unpack_n)
    pp._pack_n, pp._unpack_n = _loop_pack_n, _loop_unpack_n
    try:
        leg("loop   pack (pre-ADVICE)", iters)
    finally:
        pp._pack_n, pp._unpack_n = orig
    leg("batched pack (_pack_n)   ", iters)

    # 8K RGB transient hazard: must run without an OOM or a seconds-long
    # copy (the vmapped legacy form materialized f32[3,2160,2,3840,2]).
    jax.clear_caches()
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.uniform(0, 255, (3, 4320, 7680)).astype(np.float32))

    @jax.jit
    def rt(x):
        return pp._unpack_n(pp._pack_n(x))[0, 0, 0]

    _ = float(rt(x))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        _ = float(rt(x))
        best = min(best, time.perf_counter() - t0)
    print(f"8K RGB pack+unpack round-trip: {best*1e3:.1f} ms "
          f"(incl ~25 ms dispatch)", flush=True)


if __name__ == "__main__":
    main()
