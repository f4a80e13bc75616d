#!/usr/bin/env python
"""Tune the banded multi-iteration kernel on the real chip: k sweep at 4K.

Measurement discipline per docs/BENCHMARKS.md: everything inside one jit
dispatch (scan over chunks), warm-up call first, best-of-N with a forced
scalar readback. Run: python scripts/bench_banded.py [H W iters]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from chan_vese_tpu.params import CVParams
from chan_vese_tpu.models.fused import segment_fused_fixed
from chan_vese_tpu.models.banded import segment_banded_fixed
from chan_vese_tpu.ops.pallas_banded import band_rows_banded, supports_banded


def timeit(fn, reps=3):
    phi, _ = fn(0)
    _ = float(phi[0, 0])
    best = float("inf")
    for r in range(reps):
        t0 = time.perf_counter()
        phi, _ = fn(r + 1)
        _ = float(phi[0, 0])
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    H = int(sys.argv[1]) if len(sys.argv) > 1 else 2160
    W = int(sys.argv[2]) if len(sys.argv) > 2 else 3840
    iters = int(sys.argv[3]) if len(sys.argv) > 3 else 192
    print(f"backend={jax.default_backend()} shape=({H},{W}) iters={iters}",
          flush=True)
    rng = np.random.default_rng(0)
    u0 = jnp.asarray(rng.uniform(0, 255, (H, W)).astype(np.float32))
    p = CVParams()

    t = timeit(lambda r: segment_fused_fixed(u0 + jnp.float32(r), p, iters))
    base = H * W * iters / t / 1e6
    print(f"fused    baseline: {base:9.1f} Mpix-it/s  ({t:.3f}s)", flush=True)

    from chan_vese_tpu.ops.pallas_packed import supports_packed_banded

    # (k, unroll, fuse): fuse collapses the j grid into an in-kernel
    # fori_loop with ref-based state (round-3 per-grid-step-overhead
    # experiment - see ops/pallas_banded._banded_kernel_fusej)
    combos = {False: ((4, 1, False), (8, 1, False), (8, 4, False),
                      (16, 4, False), (8, 1, True), (8, 4, True),
                      (16, 4, True), (16, 1, True), (32, 4, True)),
              True: ((8, 1, False), (8, 1, True), (8, 2, True),
                     (16, 1, True), (32, 1, True))}
    for packed in (False, True):
        for k, u, fz in combos[packed]:
            tag = "packed" if packed else "banded"
            tag += "+fusej" if fz else ""
            ok = (supports_packed_banded(H, W, k) if packed
                  else supports_banded(H, W, k))
            if not ok or iters % k:
                print(f"{tag} k={k:2d}: unsupported", flush=True)
                continue
            b = band_rows_banded(H, W, k)
            try:
                t = timeit(lambda r, k=k, u=u, pk=packed, fz=fz:
                           segment_banded_fixed(u0 + jnp.float32(r), p,
                                                iters, k=k, unroll=u,
                                                packed=pk, fuse=fz))
            except Exception as e:
                print(f"{tag} k={k:2d} u={u}: FAILED "
                      f"{str(e).splitlines()[0][:90]}", flush=True)
                continue
            v = H * W * iters / t / 1e6
            print(f"{tag} k={k:2d} u={u} (band {b:3d}): {v:9.1f} "
                  f"Mpix-it/s ({t:.3f}s, {v / base:.2f}x)", flush=True)


if __name__ == "__main__":
    main()
