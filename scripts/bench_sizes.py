#!/usr/bin/env python
"""Headline-size sweep with the round-4 single-dispatch timing.

Measures the auto-config banded driver (scalar) and the vector driver
(RGB) at 4K/8K on the real chip, one jitted dispatch per rep (perturb +
solve + scalar probe inside the program — docs/BENCHMARKS.md round-4
methodology; the tunnel costs ~25 ms per dispatch).

Run: python scripts/bench_sizes.py [iters] [name-substring ...]
(default 200 iters, all four sizes; name substrings filter the sweep,
e.g. `bench_sizes.py 200 "8K RGB"` re-runs one leg after a timeout)
"""


import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from chan_vese_tpu.params import CVParams
from chan_vese_tpu.models.banded import (segment_banded_fixed, auto_config,
                                         auto_config_mc)


def timeit(run, *args, reps=3):
    _ = float(run(*args, jnp.float32(0)))  # compile + warm
    best = float("inf")
    for r in range(reps):
        t0 = time.perf_counter()
        _ = float(run(*args, jnp.float32(r + 1)))
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 200
    only = [a.lower() for a in sys.argv[2:]]
    print(f"backend={jax.default_backend()} iters={iters}", flush=True)
    rng = np.random.default_rng(0)
    p = CVParams()

    @jax.jit
    def run(u, r):
        phi, _ = segment_banded_fixed(u + r, p, iters=iters, k=8)
        return phi[0, 0]

    # 16K is not a BASELINE config; it is the dispatch-amortization probe:
    # at ~0.9 s of in-kernel work per dispatch the ~25 ms tunnel cost is
    # <3%, so the measured rate should converge to the ~28.9 G in-kernel
    # ceiling the profile recorded (docs/BENCHMARKS.md). Run it via the
    # name filter ("16K") — its first compile is slow, keep it solo.
    for name, shape in [("4K gray", (2160, 3840)),
                        ("8K gray", (4320, 7680)),
                        ("4K RGB", (2160, 3840, 3)),
                        ("8K RGB", (4320, 7680, 3)),
                        ("16K gray", (8640, 15360))]:
        if only and not any(s in name.lower() for s in only):
            continue
        if name == "16K gray" and not only:
            continue  # opt-in only: huge first compile, not a BASELINE size
        u = jnp.asarray(rng.uniform(0, 255, shape).astype(np.float32))
        cfg = (auto_config(*shape, k=8) if len(shape) == 2
               else auto_config_mc(shape[0], shape[1], shape[2], k=8))
        t = timeit(run, u)
        mpix = shape[0] * shape[1] * iters / t / 1e6
        print(f"{name:8s} auto(k,u,packed,fuse)={cfg}: {mpix:9.1f} "
              f"Mpix-it/s  ({t:.4f}s)", flush=True)


if __name__ == "__main__":
    main()
