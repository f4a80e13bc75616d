#!/usr/bin/env python
"""Iteration-count sweep at 4K: price the fixed per-dispatch cost.

The round-4 profile attributed the 4K headline residual (19.9 G
measured vs 28.9 G in-kernel) to the fixed per-dispatch cost (~25 ms
axon tunnel + scan/pack residue) amortized over only ~29 ms of kernel
work at 100 iterations. If that attribution is right, the measured rate
must follow  rate(I) = A / (A/ceiling * I + fixed) * I  — i.e. climb
toward the in-kernel ceiling as iterations per dispatch grow, with no
new per-iteration cost appearing. This script measures 4K gray at
100/200/400/800 iterations (auto config, single-dispatch timing) and
fits the fixed cost.

Run solo on the real chip: each iteration count is a new outer program
(fresh scan length) but the kernel geometry is shared, so compiles
after the first are fast. `python scripts/bench_iters.py [reps]`.
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from chan_vese_tpu.params import CVParams
from chan_vese_tpu.models.banded import segment_banded_fixed, auto_config


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    print(f"backend={jax.default_backend()} reps={reps}", flush=True)
    rng = np.random.default_rng(0)
    p = CVParams()
    H, W = 2160, 3840
    u = jnp.asarray(rng.uniform(0, 255, (H, W)).astype(np.float32))
    print(f"auto(k,u,packed,fuse)={auto_config(H, W, k=8)}", flush=True)

    rows = []
    for iters in (100, 200, 400, 800):
        @jax.jit
        def run(u, r, it=iters):
            phi, _ = segment_banded_fixed(u + r, p, iters=it, k=8)
            return phi[0, 0]

        _ = float(run(u, jnp.float32(0)))  # compile + warm
        best = float("inf")
        for r in range(reps):
            t0 = time.perf_counter()
            _ = float(run(u, jnp.float32(r + 1)))
            best = min(best, time.perf_counter() - t0)
        mpix = H * W * iters / best / 1e6
        rows.append((iters, best))
        print(f"iters={iters:4d}: {mpix:9.1f} Mpix-it/s  ({best:.4f}s)",
              flush=True)

    # least-squares fit  t(I) = per_iter * I + fixed
    I = np.array([r[0] for r in rows], dtype=np.float64)
    t = np.array([r[1] for r in rows], dtype=np.float64)
    A = np.stack([I, np.ones_like(I)], axis=1)
    (per_iter, fixed), *_ = np.linalg.lstsq(A, t, rcond=None)
    ceil = H * W / per_iter / 1e6
    print(f"fit: per-iteration {per_iter*1e3:.3f} ms -> asymptotic "
          f"{ceil:.0f} Mpix-it/s; fixed per-dispatch {fixed*1e3:.1f} ms",
          flush=True)


if __name__ == "__main__":
    main()
