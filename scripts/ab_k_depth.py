#!/usr/bin/env python
"""Halo-depth (k) A/B for the packed banded driver at 4K/8K/16K.

Motivation (2026-08-19 session): same-session gray rates were
4K 19823 / 8K 23132 / 16K 19604 Mpix-it/s — exactly the shape predicted
by packed band-tile halo redundancy T/bp (1.25 / 1.5 / 2.0 at k=8:
bp = 96/48/24 VMEM-capped by W, halos fixed at up+dn = 16+8 rows).
Scaling the 28.9 G measured in-kernel body by 1/redundancy reproduces
all three numbers to ~5%.

k=4 halves the halo rows (sublane alignment: up=-(-2k//8)*8 -> 8,
dn -> 8), cutting redundancy to 1.17/1.33/1.67 at the three sizes —
a +7%/+12%/+20% body-rate bound — at the cost of 2x HBM passes
(1.5 -> 3 B/pixel-iteration, far under the ~820 GB/s ceiling) and 2x
per-grid-step overhead. This script measures both k at each size in ONE
session, single-dispatch timing (docs/BENCHMARKS.md round-4
methodology).

Run solo on the real chip: python scripts/ab_k_depth.py [iters] [filter]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from chan_vese_tpu.params import CVParams
from chan_vese_tpu.models.banded import segment_banded_fixed, auto_config
from chan_vese_tpu.ops.pallas_packed import band_rows_packed


def main():
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 200
    only = [a.lower() for a in sys.argv[2:]]
    print(f"backend={jax.default_backend()} iters={iters}", flush=True)
    rng = np.random.default_rng(0)
    p = CVParams()

    for name, (h, w) in [("4K", (2160, 3840)), ("8K", (4320, 7680)),
                         ("16K", (8640, 15360))]:
        if only and not any(s in name.lower() for s in only):
            continue
        u = jnp.asarray(rng.uniform(0, 255, (h, w)).astype(np.float32))
        for k in (4, 8):
            @jax.jit
            def run(u, r, k=k):
                phi, _ = segment_banded_fixed(u + r, p, iters=iters, k=k)
                return phi[0, 0]

            cfg = auto_config(h, w, k=k)
            bp, upp, dnp = band_rows_packed(h, w, k)
            _ = float(run(u, jnp.float32(0)))  # compile + warm
            best = float("inf")
            for r in range(3):
                t0 = time.perf_counter()
                _ = float(run(u, jnp.float32(r + 1)))
                best = min(best, time.perf_counter() - t0)
            mpix = h * w * iters / best / 1e6
            red = (bp + upp + dnp) / bp
            print(f"{name:4s} k={k:2d} auto(k,u,packed,fuse)={cfg} "
                  f"bp={bp} redundancy={red:.2f}: {mpix:9.1f} Mpix-it/s "
                  f"({best:.4f}s)", flush=True)


if __name__ == "__main__":
    main()
