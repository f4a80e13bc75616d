#!/usr/bin/env python
"""(bp, unroll, fusej) sweep for the packed banded kernel at 4K.

Motivation (2026-08-19): with the dispatch cost priced away
(bench_iters fit), the 4K packed u=1 asymptote is 28.3 G vs the 8K
packed u=4+fusej asymptote of ~25.7 G — but per PROCESSED pixel
(owned x redundancy T/bp) the u4+fusej body is ~9% faster
(38.5 vs 35.4 G). u4 at 4K's native bp=96 was a compile-time VMEM OOM
(spills grow with unroll x T); this sweep asks whether a SHORTER band
(bp=64/48: redundancy 1.375/1.5) lets unroll pay at 4K:

    rate(bp, u) = body_rate(u) * bp / (bp + 24)

u4 wins iff body(u4)/body(u1) > (96+24)/96 * bp/(bp+24).

Forces bp by monkeypatching band_rows_packed (bp must stay % 8 == 0;
upp/dnp are reach-determined, untouched). Asymptotic protocol:
iters=800 single-dispatch timing. Compile OOMs are caught and
reported as legs, not crashes.

Run solo on the real chip:
  python scripts/ab_4k_bp_unroll.py [iters] [leg-filter ...]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from chan_vese_tpu.params import CVParams
from chan_vese_tpu.models.banded import segment_banded_fixed
from chan_vese_tpu.ops import pallas_packed as pp

H, W = 2160, 3840


def leg(name, bp_force, unroll, fuse, iters, reps=3):
    jax.clear_caches()
    orig = pp.band_rows_packed

    def forced(h, w, k):
        bp, upp, dnp = orig(h, w, k)
        return (min(bp, bp_force), upp, dnp) if bp_force else (bp, upp,
                                                               dnp)

    pp.band_rows_packed = forced
    try:
        rng = np.random.default_rng(0)
        u = jnp.asarray(rng.uniform(0, 255, (H, W)).astype(np.float32))
        p = CVParams()

        @jax.jit
        def run(u, r):
            phi, _ = segment_banded_fixed(u + r, p, iters=iters, k=8,
                                          unroll=unroll, packed=True,
                                          fuse=fuse)
            return phi[0, 0]

        t0 = time.perf_counter()
        _ = float(run(u, jnp.float32(0)))
        t_compile = time.perf_counter() - t0
        best = float("inf")
        for r in range(reps):
            t0 = time.perf_counter()
            _ = float(run(u, jnp.float32(r + 1)))
            best = min(best, time.perf_counter() - t0)
        mpix = H * W * iters / best / 1e6
        print(f"{name}: {mpix:9.1f} Mpix-it/s ({best:.4f}s, "
              f"compile+first {t_compile:.0f}s)", flush=True)
    except Exception as e:
        msg = str(e).replace("\n", " ")[:160]
        print(f"{name}: FAILED ({type(e).__name__}: {msg})", flush=True)
    finally:
        pp.band_rows_packed = orig


def main():
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 800
    only = [a.lower() for a in sys.argv[2:]]
    print(f"backend={jax.default_backend()} iters={iters}", flush=True)
    legs = [
        ("u1 bp96 (auto)   ", 0, 1, False),
        ("u2 bp96          ", 0, 2, False),
        ("u4 bp96          ", 0, 4, False),
        ("u4 bp64          ", 64, 4, False),
        ("u4 bp48          ", 48, 4, False),
        ("u4 bp96 fusej    ", 0, 4, True),
        ("u4 bp64 fusej    ", 64, 4, True),
        ("u4 bp48 fusej    ", 48, 4, True),
        ("u2 bp96 fusej    ", 0, 2, True),
    ]
    for name, bpf, u, fz in legs:
        if only and not any(s in name.lower() for s in only):
            continue
        leg(name, bpf, u, fz, iters)


if __name__ == "__main__":
    main()
