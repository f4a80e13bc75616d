#!/usr/bin/env python
"""Re-open the packed-mc question under the asymptotic protocol.

Round 3 measured packed mc a 20-35% LOSS vs flat u4 (pre-MXU-pack,
pre-fused-j, 3-dispatch timing) and auto_config_mc kept flat. Two
round-4 findings invalidate parts of that record: (a) the MXU pack
removed the per-call pack cost, (b) the scalar sweep showed unroll only
pays THROUGH fused-j, and the packed-mc kernel was never measured
fused. This script measures, same-session and asymptotically (800 it):

  flat auto (u4+fusej)  vs  packed u1/u2/u4 unfused and u1/u4 fused-j

at 4K RGB (_packed_banded_mc_kernel_fusej built 2026-08-19 on the
scalar-sweep evidence that packed unroll pays only through fused-j).
If the best packed leg beats flat auto, auto_config_mc flips its 4K
default; otherwise the round-3 flat verdict stands with the fused
form now also measured.

Run solo on the real chip:
    python scripts/ab_mc_packed.py [iters] [filter...]
    AB_SIZE=8k python scripts/ab_mc_packed.py 800   # 8K RGB legs
"""

import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from chan_vese_tpu.params import CVParams
from chan_vese_tpu.models.banded import segment_banded_fixed

_SIZES = {"4k": (2160, 3840), "8k": (4320, 7680), "16k": (8640, 15360)}
H, W = _SIZES[os.environ.get("AB_SIZE", "4k").lower()]
C = 3


def leg(name, iters, reps=3, **kw):
    jax.clear_caches()
    try:
        rng = np.random.default_rng(0)
        u = jnp.asarray(rng.uniform(0, 255, (H, W, C)).astype(np.float32))
        p = CVParams()

        @jax.jit
        def run(u, r):
            phi, _ = segment_banded_fixed(u + r, p, iters=iters, k=8,
                                          **kw)
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


def main():
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 800
    only = [a.lower() for a in sys.argv[2:]]
    print(f"backend={jax.default_backend()} iters={iters} "
          f"shape={(H, W, C)}", flush=True)
    legs = [
        ("flat auto u4 fusej", dict()),
        ("packed u1         ", dict(packed=True, unroll=1, fuse=False)),
        ("packed u2         ", dict(packed=True, unroll=2, fuse=False)),
        ("packed u4         ", dict(packed=True, unroll=4, fuse=False)),
        ("packed u1 fusej   ", dict(packed=True, unroll=1, fuse=True)),
        ("packed u4 fusej   ", dict(packed=True, unroll=4, fuse=True)),
    ]
    for name, kw in legs:
        if only and not any(s in name.lower() for s in only):
            continue
        leg(name, iters, **kw)


if __name__ == "__main__":
    main()
