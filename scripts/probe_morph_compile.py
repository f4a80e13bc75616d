#!/usr/bin/env python
"""Split compile-hang from execution-hang for the banded morph kernel.

bench_morph's first on-chip attempt sat >39 min with no output
(2026-08-20 10:00-10:40); k=1 sat >7 min. Two hypotheses:
  (a) Mosaic compile pathology (precedent: sharded fused-j 2576 s);
  (b) execution-time DMA deadlock - the kernel has never run on real
      hardware (the 21-pass tpu suite predates commit c86f834).
This probe lowers + compiles WITHOUT executing, printing a timestamped
line per phase, then (optionally, arg "run") executes one tiny chunk.

Run: python scripts/probe_morph_compile.py [k] [run]
(k must keep (k*smoothing) % 2 == 0 - smoothing=1 here, so even k - or
_route_kernel resolves to the jnp path / rejects a forced kernel; an
odd k is stamped + rejected up front rather than crashing untimed.)
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from chan_vese_tpu.models.morph import segment_morph_iterations
from chan_vese_tpu.params import CVParams


def stamp(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def main():
    # defensive parse (ADVICE r4): 'probe_morph_compile.py run' must not
    # ValueError on int('run'); odd k must be stamped, not crash untimed
    args = sys.argv[1:]
    k = int(args.pop(0)) if args and args[0].isdigit() else 8
    do_run = "run" in args
    stamp(f"backend={jax.default_backend()} k={k}")
    if (k * 1) % 2 != 0:
        stamp(f"REJECT: k={k} odd - (k*smoothing) % 2 == 0 required "
              f"(chunk-parity invariant, ops/pallas_morph.py); use even k")
        return
    p = CVParams()

    @jax.jit
    def step(u, r):
        res = segment_morph_iterations(u + r, p, iters=8, smoothing=1,
                                       use_pallas=True, k=k)
        return res.ls[0, 0]

    u = jnp.zeros((2160, 3840), jnp.float32)
    stamp("lowering (iters=8, ONE chunk, 4K gray)...")
    lowered = step.lower(u, jnp.float32(0))
    stamp("lowered; compiling...")
    compiled = lowered.compile()
    stamp("COMPILED OK")
    if do_run:
        stamp("executing one dispatch...")
        out = float(compiled(u, jnp.float32(0)))
        stamp(f"EXECUTED OK out={out}")


if __name__ == "__main__":
    main()
