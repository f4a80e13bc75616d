#!/usr/bin/env python
"""Bisect the morph-kernel Mosaic compile wedge by body content.

The k=8 4K probe sat >21 min even after the concat->roll _sl/_sr
rewrite (2026-08-20 12:33 session), so the wedge is NOT the lane-dim
concat alone. The PDE kernels share every structural element (roll +
iota select shifts, double-buffered ANY-space DMA pipeline, Python-
unrolled bodies) and compile in minutes, so this probe walks a ladder
of kernel bodies to find the discriminating ingredient:

    f0   acwe k=2 smoothing=0   force step only (4 shifts, selects)
    f1   acwe k=2 smoothing=1   + one SIoIS/ISoSI cycle (8-neighbor)
    g1   gac  k=2 smoothing=1   balloon+attraction+cycle
    f8   acwe k=8 smoothing=1   full default body

Each leg lowers, compiles (the wedge phase), then executes one tiny
chunk. Run ONE leg per invocation (serial chip access):

    python scripts/probe_morph_bisect.py f0 [H W]

Small canvas (default 512x1280) keeps DMA cheap; Mosaic compile cost
tracks body size, not data size, so a wedge reproduces here.
"""

import sys
import time

import jax
import jax.numpy as jnp

from chan_vese_tpu.ops.pallas_morph import gac_chunk, morph_chunk

LEGS = {
    "f0": dict(kind="acwe", k=2, smoothing=0),
    "f1": dict(kind="acwe", k=2, smoothing=1),
    "g1": dict(kind="gac", k=2, smoothing=1),
    "f8": dict(kind="acwe", k=8, smoothing=1),
    "g8": dict(kind="gac", k=8, smoothing=1),
}


def stamp(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def main():
    leg = sys.argv[1] if len(sys.argv) > 1 else "f0"
    H = int(sys.argv[2]) if len(sys.argv) > 2 else 512
    W = int(sys.argv[3]) if len(sys.argv) > 3 else 1280
    cfg = LEGS[leg]
    stamp(f"backend={jax.default_backend()} leg={leg} {cfg} {H}x{W}")

    ls = jnp.zeros((H, W), jnp.float32)
    aux = jnp.ones((H, W), jnp.float32)

    if cfg["kind"] == "acwe":
        fn = jax.jit(lambda a, b: morph_chunk(
            a, b, k=cfg["k"], smoothing=cfg["smoothing"], parity0=0))
    else:
        fn = jax.jit(lambda a, b: gac_chunk(
            a, b, k=cfg["k"], smoothing=cfg["smoothing"], parity0=0,
            balloon=1, threshold=0.3))

    stamp("lowering...")
    lowered = fn.lower(ls, aux)
    stamp("lowered; compiling...")
    compiled = lowered.compile()
    stamp("COMPILED OK")
    out = compiled(ls, aux)
    stamp(f"EXECUTED OK sum={float(jnp.sum(out))}")


if __name__ == "__main__":
    main()
