"""Unroll sweep for the small-image resident kernels on the real chip.

Decides whether a fused-iteration resident kernel (the resident analog
of the banded fused-j: all iterations in ONE grid program via an
in-kernel fori_loop) is worth building. The resident kernels pay a
fixed ~15-25 us per GRID STEP (docs/BENCHMARKS.md); unroll=u packs u
iterations per grid step, so throughput-vs-u directly prices that
fixed cost at the shipped sizes:

- still rising at u=8/16  -> fixed cost dominates; a fused loop that
  collapses the grid entirely buys the remainder -> build it
- flat from u=4           -> the per-iteration exact-means reductions
  serialize the body (the round-2 mc/multiphase finding); a fused loop
  buys ~nothing -> close the thread with this artifact

Single-dispatch timing (round-4 methodology): the jitted program
perturbs, solves, and returns the probe scalar; one tunnel round trip
per rep.

Run (relay up, ONE session): timeout 3600 python scripts/ab_resident_unroll.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from chan_vese_tpu.params import CVParams
from chan_vese_tpu.ops import pallas_packed
from chan_vese_tpu.utils.init_phi import init_phi

assert jax.default_backend() == "tpu", \
    f"needs the TPU backend, got {jax.default_backend()!r}"

p = CVParams()
ITERS = 960  # divisible by every swept unroll; ~config-1 protocol scale


def scalar_run(shape, unroll):
    phi0 = init_phi(shape, p.init, jnp.float32)

    @jax.jit
    def run(u, r):
        phi, _ = pallas_packed.packed_resident_iterations(
            phi0, u + r, p, ITERS, unroll=unroll)
        return phi[0, 0]

    return run


def mc_run(shape, unroll):
    phi0 = init_phi(shape[:2], p.init, jnp.float32)

    @jax.jit
    def run(u, r):
        ucf = jnp.transpose(u + r, (2, 0, 1))
        phi, _ = pallas_packed.packed_resident_iterations_mc(
            phi0, ucf, p, ITERS, None, None, unroll=unroll)
        return phi[0, 0]

    return run


SWEEP = [
    ("256^2 scalar", (256, 256), scalar_run, (1, 2, 4, 8, 16)),
    ("512^2 scalar", (512, 512), scalar_run, (1, 2, 4, 8)),
    ("512^2 RGB   ", (512, 512, 3), mc_run, (1, 2, 4)),
]

for name, shape, make, unrolls in SWEEP:
    rng = np.random.default_rng(0)
    u0 = jnp.asarray(rng.uniform(0, 255, shape).astype(np.float32))
    n_pix = shape[0] * shape[1]
    runs = []
    for u in unrolls:
        try:
            fn = make(shape, u)
            t0 = time.perf_counter()
            _ = float(fn(u0, jnp.float32(0)))
            print(f"warm {name} u{u:<2d}: compile+run "
                  f"{time.perf_counter() - t0:.1f}s", flush=True)
            runs.append((u, fn))
        except Exception as e:  # noqa: BLE001 - report and keep measuring
            print(f"warm {name} u{u:<2d} FAILED: {type(e).__name__}: {e}",
                  flush=True)
    for r in range(1, 4):
        for u, fn in runs:
            t0 = time.perf_counter()
            _ = float(fn(u0, jnp.float32(r)))
            dt = time.perf_counter() - t0
            print(f"{name} u{u:<2d} rep{r}: "
                  f"{n_pix * ITERS / dt / 1e6:9.1f} Mpix-it/s", flush=True)
