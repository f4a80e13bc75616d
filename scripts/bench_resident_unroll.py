#!/usr/bin/env python
"""Quick resident-kernel unroll sweep at 256^2 / 512^2 RGB."""
import time
import jax
import jax.numpy as jnp
import numpy as np
from chan_vese_tpu.params import CVParams
from chan_vese_tpu.ops import pallas_resident as pr
from chan_vese_tpu.utils.init_phi import init_phi


def t(fn, reps=3):
    phi, _ = fn(0)
    _ = float(phi[0, 0])
    best = float("inf")
    for r in range(reps):
        t0 = time.perf_counter()
        phi, _ = fn(r + 1)
        _ = float(phi[0, 0])
        best = min(best, time.perf_counter() - t0)
    return best


p = CVParams()
rng = np.random.default_rng(0)
iters = 1000
u0 = jnp.asarray(rng.uniform(0, 255, (256, 256)), jnp.float32)
phi0 = init_phi((256, 256), p.init, jnp.float32)
for u in (1, 2, 4, 8):
    secs = t(lambda r, u=u: pr.resident_iterations(
        phi0 + jnp.float32(0 * r), u0 + jnp.float32(r), p, iters, unroll=u))
    print(f"256^2  u={u}: {256 * 256 * iters / secs / 1e6:8.1f} Mpix-it/s"
          f" ({secs:.4f}s)", flush=True)
ucf = jnp.asarray(rng.uniform(0, 255, (3, 512, 512)), jnp.float32)
phi5 = init_phi((512, 512), p.init, jnp.float32)
for u in (1, 2, 8):
    secs = t(lambda r, u=u: pr.resident_iterations_mc(
        phi5, ucf + jnp.float32(r), p, iters, unroll=u))
    print(f"512rgb u={u}: {512 * 512 * iters / secs / 1e6:8.1f} Mpix-it/s"
          f" ({secs:.4f}s)", flush=True)
