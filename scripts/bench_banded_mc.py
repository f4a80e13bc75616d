#!/usr/bin/env python
"""4K RGB: fused per-iteration mc kernel vs banded k-per-pass mc kernel."""
import time
import jax
import jax.numpy as jnp
import numpy as np
from chan_vese_tpu.params import CVParams
from chan_vese_tpu.models.fused import segment_fused_fixed
from chan_vese_tpu.models.banded import segment_banded_fixed


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


H, W, iters = 2160, 3840, 96
rng = np.random.default_rng(0)
u0 = jnp.asarray(rng.uniform(0, 255, (H, W, 3)).astype(np.float32))
p = CVParams()
secs = t(lambda r: segment_fused_fixed(u0 + jnp.float32(r), p, iters))
print(f"fused  mc: {H * W * iters / secs / 1e6:8.1f} Mpix-it/s"
      f" ({secs:.3f}s)", flush=True)
for k, u in ((8, 1), (8, 4)):
    secs = t(lambda r, k=k, u=u: segment_banded_fixed(
        u0 + jnp.float32(r), p, iters, k=k, unroll=u))
    print(f"banded mc k={k} u={u}: {H * W * iters / secs / 1e6:8.1f} "
          f"Mpix-it/s ({secs:.3f}s)", flush=True)
