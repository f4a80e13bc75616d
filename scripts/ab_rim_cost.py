"""Price the sharded-canvas rim machinery: banded_chunk (no crop) vs
banded_chunk_sharded (crop + traced parity/edge flags + per-half-sweep
_resync_rim) on the IDENTICAL canvas, same session.

The round-4 sharded profile attributed the whole 1x1 comm_k tax to the
kernel body (artifacts/profile_sharded_2026-08-18.out); the body gap
vs the flat single-chip kernel is canvas area (+4.7% at 4K) plus the
rim resync (16 full-tile shifts + 16 selects per iteration). This
isolates the rim share: if it is small, no further work; if it is the
~15-20% the op count suggests, it prices what a Mosaic static-slice
rim rewrite could recover (risky: bitwise-parity machinery).

Run (relay up): timeout 1800 python scripts/ab_rim_cost.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from chan_vese_tpu.params import CVParams
from chan_vese_tpu.ops import pallas_banded

assert jax.default_backend() == "tpu", \
    f"needs the TPU backend, got {jax.default_backend()!r}"

# the 4K 1x1 comm_k=8 canvas geometry (shard 2160x3840, D=32,
# lane-aligned width)
H, W, K, D = 2160, 3840, 8, 32
CH, CW = H + 2 * D, ((W + 2 * D + 127) // 128) * 128
ITERS_PER = K  # one chunk call = K iterations

p = CVParams()
rng = np.random.default_rng(0)
canvas = jnp.asarray(rng.standard_normal((CH, CW)), jnp.float32)
u0c = jnp.asarray(rng.uniform(0, 255, (CH, CW)), jnp.float32)
c1, c2 = jnp.float32(200.0), jnp.float32(40.0)
parity = jnp.int32(0)
edges = jnp.asarray([1.0, 1.0, 1.0, 1.0], jnp.float32)  # 1x1: all global
crop = (D, D + H, D, D + W)

CALLS = 12  # chain chunk calls inside one jitted dispatch


def make(run_kind):
    @jax.jit
    def run(cv, r):
        cv = cv + r
        for _ in range(CALLS):
            if run_kind == "sharded":
                cv, _ = pallas_banded.banded_chunk_sharded(
                    cv, u0c, c1, c2, p, k=K, parity=parity, edges=edges,
                    crop=crop, unroll=4)
            else:
                cv, _ = pallas_banded.banded_chunk(
                    cv, u0c, c1, c2, p, k=K, unroll=4)
        return cv[0, 0]

    return run


legs = []
for kind in ("plain  ", "sharded"):
    fn = make(kind.strip())
    t0 = time.perf_counter()
    _ = float(fn(canvas, jnp.float32(0)))
    print(f"warm {kind}: compile+run {time.perf_counter() - t0:.1f}s",
          flush=True)
    legs.append((kind, fn))

n_it = CALLS * ITERS_PER
for r in range(1, 4):
    for kind, fn in legs:
        t0 = time.perf_counter()
        _ = float(fn(canvas, jnp.float32(r)))
        dt = time.perf_counter() - t0
        print(f"{kind} rep{r}: {CH * CW * n_it / dt / 1e6:9.1f} "
              f"Mpix-it/s (canvas)  {dt * 1e3:7.1f} ms", flush=True)
