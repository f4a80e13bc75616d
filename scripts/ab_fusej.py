"""A/B the fused-j banded kernel variants at 4K on the real chip.

fused-j folds the j-grid into an in-kernel fori_loop (one grid step per
band row instead of one per (band, j) pair), targeting the ~15-25 us
per-grid-step overhead that gates packed-at-4K (docs/BENCHMARKS.md).
Round 3's first A/B rows were INVALID (segment_banded_fixed dropped the
fuse flag - fixed + regression-tested in commit e30b6fb); throughput has
been UNMEASURED since. Run this on the real chip (axon relay up),
within ONE session per the +-25% cross-session variance discipline:

    cd /root/repo && timeout 3600 python scripts/ab_fusej.py

Decision rule: if any fusej row beats its non-fused twin by > ~5%
in-session, flip the auto default in models/banded.auto_config and
re-record BENCH_CONFIGS; otherwise document the measured dead end in
docs/BENCHMARKS.md and close the thread (VERDICT r3 item 2).
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from chan_vese_tpu.params import CVParams
from chan_vese_tpu.models.banded import segment_banded_fixed

# Fail LOUDLY off-TPU: since the _backend_ok routing guard (round 4),
# the drivers silently fall back to the jnp path on other backends, so
# without this assert a relay flake mid-queue would record CPU-jnp
# timings under kernel row labels (the round-3 mislabeled-rows class).
assert jax.default_backend() == "tpu", \
    f"ab_fusej needs the TPU backend, got {jax.default_backend()!r}"

p = CVParams()

# flat u4 fusej k16 is EXCLUDED: measured 2026-08-18 — XLA:TPU compile
# permanent error, 129.12M of 128M VMEM (69M register-allocator spill
# slots in the fused body at unroll=4 x k=16); re-compiling the known
# failure wastes ~4 min of session every run.
RUNS_4K = [
    ("4K flat   u4      ", dict(k=8, unroll=4, packed=False, fuse=False)),
    ("4K flat   u4 fusej", dict(k=8, unroll=4, packed=False, fuse=True)),
    ("4K packed u1      ", dict(k=8, unroll=1, packed=True, fuse=False)),
    ("4K packed u1 fusej", dict(k=8, unroll=1, packed=True, fuse=True)),
    ("4K packed u1 fusej k16", dict(k=16, unroll=1, packed=True, fuse=True)),
]
# 8K: auto default is packed u4; decide whether fusej flips flat past it
RUNS_8K = [
    ("8K flat   u4      ", dict(k=8, unroll=4, packed=False, fuse=False)),
    ("8K flat   u4 fusej", dict(k=8, unroll=4, packed=False, fuse=True)),
    ("8K packed u4      ", dict(k=8, unroll=4, packed=True, fuse=False)),
    ("8K packed u4 fusej", dict(k=8, unroll=4, packed=True, fuse=True)),
]
SWEEPS = [((2160, 3840), RUNS_4K), ((4320, 7680), RUNS_8K)]


def run(tag, r, u0, iters, kw):
    H, W = u0.shape
    t0 = time.perf_counter()
    phi, _ = segment_banded_fixed(u0 + jnp.float32(r), p, iters, **kw)
    _ = float(phi[0, 0])  # force execution + readback (tunnel discipline)
    dt = time.perf_counter() - t0
    print(f"{tag} rep{r}: {H * W * iters / dt / 1e6:9.1f} Mpix-it/s",
          flush=True)


for (H, W), runs in SWEEPS:
    rng = np.random.default_rng(0)
    u0 = jnp.asarray(rng.uniform(0, 255, (H, W)).astype(np.float32))
    iters = 192
    for tag, kw in runs:
        try:
            run("warm " + tag, 0, u0, iters, kw)
        except Exception as e:  # noqa: BLE001 - report and keep measuring
            print(f"warm {tag} FAILED: {type(e).__name__}: {e}", flush=True)
    for r in range(1, 4):
        for tag, kw in runs:
            try:
                run(tag, r, u0, iters, kw)
            except Exception:  # noqa: BLE001 - warm pass already reported it
                pass
