"""A/B the multichannel (RGB) banded kernel with and without fused-j.

Motivation: the 2026-08-18 scalar session measured fusej +12% on the
FLAT kernel at 4K (12.8 -> 14.4 G) while packed stayed ahead overall —
but the mc auto default is the FLAT layout at every size (packed mc is
a measured loss, models/banded.auto_config_mc), so the mc kernel is
where the per-grid-step overhead is still on the critical path. Run on
the real chip within ONE session:

    cd /root/repo && PYTHONPATH=/root/repo:$PYTHONPATH \
        timeout 5400 python scripts/ab_fusej_mc.py

Decision rule: if fusej beats non-fused by > ~5% in-session at a size,
default fuse=True for that size in models/banded.auto_config_mc and
re-record BENCH_CONFIGS config 2; otherwise document the measured dead
end in docs/BENCHMARKS.md.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from chan_vese_tpu.params import CVParams
from chan_vese_tpu.models.banded import segment_banded_fixed

assert jax.default_backend() == "tpu", \
    f"ab_fusej_mc needs the TPU backend, got {jax.default_backend()!r}"

p = CVParams()

RUNS = [
    ("flat u4      ", dict(k=8, unroll=4, packed=False, fuse=False)),
    ("flat u4 fusej", dict(k=8, unroll=4, packed=False, fuse=True)),
    ("flat u1 fusej", dict(k=8, unroll=1, packed=False, fuse=True)),
]
SIZES = [("4K RGB", (2160, 3840, 3)), ("8K RGB", (4320, 7680, 3))]


def run(tag, r, u0, iters, kw):
    H, W, _ = u0.shape
    t0 = time.perf_counter()
    phi, _ = segment_banded_fixed(u0 + jnp.float32(r), p, iters, **kw)
    _ = float(phi[0, 0])  # force execution + readback (tunnel discipline)
    dt = time.perf_counter() - t0
    print(f"{tag} rep{r}: {H * W * iters / dt / 1e6:9.1f} Mpix-it/s",
          flush=True)


for sz, shape in SIZES:
    rng = np.random.default_rng(0)
    u0 = jnp.asarray(rng.uniform(0, 255, shape).astype(np.float32))
    iters = 96
    for tag, kw in RUNS:
        try:
            run(f"warm {sz} {tag}", 0, u0, iters, kw)
        except Exception as e:  # noqa: BLE001 - report and keep measuring
            print(f"warm {sz} {tag} FAILED: {type(e).__name__}: {e}",
                  flush=True)
    for r in range(1, 4):
        for tag, kw in RUNS:
            try:
                run(f"{sz} {tag}", r, u0, iters, kw)
            except Exception:  # noqa: BLE001 - warm pass already reported
                pass
